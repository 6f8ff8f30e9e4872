"""End-to-end CLI acceptance for the HUMANISE datatype (the second dataset
contract, reference ``posa/dataset.py:477-602``): synthetic humanise data ->
train_sdm -> test_sdm output contract -> faces-path fit_custom_obj
(``fit_custom_obj_humanise.py`` variant).  Mirrors ``test_e2e_cli.py``
(VERDICT r01 item 9)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, timeout=420):
    from conftest import cli_env

    return subprocess.run(
        [sys.executable, "-m"] + args, cwd=REPO, env=cli_env(),
        capture_output=True, text=True, timeout=timeout,
    )


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e_hum"))
    from lsdm_tpu.data.synthetic import generate

    generate(root, "humanise", n_scenes=1, n_seqs=4, pnt_size=32, seed=0)
    generate(root, "humanise", n_scenes=1, n_seqs=2, pnt_size=32, seed=3,
             split="test")
    return root


def test_humanise_train_then_eval_cli(synth, tmp_path):
    save = str(tmp_path / "train_out")
    r = run_cli([
        "lsdm_tpu.run.train_sdm", "--train_data_dir", f"{synth}/train",
        "--objs_data_dir", f"{synth}/objs", "--save_dir", save,
        "--datatype", "humanise", "--epochs", "1", "--batch_size", "2",
        "--diffusion_steps", "8", "--pcd_points", "32", "--platform", "cpu",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    ckpt = os.path.join(save, "best_model_train_loss.ckpt")
    assert os.path.exists(ckpt)

    out = str(tmp_path / "test_out")
    r = run_cli([
        "lsdm_tpu.run.test_sdm", f"{synth}/test",
        "--objs_data_dir", f"{synth}/objs", "--load_model", ckpt,
        "--datatype", "humanise", "--output_dir", out,
        "--diffusion_steps", "8", "--batch_size", "2",
        "--pcd_points", "32", "--platform", "cpu",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    results = open(os.path.join(out, "results.txt")).read()
    assert "Final Chamfer distance" in results
    preds = os.listdir(os.path.join(out, "predictions"))
    assert len(preds) == 2
    arr = np.load(os.path.join(out, "predictions", preds[0]))
    assert arr.shape == (32, 3) and arr.dtype == np.float32


def test_fit_custom_obj_with_faces_path(tmp_path, rng):
    """The HUMANISE fitting variant supplies a mesh faces file so the human
    occupancy comes from sampled surface points, not raw vertices
    (reference ``fit_custom_obj_humanise.py``)."""
    from lsdm_tpu.fitting.meshio import write_obj
    from lsdm_tpu.ops.spiral import grid_mesh

    v, f = grid_mesh(5)
    seq = (v[None].repeat(4, 0) + rng.randn(4, len(v), 3) * 0.02).astype(
        np.float32)
    seq[:, :, 2] += 0.5
    np.save(tmp_path / "verts.npy", seq)
    np.save(tmp_path / "faces.npy", f.astype(np.int32))

    os.makedirs(tmp_path / "objlib" / "table")
    write_obj(str(tmp_path / "objlib" / "table" / "t0.obj"),
              v * np.array([0.6, 0.6, 0.05]), f)
    pred = (rng.rand(128, 3).astype(np.float32) - 0.5) * np.array(
        [0.6, 0.6, 0.05], np.float32) + np.array([1.0, 0.4, 0.2], np.float32)
    np.save(tmp_path / "pred.npy", pred)

    out = str(tmp_path / "fitout")
    r = run_cli([
        "lsdm_tpu.run.fit_custom_obj", "--file_name", str(tmp_path / "pred.npy"),
        "--label", "table", "--vertices_path", str(tmp_path / "verts.npy"),
        "--faces_path", str(tmp_path / "faces.npy"),
        "--obj_lib", str(tmp_path / "objlib"), "--output_dir", out,
        "--sdf_dim", "32", "--platform", "cpu",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    metas = []
    for root, _, files in os.walk(os.path.join(out, "fit_best_obj")):
        metas += [os.path.join(root, fn) for fn in files
                  if fn == "best_obj_id.json"]
    assert metas, "no fitted object written"
    meta = json.load(open(metas[0]))
    assert meta["best_obj_id"] == "t0"
