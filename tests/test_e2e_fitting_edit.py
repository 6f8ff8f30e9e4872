"""End-to-end CLI tests: fit_custom_obj (BASELINE config 5's fitting half)
and scene_edit with a keyword hit + ICP alignment."""

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


def test_fit_custom_obj_cli(tmp_path, rng):
    from lsdm_tpu.fitting.meshio import write_obj
    from lsdm_tpu.ops.spiral import grid_mesh

    # human sequence + candidate library + prediction cluster
    seq = rng.randn(6, 64, 3).astype(np.float32) * 0.3
    seq[:, :, 2] = np.abs(seq[:, :, 2])
    np.save(tmp_path / "verts.npy", seq)
    os.makedirs(tmp_path / "objlib" / "table")
    v, f = grid_mesh(5)
    write_obj(str(tmp_path / "objlib" / "table" / "t0.obj"),
              v * np.array([0.6, 0.6, 0.05]), f)
    pred = (rng.rand(128, 3).astype(np.float32) - 0.5) * np.array(
        [0.6, 0.6, 0.05], np.float32) + np.array([1.0, 0.4, 0.2], np.float32)
    np.save(tmp_path / "pred.npy", pred)

    out = str(tmp_path / "fitout")
    r = run_cli([
        "lsdm_tpu.run.fit_custom_obj", "--file_name", str(tmp_path / "pred.npy"),
        "--label", "table", "--vertices_path", str(tmp_path / "verts.npy"),
        "--obj_lib", str(tmp_path / "objlib"), "--output_dir", out,
        "--sdf_dim", "32", "--platform", "cpu",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    metas = []
    for root, _, files in os.walk(os.path.join(out, "fit_best_obj")):
        metas += [os.path.join(root, f) for f in files if f == "best_obj_id.json"]
    assert metas, "no fitted object written"
    meta = json.load(open(metas[0]))
    assert meta["best_obj_id"] == "t0"
    # recovered translation lands near the cluster
    assert abs(meta["grid_transl"][0] - 1.0) < 0.4
    obj = os.path.join(os.path.dirname(metas[0]), "t0", "opt_best.obj")
    assert os.path.exists(obj)


def test_scene_edit_cli_with_keyword(tmp_path, rng):
    """Prompt 'place a desk ...' hits the EDIT_KEYWORDS table -> replacement
    object N3Office/table_0 is ICP-aligned and blended."""
    from lsdm_tpu.data.synthetic import generate

    root = str(tmp_path / "data")
    generate(root, "proxd", n_scenes=1, n_seqs=2, pnt_size=32, seed=0,
             split="test")
    # craft a prompt with the 'desk' keyword at token position 2 and provide
    # the keyword's object file
    ctx_dir = os.path.join(root, "proxd_test", "context")
    seqs = sorted(os.listdir(ctx_dir))
    for s in seqs:
        lines = open(os.path.join(ctx_dir, s)).readlines()
        lines[0] = "place a desk next to the person\n"
        open(os.path.join(ctx_dir, s), "w").writelines(lines)
    os.makedirs(os.path.join(root, "objs", "N3Office"), exist_ok=True)
    np.save(os.path.join(root, "objs", "N3Office", "table_0.npy"),
            rng.rand(32, 3).astype(np.float32))

    out = str(tmp_path / "editout")
    r = run_cli([
        "lsdm_tpu.run.scene_edit", os.path.join(root, "proxd_test"),
        "--objs_data_dir", os.path.join(root, "objs"), "--output_dir", out,
        "--edit_type", "obj_mod", "--diffusion_steps", "6", "--pcd_points", "32",
        "--icp_tries", "8", "--platform", "cpu",
    ], timeout=560)
    assert r.returncode == 0, r.stderr[-2000:]
    results = open(os.path.join(out, "results.txt")).read()
    assert "Fitness" in results  # ICP metrics present => keyword path ran
    assert "Final Chamfer distance" in results
    preds = os.listdir(os.path.join(out, "predictions"))
    assert len(preds) == 2


def test_vis_html_viewer(tmp_path, rng):
    """--html writes a standalone interactive viewer with a parseable
    embedded scene payload (the open3d-window replacement)."""
    import json
    import re

    from lsdm_tpu.fitting.meshio import write_obj
    from lsdm_tpu.ops.spiral import grid_mesh

    fit = tmp_path / "fit_best_obj" / "table" / "t0"
    os.makedirs(fit)
    v, f = grid_mesh(4)
    write_obj(str(fit / "opt_best.obj"), v, f)
    seq = rng.randn(4, 64, 3).astype(np.float32) * 0.2
    np.save(tmp_path / "verts.npy", seq)

    r = run_cli([
        "lsdm_tpu.run.vis_fitting_results",
        "--fitting_results_path", str(tmp_path),
        "--vertices_path", str(tmp_path / "verts.npy"),
        "--every", "1", "--max_frames", "4", "--no_png", "--html",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    html = (tmp_path / "rendering" / "scene.html").read_text()
    data = json.loads(
        re.search(r"const DATA = (\{.*?\});\nconst cv", html, re.S).group(1))
    assert len(data["frames"]) == 4
    assert data["objects"] and data["objects"][0]["edges"]
    assert data["radius"] > 0


def test_vis_dataset_cli(tmp_path, rng):
    """Dataset sequence viewer (reference posa/vis_dataset.py): PNG frames
    named like the reference's video capture + the --html orbit viewer
    with per-point contact-class colors."""
    T, V = 12, 80
    for sub in ("vertices", "vertices_can", "semantics"):
        os.makedirs(tmp_path / "ds" / sub)
    seq = rng.randn(T, V, 3).astype(np.float32) * 0.3
    np.save(tmp_path / "ds" / "vertices" / "seqA_01_verts.npy", seq)
    np.save(tmp_path / "ds" / "vertices_can" / "seqA_01_verts_can.npy", seq)
    labels = rng.randint(0, 8, size=(T, V))
    np.save(tmp_path / "ds" / "semantics" / "seqA_01_cfs.npy", labels)

    out = tmp_path / "vis"
    r = run_cli([
        "lsdm_tpu.run.vis_dataset", "--data_dir", str(tmp_path / "ds"),
        "--seq_name", "seqA_01", "--save_dir", str(out),
        "--every", "4", "--html",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    pngs = sorted(out.glob("frame_*.png"))
    assert [p.name for p in pngs] == [
        "frame_0000.png", "frame_0004.png", "frame_0008.png"]
    html = (out / "scene.html").read_text()
    import re

    data = json.loads(re.search(r"const DATA = (.*);", html).group(1))
    assert len(data["frames"]) == 3
    assert data["palette"] is not None and len(data["palette"]) == 8
    # each frame point carries [x, y, z, label]
    assert len(data["frames"][0][0]) == 4
    labs = {int(p[3]) for p in data["frames"][0]}
    assert labs <= set(range(8)) and len(labs) > 1

    # canonical single-frame mode (rotated upright, no scene)
    r2 = run_cli([
        "lsdm_tpu.run.vis_dataset", "--data_dir", str(tmp_path / "ds"),
        "--seq_name", "seqA_01", "--save_dir", str(tmp_path / "vis_can"),
        "--show_canonical", "--single_frame", "5", "--no_png", "--html",
    ])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert (tmp_path / "vis_can" / "scene.html").exists()


def test_sample_label_draws_prob_vs_logits():
    """Advisor r4: non-negative rows are renormalized (NOT softmaxed, which
    would distort e.g. fp16-exported probabilities summing to 0.999);
    negatives mean logits -> softmax; all-zero rows raise."""
    from lsdm_tpu.run.fit_prob_obj import sample_label_draws

    p = np.array([[[0.699, 0.3, 0.0, 0.0]]], np.float32)  # rows sum 0.999
    draws = sample_label_draws(p, 400, seed=1)
    assert draws[0].item() == 0  # MAP draw
    frac0 = (draws[1:] == 0).mean()
    # renormalized: P(0) = 0.6997; the old softmax branch would give 0.376
    assert abs(frac0 - 0.6997) < 0.07

    lg = np.array([[[2.0, 0.0, -1.0, -1.0]]], np.float32)  # logits
    assert sample_label_draws(lg, 1)[0].item() == 0

    with pytest.raises(ValueError, match="all-zero"):
        sample_label_draws(np.zeros((1, 1, 4), np.float32), 1)


def test_fit_prob_obj_cli(tmp_path, rng):
    """Probabilistic fitting (reconstructed fit_prob_obj): contact PROBS
    concentrated on 'table' near a blob -> per-draw fits + prob_fit.json
    with the cross-draw placement spread."""
    from lsdm_tpu.fitting.meshio import write_obj
    from lsdm_tpu.ops.spiral import grid_mesh

    T, V = 4, 96
    seq = rng.randn(T, V, 3).astype(np.float32) * 0.3
    seq[:, :, 2] = np.abs(seq[:, :, 2])
    # a stable vertex subset sits near (1.0, 0.4, 0.2): give it high
    # probability of class 5 ('table' in the 8-class subset)
    seq[:, :40] = (rng.rand(T, 40, 3).astype(np.float32) - 0.5) * np.array(
        [0.5, 0.5, 0.05], np.float32) + np.array([1.0, 0.4, 0.2], np.float32)
    probs = np.zeros((T, V, 8), np.float32)
    probs[..., 0] = 1.0
    probs[:, :40, 0] = 0.05
    probs[:, :40, 5] = 0.95
    np.save(tmp_path / "verts.npy", seq)
    np.save(tmp_path / "probs.npy", probs)
    os.makedirs(tmp_path / "objlib" / "table")
    v, f = grid_mesh(5)
    write_obj(str(tmp_path / "objlib" / "table" / "t0.obj"),
              v * np.array([0.6, 0.6, 0.05]), f)

    out = str(tmp_path / "probout")
    r = run_cli([
        "lsdm_tpu.run.fit_prob_obj", "seq0", str(tmp_path / "verts.npy"),
        str(tmp_path / "probs.npy"), "2",
        "--obj_lib", str(tmp_path / "objlib"), "--output_dir", out,
        "--sdf_dim", "32", "--down_sample", "1", "--platform", "cpu",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.load(open(os.path.join(out, "prob_fit.json")))
    assert summary["sample_count"] == 2 and len(summary["samples"]) == 2
    assert summary["best_sample"] is not None
    best = summary["samples"][summary["best_sample"]]["fits"]
    assert best and best[0]["class"] == "table" and best[0]["obj_id"] == "t0"
    # the MAP draw's fitted center lands near the blob
    assert abs(best[0]["center"][0] - 1.0) < 0.5
    assert "table" in summary["placement_spread"]
    # per-draw output trees exist
    assert os.path.isdir(os.path.join(out, "sample_00", "fit_best_obj"))
