"""End-to-end CLI acceptance tests (BASELINE.md configs, tiny scale):
synthetic data -> train_sdm -> test_sdm -> output contract."""

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
    root = str(tmp_path_factory.mktemp("e2e"))
    from lsdm_tpu.data.synthetic import generate

    generate(root, "proxd", n_scenes=1, n_seqs=4, pnt_size=32, seed=0)
    generate(root, "proxd", n_scenes=1, n_seqs=2, pnt_size=32, seed=3,
             split="test")
    return root


def test_train_then_eval_cli(synth, tmp_path):
    save = str(tmp_path / "train_out")
    r = run_cli([
        "lsdm_tpu.run.train_sdm", "--train_data_dir", f"{synth}/proxd_train",
        "--objs_data_dir", f"{synth}/objs", "--save_dir", save,
        "--epochs", "1", "--batch_size", "2", "--diffusion_steps", "8",
        "--pcd_points", "32", "--platform", "cpu",
        "--steps_per_dispatch", "2",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    ckpt = os.path.join(save, "best_model_train_loss.ckpt")
    assert os.path.exists(ckpt)

    out = str(tmp_path / "test_out")
    r = run_cli([
        "lsdm_tpu.run.test_sdm", f"{synth}/proxd_test",
        "--objs_data_dir", f"{synth}/objs", "--load_model", ckpt,
        "--output_dir", out, "--diffusion_steps", "8", "--batch_size", "2",
        "--pcd_points", "32", "--platform", "cpu",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    # output contract (reference run/test_sdm.py:210-232)
    results = open(os.path.join(out, "results.txt")).read()
    assert "Final Chamfer distance" in results
    assert "Top 3 accuracy" in results
    preds = os.listdir(os.path.join(out, "predictions"))
    assert len(preds) == 2
    arr = np.load(os.path.join(out, "predictions", preds[0]))
    assert arr.shape == (32, 3) and arr.dtype == np.float32
    guid = np.load(os.path.join(out, "guiding_points", preds[0]))
    assert guid.shape == (32, 3)


def test_bench_train_smoke():
    """tools/bench_train.py prints the throughput line (tiny config)."""
    r = run_cli(["tools.bench_train", "--smoke", "--platform", "cpu",
                 "--batch", "2", "--chunk", "2", "--repeats", "1"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "train_steps_per_sec=" in r.stdout


@pytest.mark.parametrize("what", ["backbone", "sa", "encode", "attn"])
def test_profile_stages_smoke(what):
    """The on-chip attribution tool's probes must keep building against
    the live model surface (--smoke: tiny shapes, CPU). scan_bench
    swallows probe exceptions into 'FAILED' lines, so assert none."""
    r = run_cli(["tools.profile_stages", "--what", what, "--smoke",
                 "--platform", "cpu", "--reps", "2", "--clouds", "2",
                 "--batch", "1"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ms/call" in r.stdout
    assert "FAILED" not in r.stdout, r.stdout[-2000:]


def test_onchip_equiv_harness_cpu_selftest():
    """The composed-vs-fused equivalence harness (the round-4 promotion
    gate, tools/onchip_equiv.py) self-tests on CPU: tiny config, T=20,
    interpret-mode kernels, fp32 — must print the JSON delta line and
    exit 0 (PASS). Pins the gate harness itself, not just the kernels
    it gates."""
    import json

    r = run_cli(["tools.onchip_equiv", "--platform", "cpu"])
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    # CPU fp32 interpret agreement is ~1e-7-grade (PERF.md round 4);
    # assert an order of magnitude of headroom as the regression bound
    assert out["sample_maxabs"] < 1e-5
    assert abs(out["sample_chamfer"]) < 1e-8
    assert "PASS" in r.stderr


def test_bench_train_composable_ablations():
    """The --ablate diagnostic composes stubs (PERF.md round-4 floor
    attribution). Pins the human_backbone stub working for BOTH tower
    types (POSA's pcd_points vs STGCN's joint_num field — round-4 fix)."""
    for tower in ("POSA", "P2R"):
        r = run_cli(["tools.bench_train", "--smoke", "--platform", "cpu",
                     "--batch", "2", "--chunk", "2", "--repeats", "1",
                     "--human_backbone", tower, "--ablate",
                     "pcd_backbone,human_backbone,denoise_head,optimizer,"
                     "loss,rng,attn"])
        assert r.returncode == 0, f"{tower}: {r.stderr[-2000:]}"
        assert "train_steps_per_sec=" in r.stdout
    # unknown component names must error out, not run a misattributed bench
    r = run_cli(["tools.bench_train", "--smoke", "--platform", "cpu",
                 "--ablate", "nonexistent_component"])
    assert r.returncode != 0
    assert "unknown --ablate" in r.stderr
