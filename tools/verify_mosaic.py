"""Pre-verify Mosaic (TPU) lowering of every Pallas kernel WITHOUT a TPU.

``jax.export`` with ``platforms=["tpu"]`` runs the full Mosaic lowering
pipeline on any host, so kernel bugs that only surface on the TPU
backend (unimplemented primitives like ``erfc``, illegal BlockSpec
tilings, VMEM overflows at the real shapes) are caught here instead of
minutes into a remote compile.  This caught the erfc-unimplemented and
block-divisibility bugs in ``ops/denoise_pallas.py`` during round 3.

Run on CPU before queueing any TPU job that exercises a new/changed
kernel:

    python tools/verify_mosaic.py            # all kernels, flagship shapes
    python tools/verify_mosaic.py --only sa  # one family

Shapes mirror the flagship ``sdm_proxd`` config (pcd_points=1024,
latent=128 -> e2 width 256) — lowering legality depends only on
shapes/dtypes, so weights are synthetic.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax import export  # noqa: E402


def _export_tpu(name: str, fn, *args) -> bool:
    try:
        export.export(jax.jit(fn), platforms=["tpu"])(*args)
    except Exception as e:  # noqa: BLE001 — report and keep scanning
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:2000]}")
        return False
    print(f"ok   {name}")
    return True


def case_ballquery():
    from lsdm_tpu.ops.ballquery_pallas import (query_ball_point_pallas,
                                               three_nn_pallas)

    xyz = jnp.zeros((2, 1024, 3))
    new_xyz = jnp.zeros((2, 256, 3))
    ok = _export_tpu(
        "query_ball_point_pallas (B2 N1024 S256 K32)",
        lambda a, b: query_ball_point_pallas(0.2, 32, a, b), xyz, new_xyz)
    # FP stage 3-NN: targets = upsampled level, sources = coarse level
    ok &= _export_tpu(
        "three_nn_pallas (B2 N256 S64)",
        lambda a, b: three_nn_pallas(a, b, k=3),
        jnp.zeros((2, 256, 3)), jnp.zeros((2, 64, 3)))
    return ok


def case_chamfer():
    from lsdm_tpu.ops.chamfer_pallas import chamfer_distance_pallas

    x = jnp.zeros((2, 1024, 3))
    y = jnp.zeros((2, 512, 3))
    ok = _export_tpu("chamfer_distance_pallas fwd", chamfer_distance_pallas,
                     x, y)
    ok &= _export_tpu(
        "chamfer_distance_pallas grad",
        jax.grad(lambda a, b: jnp.sum(chamfer_distance_pallas(a, b))), x, y)
    return ok


def _step_params():
    """Synthetic DenoiseStepParams at the flagship shapes (printed from a
    real ``extract_step_params(model.init(...))`` — see module docstring)."""
    from lsdm_tpu.ops.denoise_pallas import DenoiseStepParams

    shapes = dict(
        w_up0=(128, 1), b_up0=(128, 1), w_up2=(512, 128), b_up2=(512, 1),
        w_up4=(1024, 512), b_up4=(1024, 1), wc_t=(256, 128), bc=(1, 128),
        wp0_t=(3, 64), bp0=(1, 64), wp2_t=(64, 128), bp2=(1, 128),
        wx0_t=(256, 192), bx0=(1, 192), wx2_t=(192, 128), bx2=(1, 128),
        wo0_t=(128, 64), bo0=(1, 64), wo2_t=(64, 3), bo2=(1, 3),
    )
    return DenoiseStepParams(**{k: jnp.zeros(s) for k, s in shapes.items()})


def case_denoise():
    from lsdm_tpu.ops.denoise_pallas import (fused_denoise_chain,
                                             fused_denoise_step)

    p = _step_params()
    B, N, T, D2 = 2, 1024, 8, 256
    x = jnp.zeros((B, N, 3))
    e2 = jnp.zeros((B, D2))
    cf = jnp.zeros((3,))
    ok = True
    for cdt in (jnp.float32, jnp.bfloat16):
        ok &= _export_tpu(
            f"fused_denoise_step ({jnp.dtype(cdt).name})",
            lambda a, b, c, d, e: fused_denoise_step(
                a, b, c, d, e, p, compute_dtype=cdt),  # noqa: B023
            x, x, x, e2, cf)
    ok &= _export_tpu(
        "fused_denoise_chain (T8)",
        lambda a, b, c, d, e: fused_denoise_chain(a, b, c, d, e, p),
        x, jnp.zeros((B, T, N, 3)), x, jnp.zeros((B, T, D2)),
        jnp.zeros((T, 3)))
    return ok


def case_sa():
    from lsdm_tpu.ops.sa_fused_pallas import sa_stage_fused

    ok = True
    # the four real PointNet2Backbone stages at flagship scale
    # (models/pointnet2.py:239-246; sa1 S==N via the FPS-identity shortcut,
    # Cin = 3 + previous stage's feature width); plus a bf16 pass
    for name, N, S, Cin, mlp, cdt in (
        ("sa1", 1024, 1024, 6, (32, 32, 64), jnp.float32),
        ("sa2", 1024, 256, 67, (64, 64, 128), jnp.float32),
        ("sa3", 256, 64, 131, (128, 128, 256), jnp.float32),
        ("sa4", 64, 16, 259, (256, 256, 512), jnp.float32),
        ("sa1 bf16", 1024, 1024, 6, (32, 32, 64), jnp.bfloat16),
    ):
        folded, f_in = [], Cin
        for f in mlp:
            folded.append((jnp.zeros((f_in, f)), jnp.zeros((f,))))
            f_in = f
        ok &= _export_tpu(
            f"sa_stage_fused ({name}: N{N} S{S} C{Cin})",
            lambda a, b, c: sa_stage_fused(  # noqa: B023
                0.4, 32, a, b, c, tuple(folded), compute_dtype=cdt),
            jnp.zeros((2, N, 3)), jnp.zeros((2, S, 3)),
            jnp.zeros((2, N, Cin)))
    return ok


def case_fp():
    from lsdm_tpu.ops.fp_fused_pallas import fp_stage_fused

    ok = True
    # the four real PointNet2Backbone FP stages at flagship scale
    # (models/pointnet2.py; D1 = that level's feature width, D2 = the
    # coarser level's; fp1 has points1=None); plus a bf16 pass
    # fp1 carries the backbone tail (head relu + conv2 linear) as extra
    # layers in the flagship fused program (models/pointnet2.py)
    for name, N, S, D1, D2, mlp, acts, cdt in (
        ("fp4", 64, 16, 256, 512, (256, 256), None, jnp.float32),
        ("fp3", 256, 64, 128, 256, (256, 256), None, jnp.float32),
        ("fp2", 1024, 256, 64, 256, (256, 128), None, jnp.float32),
        ("fp1+tail", 1024, 1024, None, 128, (128, 128, 128, 128, 3),
         ("relu",) * 4 + ("none",), jnp.float32),
        ("fp2 bf16", 1024, 256, 64, 256, (256, 128), None, jnp.bfloat16),
    ):
        folded, f_in = [], (0 if D1 is None else D1) + D2
        for f in mlp:
            folded.append((jnp.zeros((f_in, f)), jnp.zeros((f,))))
            f_in = f
        p1 = None if D1 is None else jnp.zeros((2, N, D1))
        ok &= _export_tpu(
            f"fp_stage_fused ({name}: N{N} S{S})",
            lambda a, b, c: fp_stage_fused(  # noqa: B023
                a, b, p1, c, tuple(folded), acts=acts, compute_dtype=cdt),
            jnp.zeros((2, N, 3)), jnp.zeros((2, S, 3)),
            jnp.zeros((2, S, D2)))
    return ok


def case_fps():
    from lsdm_tpu.ops.fps_pallas import farthest_point_sample_pallas

    ok = True
    # the three real FPS calls (sa2/sa3/sa4; sa1 is the identity shortcut)
    for N, P in ((1024, 256), (256, 64), (64, 16)):
        ok &= _export_tpu(
            f"farthest_point_sample_pallas (N{N} P{P})",
            lambda a, b: farthest_point_sample_pallas(a, P, b),  # noqa: B023
            jnp.zeros((2, N, 3)), jnp.zeros((2,), jnp.int32))
    return ok


def case_attn():
    from lsdm_tpu.ops.attn_pallas import rank1_mha_pallas

    ok = True
    # pcd_attention flagship shapes: B*O=9, L=S=1024, H=12; plus bf16
    for cdt in (jnp.float32, jnp.bfloat16):
        ok &= _export_tpu(
            f"rank1_mha_pallas (B9 L1024 H12, {jnp.dtype(cdt).name})",
            lambda a, b, c: rank1_mha_pallas(a, b, c, compute_dtype=cdt),
            jnp.zeros((9, 1024, 12)), jnp.zeros((9, 1024, 12)),
            jnp.zeros((9, 1024, 12)))
    return ok


CASES = {
    "attn": case_attn,
    "ballquery": case_ballquery,
    "chamfer": case_chamfer,
    "denoise": case_denoise,
    "fp": case_fp,
    "fps": case_fps,
    "sa": case_sa,
}


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--only", choices=sorted(CASES), default=None)
    args = ap.parse_args()
    names = [args.only] if args.only else sorted(CASES)
    ok = all([CASES[n]() for n in names])
    print("ALL OK" if ok else "FAILURES — fix before queueing TPU jobs")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
