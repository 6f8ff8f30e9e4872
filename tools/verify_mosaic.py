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
shapes/dtypes, so weights are synthetic.  Both driver-relevant flagship
points are covered: batch-1 fp32 (B*objs=9) and batch-8 bf16 (B*objs=72).

KNOWN FALSE-NEGATIVE CLASS + its lint (round 4, VERDICT r03 item 4):
``jax.export``'s Mosaic pipeline ACCEPTS i1-vector value ops (e.g. a
``select`` between two bool vectors) that the real libtpu AOT compiler
REJECTS at compile time with "Unsupported target bitwidth for truncation"
(an ``arith.trunci`` i8->i1 materialization) — this burned a TPU queue
slot in round 3 (``ops/sa_fused_pallas.py:94`` pre-6b38000, the one-hot
masks built as bool instead of f32).  Export acceptance alone is
therefore NOT sufficient.  ``_export_tpu`` now additionally decodes every
exported ``tpu_custom_call`` Mosaic body (MLIR bytecode, round-tripped to
text via jaxlib's MLIR parser) and FAILS on any non-comparison op that
*produces* an i1 vector: cmpi/cmpf -> i1 consumed as a select condition
is the supported idiom; everything else (select-of-bools, trunci-to-i1,
bool arithmetic) is the rejected class.  The pre-fix round-3 kernel is
flagged retroactively (``tests/test_mosaic_lowering.py``).
"""

from __future__ import annotations

import argparse
import base64
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax import export  # noqa: E402

_MOSAIC_BODY_RE = re.compile(r"22body.22: .22([A-Za-z0-9+/=]{100,})")
_I1_RESULT_RE = re.compile(r"-> vector<[0-9x]+xi1>")
_SHAPE_CAST_RE = re.compile(
    r"shape_cast[^:]*:\s*\(vector<([0-9x]+)x[a-z0-9]+>\)"
    r"\s*->\s*vector<([0-9x]+)x[a-z0-9]+>")


def lint_tiled_shape_casts(stablehlo_text: str) -> list:
    """Flag vector.shape_cast ops that move data across the tiled dims.

    Second export false-negative class (round 4, bt_sg.log): Mosaic's
    infer-vector-layout REJECTS shape casts that change a rank>=2
    vector's last-two (sublane, lane) dims — e.g. the unit-MIDDLE-dim
    insertion ``vector<256x6> -> vector<256x1x6>`` that ``g[:, None, :]``
    emits — with "unsupported shape cast", while jax.export accepts
    them.  Leading-unit-dim insertions (``-> vector<1x1x256x6>``, the
    ref-store idiom) and rank-1 -> rank-2 trailing expansions
    (``vector<256> -> vector<256x1>``, the keepdims reduction idiom)
    keep the tiled dims intact and compile fine on-chip
    (ops/ballquery_pallas.py et al.).
    """
    bad = []
    for text in decode_mosaic_bodies(stablehlo_text):
        for line in text.splitlines():
            m = _SHAPE_CAST_RE.search(line)
            if not m:
                continue
            src = [int(d) for d in m.group(1).split("x")]
            dst = [int(d) for d in m.group(2).split("x")]
            if len(src) >= 2 and len(dst) >= 2 and src[-2:] != dst[-2:]:
                bad.append(line.strip())
    return bad


def decode_mosaic_bodies(stablehlo_text: str) -> list:
    """Decode every embedded Mosaic kernel module to MLIR text.

    The Mosaic kernel modules ride inside ``tpu_custom_call`` backend
    configs as base64 MLIR bytecode; bytecode parses fine with
    unregistered dialects (ops appear as ``stable_mosaic.arith.*``).
    """
    from jaxlib.mlir.ir import Context, Module

    bodies = []
    for b64 in _MOSAIC_BODY_RE.findall(stablehlo_text):
        ctx = Context()
        ctx.allow_unregistered_dialects = True
        bodies.append(str(Module.parse(base64.b64decode(b64), ctx)))
    return bodies


def lint_i1_vectors(stablehlo_text: str) -> list:
    """Return offending Mosaic lines: non-cmp ops producing i1 vectors."""
    bad = []
    for text in decode_mosaic_bodies(stablehlo_text):
        for line in text.splitlines():
            if (_I1_RESULT_RE.search(line) and "cmpi" not in line
                    and "cmpf" not in line):
                bad.append(line.strip())
    return bad


def _export_tpu(name: str, fn, *args) -> bool:
    try:
        exp = export.export(jax.jit(fn), platforms=["tpu"])(*args)
        text = exp.mlir_module()
        bad_i1 = lint_i1_vectors(text)
        bad_sc = lint_tiled_shape_casts(text)
    except Exception as e:  # noqa: BLE001 — report and keep scanning
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:2000]}")
        return False
    if bad_i1:
        print(f"FAIL {name}: i1-vector value ops (libtpu rejects these "
              f"with 'Unsupported target bitwidth for truncation' even "
              f"though jax.export accepts them):")
        for line in bad_i1[:8]:
            print(f"     {line[:160]}")
        return False
    if bad_sc:
        print(f"FAIL {name}: tiled-dim vector shape_casts (libtpu "
              f"rejects these with 'infer-vector-layout: unsupported "
              f"shape cast' even though jax.export accepts them):")
        for line in bad_sc[:8]:
            print(f"     {line[:160]}")
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
    # training-forward shapes (round 4: the kernel is train-legal via
    # stop_gradient): sa1 at batch 6 is B*objs=54, S==N=1024
    ok &= _export_tpu(
        "query_ball_point_pallas (B54 N1024 S1024 K32, train sa1)",
        lambda a, b: query_ball_point_pallas(0.2, 32, a, b),
        jnp.zeros((54, 1024, 3)), jnp.zeros((54, 1024, 3)))
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
    # the two driver-relevant flagship points at the REAL T (the (T, 3)
    # SMEM coefficient table's legality depends on T — the round-3
    # verify run caught an illegal (1, 3) per-step tiling exactly here)
    for Bf, T, cdt in ((1, 1000, jnp.float32), (8, 1000, jnp.bfloat16)):
        xf = jnp.zeros((Bf, N, 3))
        ok &= _export_tpu(
            f"fused_denoise_chain (B{Bf} T{T} {jnp.dtype(cdt).name})",
            lambda a, b, c, d, e: fused_denoise_chain(  # noqa: B023
                a, b, c, d, e, p, compute_dtype=cdt),
            xf, jnp.zeros((Bf, T, N, 3)), xf, jnp.zeros((Bf, T, D2)),
            jnp.zeros((T, 3)))
    return ok


def case_sa():
    from lsdm_tpu.ops.sa_fused_pallas import sa_stage_fused

    ok = True
    # the four real PointNet2Backbone stages at flagship scale
    # (models/pointnet2.py:239-246; sa1 S==N via the FPS-identity shortcut,
    # Cin = 3 + previous stage's feature width); plus a bf16 pass
    for name, N, S, Cin, mlp, cdt, B in (
        ("sa1", 1024, 1024, 6, (32, 32, 64), jnp.float32, 9),
        ("sa2", 1024, 256, 67, (64, 64, 128), jnp.float32, 9),
        ("sa3", 256, 64, 131, (128, 128, 256), jnp.float32, 9),
        ("sa4", 64, 16, 259, (256, 256, 512), jnp.float32, 9),
        ("sa1 bf16", 1024, 1024, 6, (32, 32, 64), jnp.bfloat16, 9),
        # flagship batch-8 point: B*objs = 72 rides the grid's batch dim
        ("sa1 b8 bf16", 1024, 1024, 6, (32, 32, 64), jnp.bfloat16, 72),
        ("sa2 b8 bf16", 1024, 256, 67, (64, 64, 128), jnp.bfloat16, 72),
    ):
        folded, f_in = [], Cin
        for f in mlp:
            folded.append((jnp.zeros((f_in, f)), jnp.zeros((f,))))
            f_in = f
        ok &= _export_tpu(
            f"sa_stage_fused ({name}: B{B} N{N} S{S} C{Cin})",
            lambda a, b, c: sa_stage_fused(  # noqa: B023
                0.4, 32, a, b, c, tuple(folded), compute_dtype=cdt),
            jnp.zeros((B, N, 3)), jnp.zeros((B, S, 3)),
            jnp.zeros((B, N, Cin)))
    return ok


def case_fp():
    from lsdm_tpu.ops.fp_fused_pallas import fp_stage_fused

    ok = True
    # the four real PointNet2Backbone FP stages at flagship scale
    # (models/pointnet2.py; D1 = that level's feature width, D2 = the
    # coarser level's; fp1 has points1=None); plus a bf16 pass
    # fp1 carries the backbone tail (head relu + conv2 linear) as extra
    # layers in the flagship fused program (models/pointnet2.py)
    for name, N, S, D1, D2, mlp, acts, cdt, B in (
        ("fp4", 64, 16, 256, 512, (256, 256), None, jnp.float32, 9),
        ("fp3", 256, 64, 128, 256, (256, 256), None, jnp.float32, 9),
        ("fp2", 1024, 256, 64, 256, (256, 128), None, jnp.float32, 9),
        ("fp1+tail", 1024, 1024, None, 128, (128, 128, 128, 128, 3),
         ("relu",) * 4 + ("none",), jnp.float32, 9),
        ("fp2 bf16", 1024, 256, 64, 256, (256, 128), None, jnp.bfloat16, 9),
        # flagship batch-8 point (B*objs = 72)
        ("fp1+tail b8 bf16", 1024, 1024, None, 128, (128, 128, 128, 128, 3),
         ("relu",) * 4 + ("none",), jnp.bfloat16, 72),
    ):
        folded, f_in = [], (0 if D1 is None else D1) + D2
        for f in mlp:
            folded.append((jnp.zeros((f_in, f)), jnp.zeros((f,))))
            f_in = f
        p1 = None if D1 is None else jnp.zeros((B, N, D1))
        ok &= _export_tpu(
            f"fp_stage_fused ({name}: B{B} N{N} S{S})",
            lambda a, b, c: fp_stage_fused(  # noqa: B023
                a, b, p1, c, tuple(folded), acts=acts, compute_dtype=cdt),
            jnp.zeros((B, N, 3)), jnp.zeros((B, S, 3)),
            jnp.zeros((B, S, D2)))
    return ok


def case_sg():
    from lsdm_tpu.ops.sg_fused_pallas import select_gather_grouped

    ok = True
    # the four real SA stages at flagship TRAIN scale (batch 6 ->
    # B*objs = 54; ball_impl="sg" is the train-path kernel) in both
    # compute dtypes; the grad export additionally lowers the whole
    # custom-VJP program (kernel + XLA one-hot segment-sum backward)
    for name, N, S, Cin in (
        ("sa1", 1024, 1024, 6),
        ("sa2", 1024, 256, 67),
        ("sa3", 256, 64, 131),
        ("sa4", 64, 16, 259),
    ):
        for cdt in (jnp.float32, jnp.bfloat16):
            dt = jnp.dtype(cdt).name
            xyz = jnp.zeros((54, N, 3))
            q = jnp.zeros((54, S, 3))
            base = jnp.zeros((54, N, Cin), cdt)
            ok &= _export_tpu(
                f"select_gather_grouped ({name}: B54 N{N} S{S} C{Cin} {dt})",
                lambda a, b, c: select_gather_grouped(  # noqa: B023
                    0.4, 32, cdt, False, a, b, c),
                xyz, q, base)
        ok &= _export_tpu(
            f"select_gather_grouped grad ({name})",
            jax.grad(lambda a, b, c: jnp.sum(  # noqa: B023
                select_gather_grouped(0.4, 32, jnp.float32, False, a, b, c)
                .astype(jnp.float32) ** 2), argnums=(1, 2)),
            jnp.zeros((54, N, 3)), jnp.zeros((54, S, 3)),
            jnp.zeros((54, N, Cin)))
    return ok


def case_fps():
    from lsdm_tpu.ops.fps_pallas import farthest_point_sample_pallas

    ok = True
    # the three real FPS calls (sa2/sa3/sa4; sa1 is the identity shortcut)
    # at both flagship batch points (B*objs = 9 and 72)
    for B in (9, 72):
        for N, P in ((1024, 256), (256, 64), (64, 16)):
            ok &= _export_tpu(
                f"farthest_point_sample_pallas (B{B} N{N} P{P})",
                lambda a, b: farthest_point_sample_pallas(a, P, b),  # noqa: B023
                jnp.zeros((B, N, 3)), jnp.zeros((B,), jnp.int32))
    from lsdm_tpu.ops.fps_batched_pallas import farthest_point_sample_batched

    # batched variant: train flagship B*objs = 54 plus both bench points
    for B in (9, 54, 72):
        for N, P in ((1024, 256), (256, 64), (64, 16)):
            ok &= _export_tpu(
                f"farthest_point_sample_batched (B{B} N{N} P{P})",
                lambda a, b: farthest_point_sample_batched(a, P, b),  # noqa: B023
                jnp.zeros((B, N, 3)), jnp.zeros((B,), jnp.int32))
    return ok


def case_attn():
    from lsdm_tpu.ops.attn_pallas import rank1_mha_pallas

    ok = True
    # pcd_attention flagship shapes: L=S=1024, H=12, at both batch points
    # (B*O = 9 fp32 / bf16, and the batch-8 eval's 72 bf16)
    for B, cdt in ((9, jnp.float32), (9, jnp.bfloat16), (72, jnp.bfloat16)):
        ok &= _export_tpu(
            f"rank1_mha_pallas (B{B} L1024 H12, {jnp.dtype(cdt).name})",
            lambda a, b, c: rank1_mha_pallas(a, b, c, compute_dtype=cdt),
            jnp.zeros((B, 1024, 12)), jnp.zeros((B, 1024, 12)),
            jnp.zeros((B, 1024, 12)))
    return ok


def case_attn_train():
    from lsdm_tpu.ops.attn_pallas import rank1_mha_train

    ok = True
    # the differentiated train program (fwd kernel + flash-VJP bwd kernel)
    # at the flagship train batch (B*O = 54), both compute dtypes, plus
    # the tiny smoke batch point
    for B, cdt in ((54, jnp.bfloat16), (54, jnp.float32), (4, jnp.float32)):
        def fwd_bwd(q, k, v, g, cdt=cdt):
            out, vjp = jax.vjp(
                lambda a, b, c: rank1_mha_train(a, b, c, cdt, False),
                q, k, v)
            return out, vjp(g)

        z = jnp.zeros((B, 1024, 12))
        ok &= _export_tpu(
            f"rank1_mha_train fwd+bwd (B{B} L1024 H12, "
            f"{jnp.dtype(cdt).name})", fwd_bwd, z, z, z, z)
    return ok


CASES = {
    "attn": case_attn,
    "attn_train": case_attn_train,
    "ballquery": case_ballquery,
    "chamfer": case_chamfer,
    "denoise": case_denoise,
    "fp": case_fp,
    "fps": case_fps,
    "sa": case_sa,
    "sg": case_sg,
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
