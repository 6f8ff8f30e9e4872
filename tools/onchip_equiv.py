"""On-chip composed-vs-fused sampling equivalence (VERDICT r03 item 1).

The fused eval path (``--ball_impl fused`` encode kernels +
``--fused_step chain`` whole-loop denoise kernel) must reproduce the
composed path's outputs — the ground truth being the reference eval
protocol (``/root/reference/run/test_sdm.py:186-208``: chamfer on the
final sample, category softmax, guiding points).  CPU interpret-mode
equivalence (2e-5, ``tests/test_pallas_kernels.py``) is NOT sufficient
evidence: round 3 proved the real libtpu compiler both rejects and could
in principle mis-lower programs that interpret/export accept.

This tool runs BOTH full-size sampling paths on the real chip inside ONE
jitted program with identical inputs and noise draws (the fused chain
mirrors the composed loop's key-split + ``fold_in`` exactly), and fetches
only scalar deltas:

  - encode:  max|cond_pcd_fused - cond_pcd_composed|, max|out_cat delta|
  - sample:  max|x0 delta|, chamfer(sample_fused, sample_composed)
  - last DenoiserOutput: max|cat delta|, max|guiding delta|

One program -> one remote compile; no large host transfers.  Scales the
tolerance story: chamfer between the two final samples ~0 means the paths
land in the same mode of the (stochastic, shared-noise) sampler; max-abs
bounds the pointwise numerics.

Usage (queue slot):  python tools/onchip_equiv.py [--batch 1]
                     [--dtype float32] [--steps 1000] [--platform cpu]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--platform", default=None,
                    help="force a jax platform ('cpu' self-test: tiny "
                         "config, interpret-mode kernels)")
    ap.add_argument("--mode", default="fused",
                    choices=["fused", "anchor"],
                    help="fused: composed vs fused-kernel path (the "
                         "promotion gate).  anchor: composed-default vs "
                         "composed at matmul precision=HIGHEST — measures "
                         "how much of the pointwise delta is the MXU's "
                         "bf16-grade fp32 matmul rounding ALONE, with no "
                         "kernel in the loop (VERDICT r4 item 4)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    import jax.numpy as jnp

    from lsdm_tpu import config as cfg_lib
    from lsdm_tpu.config import SDMConfig
    from lsdm_tpu.diffusion import make_schedule
    from lsdm_tpu.models.sampling import sample_sdm
    from lsdm_tpu.models.sdm import SceneDiffusionModel
    from lsdm_tpu.ops.pointcloud import chamfer_distance

    on_cpu = jax.default_backend() == "cpu"
    if on_cpu:
        cfg = SDMConfig(clip_dim=32, latent_dim=16, cat_emb=8, n_head=4,
                        vert_dims=24, pcd_points=32)
        T = 20
    else:
        cfg = cfg_lib.sdm_proxd()
        T = args.steps
    cfg_composed = dataclasses.replace(cfg, dtype=args.dtype)
    cfg_fused = dataclasses.replace(
        cfg, dtype=args.dtype,
        # anchor mode: the "b" model is the SAME composed program, only
        # traced under default_matmul_precision("highest") below — the
        # delta it shows against "a" is pure MXU rounding, no kernels
        ball_impl=("fused" if args.mode == "fused" else cfg.ball_impl))

    B, O, N = args.batch, cfg.max_objs, cfg.pcd_points
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (B, N, 3))
    mask = jnp.zeros((B, O)).at[:, 1:5].set(1.0)
    objs = jax.random.normal(ks[1], (B, O, N, 3))
    cats = jax.nn.one_hot(
        jax.random.randint(ks[2], (B, O), 0, cfg.max_cats), cfg.max_cats)
    text = jax.random.normal(ks[3], (B, cfg.clip_dim))

    # two model views over the SAME variables (param trees are identical
    # by construction — the fused path binds the composed blocks' params)
    model_a = SceneDiffusionModel(cfg_composed)
    model_b = SceneDiffusionModel(cfg_fused)
    variables = model_a.init(ks[4], x[:1], mask[:1],
                             jnp.zeros((1,), jnp.int32),
                             objs[:1], cats[:1], text[:1])
    schedule = make_schedule("cosine", T)

    def maxabs(a, b):
        return jnp.max(jnp.abs(a.astype(jnp.float32)
                               - b.astype(jnp.float32)))

    import contextlib

    b_precision = (jax.default_matmul_precision("highest")
                   if args.mode == "anchor" else contextlib.nullcontext())
    b_fused_step = "chain" if args.mode == "fused" else None

    @jax.jit
    def compare(sample_key):
        # encode-level deltas (the kernels under test live here)
        cond_a = model_a.apply(variables, mask, objs, cats, text,
                               method=model_a.encode_conditioning)
        s_a, out_a = sample_sdm(model_a, variables, schedule, mask, objs,
                                cats, text, sample_key,
                                clip_denoised=False)
        with b_precision:
            cond_b = model_b.apply(variables, mask, objs, cats, text,
                                   method=model_b.encode_conditioning)
            s_b, out_b = sample_sdm(model_b, variables, schedule, mask,
                                    objs, cats, text, sample_key,
                                    clip_denoised=False,
                                    fused_step=b_fused_step)
        return {
            "encode_cond_pcd_maxabs": maxabs(cond_a.cond_pcd,
                                             cond_b.cond_pcd),
            "encode_out_cat_maxabs": maxabs(cond_a.out_cat,
                                            cond_b.out_cat),
            "sample_maxabs": maxabs(s_a, s_b),
            "sample_chamfer": chamfer_distance(s_a, s_b),
            "x0_maxabs": maxabs(out_a.x0, out_b.x0),
            "cat_maxabs": maxabs(out_a.cat, out_b.cat),
            "guiding_maxabs": maxabs(out_a.guiding, out_b.guiding),
            "sample_rms": jnp.sqrt(jnp.mean(
                s_a.astype(jnp.float32) ** 2)),
        }

    t0 = time.perf_counter()
    out = {k: float(v) for k, v in compare(jax.random.PRNGKey(7)).items()}
    wall = time.perf_counter() - t0
    out.update(batch=B, dtype=args.dtype, T=T, mode=args.mode,
               backend=jax.default_backend(), compile_plus_run_s=round(wall, 1))
    print(json.dumps(out, sort_keys=True))
    # Gate verdict, calibrated to TPU matmul semantics (first on-chip run,
    # round 4, recorded in PERF.md): on the MXU *both* paths' fp32 matmuls
    # execute at bf16-grade precision by default, and over T sequential
    # steps the chain kernel's different fma/reassociation order
    # accumulates — measured 1.16e-2 pointwise max-abs on an RMS-1.72
    # sample at T=1000 (relative ~7e-3 ≈ bf16 eps), while the quantities
    # the eval protocol actually scores stayed tight: encode cond_pcd
    # 5.1e-5, categories EXACT (0.0), chamfer between the two final
    # clouds -2.7e-6 ≈ 0.  (CPU fp32 interpret agreement is 6e-8 at T=20
    # — the gap is MXU rounding, not logic.)  So the gate requires:
    # eval-metric-level agreement (chamfer ~0, cat tight) plus a
    # bf16-grade pointwise bound.
    # In anchor mode the SAME criteria apply: if "the 7e-3 pointwise gap
    # is MXU rounding present in both paths" is right, forcing one
    # composed path to precision=HIGHEST must open a comparable rel gap
    # against composed-default while the metric-level quantities stay
    # tight — i.e. the anchor should PASS with rel in the same decade.
    rel = out["sample_maxabs"] / max(out["sample_rms"], 1e-6)
    tol_rel = 2e-2 if args.dtype == "float32" else 6e-2
    if args.mode == "anchor":
        # precision=HIGHEST legitimately changes the encode and category
        # logits themselves (that's the measurement), so only the
        # metric-level sameness + the rel decade are gated here.
        ok = rel < tol_rel and abs(out["sample_chamfer"]) < 1e-4
    else:
        ok = (rel < tol_rel and abs(out["sample_chamfer"]) < 1e-4
              and out["cat_maxabs"] < 1e-5
              and out["encode_cond_pcd_maxabs"] < 1e-3)
    print(f"[equiv:{args.mode}] {'PASS' if ok else 'FAIL'} "
          f"(rel_maxabs={rel:.2e} vs {tol_rel:g}, "
          f"chamfer={out['sample_chamfer']:.2e}, "
          f"cat={out['cat_maxabs']:.2e}, "
          f"encode={out['encode_cond_pcd_maxabs']:.2e})", file=sys.stderr)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
