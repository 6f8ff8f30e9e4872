"""Benchmark: DDPM sampling throughput of the full-size SDM on one chip.

Headline metric (BASELINE.md north star): denoiser steps/sec for the
reference eval configuration — batch 1, 9 objects x 1024 points, T=1000
DDPM (no respacing), full SceneDiffusionModel forward per step.

``value``      = steps/sec of the jit-scanned sampler (ours).
``vs_baseline``= speedup vs the *reference execution model* measured on the
SAME hardware: one jitted denoiser step dispatched from a host Python loop
per timestep, which is exactly how the reference drives its sampler
(``diffusion/gaussian_diffusion.py:736-759`` — 1000 sequential launches).
This isolates the architectural win (single fused scan vs host-driven
stepping) from hardware differences; the reference repo publishes no
absolute numbers to compare against (BASELINE.md).

Prints ONE JSON line:
  {"metric": "ddpm_steps_per_sec", "value": N, "unit": "steps/s",
   "vs_baseline": N}
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time


def _device_alive(timeout: float = 120.0) -> bool:
    """Probe the ambient JAX backend in a SUBPROCESS with a hard timeout.

    The tunneled axon TPU transport can die (env outage); a hung transport
    blocks the first device op for ~50 min before erroring (observed:
    .bench_logs/queue.log bench_closeout rc=1 after 52 min).  An in-process
    call cannot be timed out reliably, so the probe runs `jnp.ones().sum()`
    in a child interpreter and kills it on timeout."""
    code = ("import jax, jax.numpy as jnp; "
            "print(float(jnp.sum(jnp.ones((2, 2)))))")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout,
                           capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny shapes, quick")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--baseline_steps", type=int, default=50,
                    help="host-loop steps to time (extrapolated)")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="denoiser compute dtype (params stay fp32)")
    ap.add_argument("--unroll", type=int, default=1,
                    help="lax.scan unroll factor for the sampling loop")
    ap.add_argument("--cond_chunk", type=int, default=None,
                    help="encode conditioning in batch chunks of this size "
                         "(caps the PointNet++ activation peak; see "
                         "models/sampling.py)")
    ap.add_argument("--ball_impl", default="auto",
                    choices=["auto", "topk", "topk_p", "topk2", "topk2c", "pallas", "fused", "scatter",
                             "binsearch"],
                    help="ball-query formulation A/B (PERF.md round 3); "
                         "'auto' = the production default")
    ap.add_argument("--gather_bwd", default="scatter",
                    choices=["scatter", "matmul", "matmul_fwd"],
                    help="grouping-gather formulation; matmul_fwd runs the "
                         "forward gathers as one-hot MXU contractions "
                         "(bf16-grade numerics; PERF.md round 3)")
    ap.add_argument("--noise_table", action="store_true",
                    help="pre-generate per-step noise outside the scan "
                         "(same fold_in keys; hoists threefry out of the "
                         "body)")
    ap.add_argument("--fused_step", nargs="?", const="step", default="auto",
                    choices=["auto", "step", "chain", "none"],
                    help="Pallas-fused sampling: 'step' = per-step tail as "
                         "one kernel; 'chain' = the WHOLE T-step loop as "
                         "one kernel launch (ops/denoise_pallas.py); "
                         "'auto' (default) = 'chain' on TPU, composed on "
                         "CPU; 'none' = force the composed scan")
    ap.add_argument("--scan_scenes", type=int, default=None,
                    help="sample K scenes sequentially inside ONE compiled "
                         "program (lax.scan over keys) — sustained device "
                         "throughput with the ~28 ms tunnel dispatch "
                         "amortized 1/K instead of sitting inside every "
                         "scene wall")
    ap.add_argument("--no_baseline", action="store_true",
                    help="skip the host-loop baseline (vs_baseline=0); "
                         "useful for batched-throughput rows where only "
                         "ours matters")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. 'cpu' for self-tests)")
    ap.add_argument("--wait_tpu", type=float, default=900.0,
                    help="seconds to wait for a dead device tunnel before "
                         "failing fast (0 = skip the health probe)")
    args = ap.parse_args()

    # Fail fast on a dead tunnel instead of hanging ~50 min in the first
    # device op: probe the backend in a bounded subprocess, ride out brief
    # outages up to --wait_tpu, then emit an explicit error JSON and exit.
    if args.platform is None and args.wait_tpu > 0:
        deadline = time.monotonic() + args.wait_tpu
        alive = _device_alive()
        while not alive and time.monotonic() < deadline:
            print("[bench] device tunnel unreachable; retrying "
                  f"(up to {args.wait_tpu:.0f}s total)", file=sys.stderr)
            time.sleep(60)
            alive = _device_alive()
        if not alive:
            print(json.dumps({
                "metric": "ddpm_steps_per_sec", "value": 0.0,
                "unit": "steps/s", "vs_baseline": 0.0,
                "error": "device tunnel unreachable (probe timed out)",
            }))
            sys.exit(1)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    # Persistent compilation cache: remote (tunneled) TPU compiles take
    # minutes per program; cached executables make repeat bench runs fast.
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    import jax.numpy as jnp

    from lsdm_tpu import config as cfg_lib
    from lsdm_tpu.config import SDMConfig
    from lsdm_tpu.diffusion import make_schedule, p_sample_loop
    from lsdm_tpu.diffusion.sampler import p_sample_step
    from lsdm_tpu.models.sampling import resolve_fast_path
    from lsdm_tpu.models.sdm import SceneDiffusionModel

    import dataclasses

    # Round-4 default promotion: on TPU, "auto" resolves to the
    # measured-best eval program — fully-fused encode + whole-loop chain
    # kernel (41.3 ms vs 50-57 ms composed at the flagship config; on-chip
    # composed-vs-fused equivalence recorded in PERF.md round 4 via
    # tools/onchip_equiv.py).  On CPU the composed path is kept.
    args.ball_impl, args.fused_step = resolve_fast_path(
        args.ball_impl, args.fused_step)

    if args.smoke:
        cfg = SDMConfig(
            clip_dim=32, latent_dim=16, cat_emb=8, n_head=4, vert_dims=24,
            pcd_points=32,
        )
        T = 20
        baseline_steps = 5
    else:
        cfg = cfg_lib.sdm_proxd()  # full-size: 1024 pts, latent 128
        T = args.steps
        baseline_steps = args.baseline_steps
    cfg = dataclasses.replace(cfg, dtype=args.dtype,
                              ball_impl=args.ball_impl,
                              gather_bwd=args.gather_bwd)

    B, O, N = args.batch, cfg.max_objs, cfg.pcd_points
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (B, N, 3))
    mask = jnp.zeros((B, O)).at[:, 1:5].set(1.0)
    objs = jax.random.normal(ks[1], (B, O, N, 3))
    cats = jax.nn.one_hot(jax.random.randint(ks[2], (B, O), 0, cfg.max_cats),
                          cfg.max_cats)
    text = jax.random.normal(ks[3], (B, cfg.clip_dim))

    model = SceneDiffusionModel(cfg)
    # init at batch 1: params are batch-independent and a full-batch init
    # forward would pay the whole conditioning-activation peak up front
    variables = model.init(ks[4], x[:1], mask[:1], jnp.zeros((1,), jnp.int32),
                           objs[:1], cats[:1], text[:1])
    schedule = make_schedule("cosine", T)

    # The host-stepped baseline models the REFERENCE's execution (one full
    # composed forward per step) — it must not pick up our fused kernels,
    # both for faithfulness and so its cached program hash survives the
    # round-4 default flip.  Same variables; param trees are identical.
    model_composed = SceneDiffusionModel(
        dataclasses.replace(cfg, ball_impl="auto"))

    def model_fn(x_t, tt):
        return model_composed.apply(variables, x_t, mask, tt, objs, cats,
                                    text)

    # ---- ours: conditioning encoded once + one scanned loop (the
    # production sampling path, lsdm_tpu.models.sampling.sample_sdm).
    # NOTE: timings force a host transfer of a reduced scalar;
    # block_until_ready alone does not reliably block on tunneled
    # transports (axon), which silently turns timings into dispatch
    # latency measurements.
    from lsdm_tpu.models.sampling import sample_sdm

    def sample_one(key):
        s, _ = sample_sdm(model, variables, schedule, mask, objs, cats, text,
                          key, clip_denoised=False,
                          cond_chunk=args.cond_chunk, unroll=args.unroll,
                          noise_table=args.noise_table,
                          fused_step=args.fused_step)
        return jnp.sum(s)

    if args.scan_scenes:
        K = args.scan_scenes

        @jax.jit
        def sample(key):
            def body(acc, kk):
                return acc + sample_one(kk), None
            tot, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jax.random.split(key, K))
            return tot
    else:
        K = 1
        sample = jax.jit(sample_one)

    float(sample(jax.random.PRNGKey(1)))  # compile + execute
    best = float("inf")
    for r in range(args.repeats):
        t0 = time.perf_counter()
        float(sample(jax.random.PRNGKey(2 + r)))
        best = min(best, time.perf_counter() - t0)
    best = best / K  # per-scene(-batch) wall; dispatch amortized 1/K
    ours_steps_per_sec = T / best

    # Secondary datapoints (stderr; stdout stays one JSON line): per-scene
    # wall time and XLA-estimated FLOP throughput — how loaded the chip is
    # at this batch size (VERDICT r01 item 6).  cost_analysis comes from the
    # local lowering (no second device compile).
    try:
        ca = jax.jit(sample).lower(jax.random.PRNGKey(1)).cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        total_flops = float(ca.get("flops", 0.0))
    except Exception:
        total_flops = 0.0
    print(
        f"[bench] batch={args.batch} dtype={args.dtype} T={T}: "
        f"scene_wall={best * 1e3:.1f} ms, {ours_steps_per_sec:.1f} steps/s, "
        f"sampled_scenes/s={args.batch / best:.2f}"
        + (f", est {total_flops / best / 1e12:.3f} TFLOP/s "
           f"({total_flops / T / args.batch / 1e9:.2f} GFLOP/step/scene)"
           if total_flops else ""),
        file=sys.stderr,
    )

    if args.no_baseline:
        print(json.dumps({
            "metric": "ddpm_steps_per_sec",
            "value": round(ours_steps_per_sec, 3),
            "unit": "steps/s",
            "vs_baseline": 0.0,
        }))
        return

    # ---- reference execution model: host loop of single jitted steps
    @jax.jit
    def one_step(x, t, key):
        s, _, _ = p_sample_step(schedule, model_fn, x, t, key,
                                clip_denoised=False)
        return s

    xb = jax.random.normal(jax.random.PRNGKey(9), (B, N, 3))
    float(jnp.sum(one_step(xb, jnp.full((B,), T - 1, jnp.int32),
                           jax.random.PRNGKey(0))))  # compile + execute
    t0 = time.perf_counter()
    cur = xb
    for i in range(baseline_steps):
        t_i = jnp.full((B,), max(T - 1 - i, 0), jnp.int32)
        cur = one_step(cur, t_i, jax.random.fold_in(jax.random.PRNGKey(1), i))
        float(jnp.sum(cur))  # the reference syncs every step (host loop)
    baseline_time = time.perf_counter() - t0
    baseline_steps_per_sec = baseline_steps / baseline_time

    result = {
        "metric": "ddpm_steps_per_sec",
        "value": round(ours_steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(ours_steps_per_sec / baseline_steps_per_sec, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
