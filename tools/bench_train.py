"""Training-step throughput at the reference parity configuration.

The reference reports wall-clock seconds per epoch on one GPU at batch 6
(``run/train_sdm.py:296-299``, BASELINE.md row "Training throughput");
this measures the same unit of work — full SceneDiffusionModel forward +
backward + AdamW update at batch 6, 9x1024 points — on one chip.

Timings amortize dispatch latency over ``--chunk`` scanned steps (axon
per-dispatch latency is ~28 ms and ``block_until_ready`` is unreliable —
see PERF.md measurement notes).

Prints one line:
  train_steps_per_sec=<N> scenes_per_sec=<N> step_ms=<N>
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--chunk", type=int, default=20,
                    help="steps per timed device dispatch")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--bn_dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="PointNet++ BatchNorm compute dtype (PERF.md)")
    ap.add_argument("--chamfer", default="xla", choices=["xla", "pallas"],
                    help="training-loss chamfer implementation")
    ap.add_argument("--gather_bwd", default="matmul",
                    choices=["scatter", "matmul", "matmul_fwd"],
                    help="grouping-gather VJP: exact scatter-add vs "
                         "one-hot MXU contraction; matmul_fwd also runs "
                         "the forward on the MXU (PERF.md round 3)")
    ap.add_argument("--ball_impl", default="auto",
                    choices=["auto", "topk", "topk_p", "topk2", "topk2c", "pallas", "fused", "sg", "scatter",
                             "binsearch"],
                    help="ball-query formulation (PERF.md round 3)")
    ap.add_argument("--attn_impl", default="auto",
                    choices=["auto", "xla", "pallas"],
                    help="train-time pcd_attention: composed XLA (HBM "
                         "logits planes) vs the fused rank-1 kernel with "
                         "the flash-style custom VJP; auto (default, "
                         "matching the run/train_sdm default) = pallas "
                         "on TPU")
    ap.add_argument("--ablate", default=None,
                    help="comma-separated components to stub out to "
                         "attribute step time (diagnostic, not a training "
                         "mode): ballquery, fps, pcd_backbone, "
                         "human_backbone, denoise_head, optimizer, loss, "
                         "rng, attn")
    ap.add_argument("--sa_hoist", action="store_true",
                    help="hoist each SA stage's layer-1 Dense to the N "
                         "domain (measured -12%% train NEGATIVE on TPU, "
                         "PERF.md round 5; kept for experimentation)")
    ap.add_argument("--fps_batched", action="store_true",
                    help="batch-parallel FPS kernel (round-5 "
                         "candidate; ops/fps_batched_pallas.py)")
    ap.add_argument("--human_backbone", default=None,
                    choices=["POSA", "P2R"],
                    help="override the human-tower type (default: the "
                         "config's, POSA)")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from lsdm_tpu import config as cfg_lib
    from lsdm_tpu.config import SDMConfig
    from lsdm_tpu.diffusion import make_schedule
    from lsdm_tpu.models.sdm import SceneDiffusionModel
    from lsdm_tpu.train.state import create_train_state
    from lsdm_tpu.train.trainer import make_train_step

    if args.smoke:
        cfg = SDMConfig(clip_dim=32, latent_dim=16, cat_emb=8, n_head=4,
                        vert_dims=24, pcd_points=32)
    else:
        cfg = cfg_lib.sdm_proxd()
    from lsdm_tpu.models.sampling import (
        resolve_train_attn_impl, resolve_train_ball_impl)

    attn_impl = resolve_train_attn_impl(args.attn_impl)
    # Resolve "auto" exactly like run/train_sdm.py does (pallas on TPU);
    # passing it raw would let the model fall back to the topk/scan train
    # path and silently measure the WRONG configuration (bt_confirm_r5:
    # 14.05 steps/s instead of ~23 — a harness bug, not a regression).
    ball_impl = resolve_train_ball_impl(args.ball_impl)
    cfg = dataclasses.replace(cfg, dtype=args.dtype, bn_dtype=args.bn_dtype,
                              gather_bwd=args.gather_bwd,
                              ball_impl=ball_impl,
                              attn_impl=attn_impl,
                              sa_hoist=args.sa_hoist,
                              fps_batched=args.fps_batched)
    if args.human_backbone:
        cfg = dataclasses.replace(cfg, human_backbone_type=args.human_backbone)

    ablations = set((args.ablate or "").split(",")) - {""}
    known = {"ballquery", "fps", "pcd_backbone", "human_backbone",
             "denoise_head", "optimizer", "loss", "rng", "attn"}
    if ablations - known:
        ap.error(f"unknown --ablate component(s): {sorted(ablations - known)}")
    if "attn" in ablations and attn_impl != "xla":
        # the attn stub patches the composed multihead_attention; the
        # fused_train branch never reaches it, so the measurement would
        # silently run the fused kernel un-stubbed
        ap.error("--ablate attn requires --attn_impl xla (the stub "
                 "replaces the composed formulation only)")

    if "ballquery" in ablations:
        # stub: first-K indices instead of the radius search — isolates the
        # (B*O, S, N) distance matrix + top_k cost from the grouped MLPs
        import lsdm_tpu.ops.pointcloud as _pc
        import lsdm_tpu.models.pointnet2 as _pn2

        def _stub(radius, nsample, xyz, new_xyz, impl="topk"):
            B, S = new_xyz.shape[:2]
            idx = jnp.arange(nsample, dtype=jnp.int32)
            return jnp.broadcast_to(idx, (B, S, nsample))

        _pc.query_ball_point = _stub
        _pn2.query_ball_point = _stub
    if "fps" in ablations:
        # stub: strided indices instead of the sequential farthest-point
        # scan — isolates the 336 scan iterations (sa2: 256, sa3: 64,
        # sa4: 16) from the rest of the backbone
        import lsdm_tpu.ops.pointcloud as _pc
        import lsdm_tpu.models.pointnet2 as _pn2

        def _fps_stub(xyz, npoint, key=None, **_kw):  # impl= passthrough
            B, N = xyz.shape[:2]
            idx = (jnp.arange(npoint) * (N // npoint)).astype(jnp.int32)
            return jnp.broadcast_to(idx, (B, npoint))

        _pc.farthest_point_sample = _fps_stub
        _pn2.farthest_point_sample = _fps_stub
    if "pcd_backbone" in ablations:
        # stub: mean-pooled paramless features — removes the entire
        # PointNet++ stack (9 object clouds/scene) from the step
        import lsdm_tpu.models.pointnet2 as _pn2

        def _cheap(self, xyz, train=False, fps_key=None):
            mean = jnp.mean(xyz, axis=1, keepdims=True)
            return jnp.broadcast_to(
                mean, (xyz.shape[0], xyz.shape[1], 3))[..., : self.out_dim]

        _pn2.PointNet2Backbone.__call__ = _cheap
    if "human_backbone" in ablations:
        # stub: paramless passthrough — removes the POSA-decoder (or
        # STGCN) human tower from the step while keeping its consumers
        # (the pcd_attention mix) alive
        import lsdm_tpu.models.posa as _posa
        import lsdm_tpu.models.stgcn as _stgcn

        def _hm_cheap(self, x, train=False):
            # POSA names the output length pcd_points; STGCN's field is
            # joint_num (== cfg.pcd_points at the SDM call site) — both
            # consume (B, N, 3) and must emit (B, P, 3)
            P = getattr(self, "pcd_points", None) or self.joint_num
            return jnp.broadcast_to(
                jnp.mean(x, axis=1, keepdims=True).astype(x.dtype),
                (x.shape[0], P, 3))

        _posa.POSADecoderBackbone.__call__ = _hm_cheap
        _stgcn.STGCN.__call__ = _hm_cheap
    if "denoise_head" in ablations:
        # stub: drop the timestep-emb/upsampling/combine/input/output
        # MLP tower but keep the conditioning encode alive through a
        # scalar data dependence (otherwise XLA DCEs the whole encode
        # and the measurement collapses to loss+optimizer)
        from lsdm_tpu.diffusion.gaussian import DenoiserOutput
        from lsdm_tpu.models import sdm as _sdm

        def _head_cheap(self, cond, x, timesteps):
            v = (x.astype(jnp.float32)
                 + jnp.mean(cond.cond_pcd).astype(jnp.float32)
                 + 0.0 * jnp.mean(timesteps.astype(jnp.float32)))
            return DenoiserOutput(x0=v, cat=cond.out_cat, guiding=v)

        _sdm.SceneDiffusionModel.denoise_from_cond = _head_cheap
    if "loss" in ablations:
        # stub: plain pointwise MSE instead of chamfer + CE — isolates the
        # (B, N, N) chamfer distance matrix fwd+bwd and the CE chain from
        # the rest of the step.  q_sample and the model call stay real; a
        # 1e-30-scaled cat dependence keeps the category tower un-DCEd.
        from lsdm_tpu.diffusion.gaussian import q_sample as _qs
        from lsdm_tpu.train import trainer as _trainer

        def _loss_stub(schedule, model_fn, x_start, t, target_cat, noise,
                       lambda_cat=0.1, mean_type="start_x",
                       chamfer_impl="xla"):
            x_t = _qs(schedule, x_start, t, noise)
            out = model_fn(x_t, t)
            mse = jnp.mean((out.x0.astype(jnp.float32) - x_start) ** 2)
            cat = 1e-30 * jnp.sum(out.cat.astype(jnp.float32))
            return {"loss": mse + cat, "mse": mse, "cat_loss": cat}

        _trainer.training_losses = _loss_stub
    if "attn" in ablations:
        # stub: identity-ish passthrough for the head_dim=1 pcd_attention
        # (the ONLY head_dim=1 MHA in the model) — isolates the composed
        # rank-1 attention's (B*O, 12, N, N) logits/weights HBM traffic,
        # fwd AND bwd, from the rest of the step.  attn_layer (head_dim
        # 16) and all projections stay real; tiny q/k means keep the
        # stubbed path data-dependent (not constant-foldable).
        import lsdm_tpu.ops.attention as _attn

        _real_mha = _attn.multihead_attention

        def _attn_stub(q, k, v, num_heads, attn_mask=None, dtype=jnp.float32):
            B, L, E = q.shape
            S = k.shape[1]
            if E // num_heads != 1:
                return _real_mha(q, k, v, num_heads, attn_mask=attn_mask,
                                 dtype=dtype)
            out = v.astype(dtype)[:, :L, :] + (
                1e-30 * (jnp.mean(q) + jnp.mean(k))
            ).astype(dtype)
            return out, jnp.zeros((B, L, S), dtype)

        _attn.multihead_attention = _attn_stub
    if "rng" in ablations:
        # stub: derive t/noise from raw key bits instead of threefry draws —
        # isolates the on-device RNG (randint + the (B, N, 3) normal) while
        # keeping the consumers data-dependent (not constant-foldable).
        # Patched on jax.random AFTER init/data creation below, because
        # flax initializers and the benchmark inputs draw real randoms.
        pass

    B, O, N = args.batch, cfg.max_objs, cfg.pcd_points
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    mask = jnp.zeros((B, O)).at[:, 1:5].set(1.0)
    objs = jax.random.normal(ks[0], (B, O, N, 3))
    cats = jax.nn.one_hot(
        jax.random.randint(ks[1], (B, O), 0, cfg.max_cats), cfg.max_cats)
    target = jax.random.normal(ks[2], (B, N, 3))
    target_cat = jax.nn.one_hot(
        jax.random.randint(ks[3], (B,), 0, cfg.max_cats), cfg.max_cats)
    text = jax.random.normal(ks[4], (B, cfg.clip_dim))

    model = SceneDiffusionModel(cfg)
    variables = model.init(ks[5], target, mask, jnp.zeros((B,), jnp.int32),
                           objs, cats, text)
    # "optimizer" ablation: plain SGD isolates AdamW's moment updates
    # (two extra HBM passes over every param) from the rest of the floor
    tx = optax.sgd(1e-4) if "optimizer" in ablations else optax.adamw(1e-4)
    state = create_train_state(variables, tx)
    schedule = make_schedule("cosine", 20 if args.smoke else 1000)

    if "rng" in ablations:
        # see the ablation comment above: key-bit-derived t/noise and
        # broadcast "splits", so no threefry hashing (randint, normal,
        # OR the per-step split in the chunk body / step) runs inside
        # the step (init and inputs already drawn with real randoms).
        def _split_stub(key, num=2):
            k = jnp.asarray(key)
            return jnp.broadcast_to(k[None], (num,) + k.shape)

        jax.random.split = _split_stub

        def _randint_stub(key, shape, minval, maxval, dtype=jnp.int32):
            k = jnp.asarray(key).reshape(-1)[0].astype(jnp.uint32)
            return jnp.broadcast_to(
                (k % jnp.uint32(maxval - minval)).astype(dtype) + minval,
                shape)

        def _normal_stub(key, shape=(), dtype=jnp.float32):
            k = jnp.asarray(key).reshape(-1)[-1].astype(jnp.uint32)
            return jnp.broadcast_to(
                (k.astype(jnp.float32) * 1e-10).astype(dtype), shape)

        def _bernoulli_stub(key, p=0.5, shape=None):
            return jnp.ones(() if shape is None else shape, jnp.bool_)

        jax.random.randint = _randint_stub
        jax.random.normal = _normal_stub
        jax.random.bernoulli = _bernoulli_stub  # backbone-head dropout

    step = make_train_step(model, schedule, tx, chamfer_impl=args.chamfer)

    # Chunked: `chunk` sequential train steps per device dispatch, so the
    # tunnel's dispatch latency amortizes (utils/profiling.py rationale).
    @jax.jit
    def chunked(state, key):
        def body(carry, i):
            st, k = carry
            k, sub = jax.random.split(k)
            st, metrics = step.__wrapped__(st, mask, objs, cats, target,
                                           target_cat, text, sub)
            return (st, k), metrics["loss"]

        (state, _), losses = jax.lax.scan(
            body, (state, key), jnp.arange(args.chunk))
        return state, jnp.sum(losses)

    state, s = chunked(state, jax.random.PRNGKey(1))
    float(s)  # compile + execute + host sync
    best = float("inf")
    for r in range(args.repeats):
        t0 = time.perf_counter()
        state, s = chunked(state, jax.random.PRNGKey(2 + r))
        float(s)
        best = min(best, time.perf_counter() - t0)
    sps = args.chunk / best
    print(f"train_steps_per_sec={sps:.2f} scenes_per_sec={sps * B:.1f} "
          f"step_ms={1e3 / sps:.1f} (batch={B}, dtype={args.dtype})")


if __name__ == "__main__":
    main()
