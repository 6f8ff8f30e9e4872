"""On-chip stage attribution for the SDM encode / backbone / sampler.

Consolidates the round-3 /tmp probe scripts (probe_backbone/probe_layers/
probe_ballquery — their numbers are recorded in PERF.md) into a permanent
tool.  Every timing goes through ``utils/profiling.py:scan_bench`` —
per-iteration device time amortized inside one ``lax.scan`` dispatch,
fenced by a forced host transfer (the only dependable fence on the
tunneled axon TPU, where ``block_until_ready`` does not reliably block).

    python tools/profile_stages.py --what backbone          # eval + train fwd/bwd
    python tools/profile_stages.py --what encode            # full encode_conditioning
    python tools/profile_stages.py --what encode --ball_impl fused
    python tools/profile_stages.py --what sa --ball_impl pallas
    python tools/profile_stages.py --what attn

Defaults mirror the flagship shapes (B*O = 9 eval / 54 train clouds of
1024 points).  Run ONE at a time on the TPU (two processes fight over
the chip); budget a fresh remote compile per new program.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def _bench(name: str, fn, x0, reps: int):
    import jax.numpy as jnp  # noqa: F401

    from lsdm_tpu.utils.profiling import scan_bench

    try:
        t = scan_bench(fn, x0, reps=reps)
        print(f"{name}: {t * 1e3:.3f} ms/call")
    except Exception as e:  # noqa: BLE001 — report and keep profiling
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}")


def profile_backbone(args):
    import jax.numpy as jnp

    from lsdm_tpu.models.pointnet2 import PointNet2Backbone

    BO = args.clouds
    N = 64 if args.smoke else 1024
    xyz = jax.random.normal(jax.random.PRNGKey(0), (BO, N, 3))
    bb = PointNet2Backbone(out_dim=3, dtype=jnp.dtype(args.dtype),
                           ball_impl=args.ball_impl,
                           gather_bwd=args.gather_bwd)
    vs = bb.init({"params": jax.random.PRNGKey(1),
                  "dropout": jax.random.PRNGKey(2)}, xyz, True)

    def fwd_eval(x):
        return x + 0.0 * jnp.mean(bb.apply(vs, x, False).astype(jnp.float32))

    _bench(f"backbone fwd eval (BO={BO}, {args.ball_impl})", fwd_eval, xyz,
           args.reps)

    def fwd_bwd(x):
        def loss(p):
            out, _ = bb.apply(
                {"params": p, "batch_stats": vs["batch_stats"]}, x, True,
                mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(3)})
            return jnp.mean(out.astype(jnp.float32) ** 2)
        g = jax.grad(loss)(vs["params"])
        return x + 0.0 * jax.tree_util.tree_reduce(
            lambda a, l: a + jnp.sum(l).astype(jnp.float32), g,
            jnp.float32(0.0))

    _bench(f"backbone fwd+bwd train (BO={BO})", fwd_bwd, xyz, args.reps)


def profile_sa(args):
    import jax.numpy as jnp

    from lsdm_tpu.models.pointnet2 import PointNetSetAbstraction

    BO = args.clouds
    # sa1/sa2 at flagship shapes — the two dominant stages (PERF.md)
    shapes = (("sa1", 1024, 1024, (32, 32, 64), 0.1),
              ("sa2", 1024, 256, (64, 64, 128), 0.2))
    if args.smoke:
        shapes = (("sa1", 64, 64, (32, 32, 64), 0.1),
                  ("sa2", 64, 16, (64, 64, 128), 0.2))
    for name, N, S, mlp, r in shapes:
        xyz = jax.random.normal(jax.random.PRNGKey(0), (BO, N, 3))
        feats = jax.random.normal(jax.random.PRNGKey(1),
                                  (BO, N, mlp[0] // 4 * 3))
        sa = PointNetSetAbstraction(S, r, 32, mlp, dtype=jnp.dtype(args.dtype),
                                    ball_impl=args.ball_impl,
                                    gather_bwd=args.gather_bwd)
        vs = sa.init(jax.random.PRNGKey(2), xyz, feats, False)

        def fwd(x, sa=sa, vs=vs, feats=feats):
            _, out = sa.apply(vs, x, feats, False)
            return x + 0.0 * jnp.mean(out.astype(jnp.float32))

        _bench(f"{name} fwd eval (BO={BO}, {args.ball_impl})", fwd, xyz,
               args.reps)


def profile_train_stages(args):
    """Per-stage fwd+bwd attribution of the TRAIN backbone at flagship
    shapes (54 clouds x 1024 pts): each SA/FP stage timed alone with
    gradients flowing to params AND inputs (as in the real step, where
    upstream stages receive the cotangent).  Ranks the stages so the
    round-5 kernel campaign attacks the right one."""
    import jax.numpy as jnp

    from lsdm_tpu.models.pointnet2 import (PointNetFeaturePropagation,
                                           PointNetSetAbstraction)

    BO = args.clouds
    sc = 16 if args.smoke else 1
    # (name, N, S, in_ch, mlp, radius) — backbone flagship proportions
    sa_shapes = (("sa1", 1024 // sc, 1024 // sc, 3, (32, 32, 64), 0.1),
                 ("sa2", 1024 // sc, 256 // sc, 64, (64, 64, 128), 0.2),
                 ("sa3", 256 // sc, 64 // sc, 128, (128, 128, 256), 0.4),
                 ("sa4", 64 // sc, 16 // sc, 256, (256, 256, 512), 0.8))
    for name, N, S, cin, mlp, r in sa_shapes:
        xyz = jax.random.normal(jax.random.PRNGKey(0), (BO, N, 3))
        feats = jax.random.normal(jax.random.PRNGKey(1), (BO, N, cin))
        sa = PointNetSetAbstraction(
            S, r, 32, mlp, dtype=jnp.dtype(args.dtype),
            ball_impl=args.ball_impl, gather_bwd=args.gather_bwd)
        vs = sa.init(jax.random.PRNGKey(2), xyz, feats, True)

        def fwd_bwd(x, sa=sa, vs=vs, feats=feats):
            def loss(p, f):
                (_, out), _ = sa.apply(
                    {"params": p, "batch_stats": vs["batch_stats"]}, x, f,
                    True, mutable=["batch_stats"])
                return jnp.mean(out.astype(jnp.float32) ** 2)
            gp, gf = jax.grad(loss, argnums=(0, 1))(vs["params"], feats)
            acc = jax.tree_util.tree_reduce(
                lambda a, l: a + jnp.sum(l).astype(jnp.float32), gp,
                jnp.float32(0.0))
            return x + 0.0 * (acc + jnp.sum(gf).astype(jnp.float32))

        _bench(f"{name} fwd+bwd (BO={BO}, N={N}->S={S}, {args.ball_impl}, "
               f"{args.gather_bwd}, {args.dtype})", fwd_bwd, xyz, args.reps)

    # (name, N_target, S_source, ch1, ch2, mlp)
    fp_shapes = (("fp4", 64 // sc, 16 // sc, 256, 512, (256, 256)),
                 ("fp3", 256 // sc, 64 // sc, 128, 256, (256, 256)),
                 ("fp2", 1024 // sc, 256 // sc, 64, 256, (256, 128)),
                 ("fp1", 1024 // sc, 1024 // sc, 0, 128, (128, 128, 128)))
    for name, N, S, c1, c2, mlp in fp_shapes:
        xyz1 = jax.random.normal(jax.random.PRNGKey(0), (BO, N, 3))
        xyz2 = jax.random.normal(jax.random.PRNGKey(1), (BO, S, 3))
        p1 = (jax.random.normal(jax.random.PRNGKey(2), (BO, N, c1))
              if c1 else None)
        p2 = jax.random.normal(jax.random.PRNGKey(3), (BO, S, c2))
        nn_impl = ("pallas" if args.ball_impl in ("pallas", "fused", "sg")
                   else "auto")
        fp = PointNetFeaturePropagation(
            mlp, dtype=jnp.dtype(args.dtype), nn_impl=nn_impl,
            gather_bwd=args.gather_bwd)
        vs = fp.init(jax.random.PRNGKey(4), xyz1, xyz2, p1, p2, True)

        def fwd_bwd(x, fp=fp, vs=vs, xyz2=xyz2, p1=p1, p2=p2):
            def loss(p, f2):
                out, _ = fp.apply(
                    {"params": p, "batch_stats": vs["batch_stats"]}, x,
                    xyz2, p1, f2, True, mutable=["batch_stats"])
                return jnp.mean(out.astype(jnp.float32) ** 2)
            gp, gf = jax.grad(loss, argnums=(0, 1))(vs["params"], p2)
            acc = jax.tree_util.tree_reduce(
                lambda a, l: a + jnp.sum(l).astype(jnp.float32), gp,
                jnp.float32(0.0))
            return x + 0.0 * (acc + jnp.sum(gf).astype(jnp.float32))

        _bench(f"{name} fwd+bwd (BO={BO}, S={S}->N={N}, {args.gather_bwd}, "
               f"{args.dtype})", fwd_bwd, xyz1, args.reps)


def profile_encode(args):
    import dataclasses

    import jax.numpy as jnp

    from lsdm_tpu import config as cfg_lib
    from lsdm_tpu.models.sdm import SceneDiffusionModel

    if args.smoke:
        from lsdm_tpu.config import SDMConfig

        cfg = SDMConfig(clip_dim=32, latent_dim=16, cat_emb=8, n_head=4,
                        vert_dims=24, pcd_points=32)
    else:
        cfg = cfg_lib.sdm_proxd()
    cfg = dataclasses.replace(cfg, ball_impl=args.ball_impl,
                              dtype=args.dtype)
    model = SceneDiffusionModel(cfg)
    B, O, N = args.batch, cfg.max_objs, cfg.pcd_points
    k = jax.random.PRNGKey(0)
    mask = jnp.zeros((B, O)).at[:, 1:5].set(1.0)
    objs = jax.random.normal(k, (B, O, N, 3))
    cats = jax.nn.one_hot(jnp.zeros((B, O), jnp.int32), cfg.max_cats)
    text = jax.random.normal(k, (B, cfg.clip_dim))
    x = jax.random.normal(k, (B, N, 3))
    t = jnp.zeros((B,), jnp.int32)
    variables = model.init(jax.random.PRNGKey(1), x[:1], mask[:1], t[:1],
                           objs[:1], cats[:1], text[:1])

    def encode(o):
        c = model.apply(variables, mask, o, cats, text,
                        method=SceneDiffusionModel.encode_conditioning)
        return o + 0.0 * jnp.mean(c.cond_pcd.astype(jnp.float32))

    _bench(f"encode_conditioning (B={B}, {args.ball_impl}, {args.dtype})",
           encode, objs, args.reps)


def profile_attn(args):
    import jax.numpy as jnp

    from lsdm_tpu.ops.attention import TorchMultiheadAttention

    BO = args.clouds
    N = 64 if args.smoke else 1024
    q = jax.random.normal(jax.random.PRNGKey(0), (BO, N, 12))
    kv = jax.random.normal(jax.random.PRNGKey(1), (BO, N, 3))
    m = TorchMultiheadAttention(embed_dim=12, num_heads=12, kdim=3, vdim=3,
                                dtype=jnp.dtype(args.dtype))
    vs = m.init(jax.random.PRNGKey(2), q, kv, kv)
    for fused in (False, True):
        def fwd(x, fused=fused):
            out, _ = m.apply(vs, x, kv, kv, fused=fused)
            return x + 0.0 * jnp.mean(out.astype(jnp.float32))
        _bench(f"pcd_attention (BO={BO}, fused={fused})", fwd, q, args.reps)


WHAT = {"backbone": profile_backbone, "sa": profile_sa,
        "encode": profile_encode, "attn": profile_attn,
        "train_stages": profile_train_stages}


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--what", choices=sorted(WHAT), default="backbone")
    ap.add_argument("--ball_impl", default="auto")
    ap.add_argument("--gather_bwd", default="scatter")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--clouds", type=int, default=9,
                    help="B*O cloud count (9 = batch-1 eval, 54 = train)")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes (CPU self-test; timings meaningless)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    WHAT[args.what](args)


if __name__ == "__main__":
    main()
