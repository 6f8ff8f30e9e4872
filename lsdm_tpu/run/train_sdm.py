"""Train the SceneDiffusionModel (reference ``run/train_sdm.py``).

Usage:
  python -m lsdm_tpu.run.train_sdm --train_data_dir data/protext/proxd_train \
      --valid_data_dir data/protext/proxd_valid --save_dir training_output \
      [--datatype proxd|humanise] [--epochs N] [--batch_size 6]
      [--mesh DATAxMODEL] [--text_encoder CLIP|HASH]
"""

from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser(description="Train LSDM on TPU")
    ap.add_argument("--train_data_dir", required=True)
    ap.add_argument("--valid_data_dir", default=None)
    ap.add_argument("--objs_data_dir", default=None)
    ap.add_argument("--save_dir", default="training_output")
    ap.add_argument("--datatype", default="proxd", choices=["proxd", "humanise"])
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--batch_size", type=int, default=6)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--eval_every", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--mesh", default=None, help="e.g. 4x2 = data x model axes")
    ap.add_argument("--text_encoder", default="auto",
                    choices=["auto", "CLIP", "BERT", "HASH"],
                    help="'auto' = CLIP when a BPE merges source exists "
                         "(tools/vendor_clip_bpe.py), else HASH")
    ap.add_argument("--bpe_path", default=None)
    ap.add_argument("--load_ckpt", default=None)
    ap.add_argument("--ema_rate", type=float, default=0.0,
                    help="parameter EMA rate (0 = off)")
    ap.add_argument("--lr_anneal_steps", type=int, default=0,
                    help="linear LR anneal horizon (0 = constant)")
    ap.add_argument("--steps_per_dispatch", type=int, default=1,
                    help="optimizer steps per device dispatch (K>1 scans K "
                         "stacked batches in one compiled program). Measured "
                         "NEGATIVE on-chip (PERF.md spd_train_k20, -14%%): the "
                         "default loop already hides dispatch latency via "
                         "async dispatch, so keep the default 1")
    ap.add_argument("--diffusion_steps", type=int, default=1000)
    ap.add_argument("--noise_schedule", default="cosine")
    ap.add_argument("--pcd_points", type=int, default=None,
                    help="override cloud size (e.g. tiny smoke runs)")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="denoiser/backbone compute dtype (params stay fp32; "
                         "bf16 is ~+20%% training throughput, PERF.md)")
    ap.add_argument("--bn_dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="PointNet++ BatchNorm compute dtype")
    ap.add_argument("--gather_bwd", default="matmul_fwd",
                    choices=["scatter", "matmul", "matmul_fwd"],
                    help="grouping-gather formulation; matmul_fwd (default "
                         "for training) runs both directions as one-hot MXU "
                         "contractions — fastest measured; 'scatter' is the "
                         "bit-exact eval formulation (PERF.md round 3)")
    ap.add_argument("--attn_impl", default="auto",
                    choices=["auto", "xla", "pallas"],
                    help="train-time pcd_attention: 'pallas' = fused "
                         "rank-1 kernel with a flash-style custom VJP "
                         "(no (N,N) logits plane in HBM either "
                         "direction); 'auto' (default) = pallas on a "
                         "TPU backend — +21.5%% train throughput "
                         "(23.1 vs 19.0 steps/s, PERF.md round 5)")
    ap.add_argument("--ball_impl", default="auto",
                    choices=["auto", "topk", "topk_p", "topk2", "topk2c", "pallas", "fused", "sg", "scatter",
                             "binsearch"],
                    help="ball-query formulation; 'auto' resolves to the "
                         "fused Pallas kernel on a TPU backend — fastest "
                         "measured train step (PERF.md round 4)")
    ap.add_argument("--sa_hoist", action="store_true",
                    help="hoist each SA stage's layer-1 Dense to the N "
                         "point domain. Measured train-time NEGATIVE on "
                         "TPU (-12%%, reproduced — the layer-1 "
                         "preactivation is wider than the grouped input "
                         "at sa1, so HBM gather bytes rise; PERF.md "
                         "round 5); kept for experimentation")
    ap.add_argument("--fps_batched", action="store_true",
                    help="batch-parallel FPS kernel: one kernel "
                         "advances all clouds per iteration (npoint "
                         "loop overheads instead of B*npoint; "
                         "bit-identical indices — "
                         "ops/fps_batched_pallas.py)")
    ap.add_argument(
        "--platform", default=None,
        help="force a jax platform (e.g. cpu); the ambient axon TPU backend "
        "registers at interpreter startup, so JAX_PLATFORMS is too late",
    )
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from lsdm_tpu import config as cfg_lib
    from lsdm_tpu.config import DiffusionConfig, TrainConfig
    from lsdm_tpu.data.dataset import DataLoader, Humanise, ProxDatasetTxt
    from lsdm_tpu.models.text import TextEncoder
    from lsdm_tpu.parallel import make_mesh
    from lsdm_tpu.train import checkpoint as ckpt_lib
    from lsdm_tpu.train.trainer import Trainer

    model_cfg = (
        cfg_lib.sdm_proxd() if args.datatype == "proxd" else cfg_lib.sdm_humanise()
    )
    import dataclasses

    if args.pcd_points:
        model_cfg = dataclasses.replace(
            model_cfg, pcd_points=args.pcd_points,
            vert_dims=min(model_cfg.vert_dims, args.pcd_points),
        )
    from lsdm_tpu.models.sampling import (
        resolve_train_attn_impl,
        resolve_train_ball_impl,
    )

    model_cfg = dataclasses.replace(
        model_cfg, dtype=args.dtype, bn_dtype=args.bn_dtype,
        gather_bwd=args.gather_bwd,
        ball_impl=resolve_train_ball_impl(args.ball_impl),
        attn_impl=resolve_train_attn_impl(args.attn_impl),
        sa_hoist=args.sa_hoist,
        fps_batched=args.fps_batched,
    )
    diff_cfg = DiffusionConfig(
        steps=args.diffusion_steps, noise_schedule=args.noise_schedule
    )
    train_cfg = TrainConfig(
        batch_size=args.batch_size,
        lr=args.lr,
        epochs=args.epochs,
        eval_every=args.eval_every,
        seed=args.seed,
        ema_rate=args.ema_rate,
        lr_anneal_steps=args.lr_anneal_steps,
        steps_per_dispatch=args.steps_per_dispatch,
    )

    ds_cls = ProxDatasetTxt if args.datatype == "proxd" else Humanise
    objs_kw = {}
    if args.objs_data_dir:
        objs_kw["objs_data_dir"] = args.objs_data_dir
    train_ds = ds_cls(args.train_data_dir, max_cats=model_cfg.max_cats,
                      pnt_size=model_cfg.pcd_points, **objs_kw)
    train_loader = DataLoader(
        train_ds, args.batch_size, shuffle=True, seed=args.seed, drop_last=True
    )
    valid_loader = None
    if args.valid_data_dir:
        valid_ds = ds_cls(args.valid_data_dir, max_cats=model_cfg.max_cats,
                          pnt_size=model_cfg.pcd_points, **objs_kw)
        valid_loader = DataLoader(valid_ds, args.batch_size, shuffle=False)

    mesh = None
    if args.mesh:
        d, m = (int(x) for x in args.mesh.split("x"))
        mesh = make_mesh((d, m))

    from lsdm_tpu.models.text import resolve_text_encoder

    args.text_encoder = resolve_text_encoder(args.text_encoder,
                                             args.bpe_path)
    text_encoder = TextEncoder(
        args.text_encoder, dim=model_cfg.clip_dim, bpe_path=args.bpe_path
    )

    trainer = Trainer(
        model_cfg, diff_cfg, train_cfg,
        text_encoder=text_encoder, mesh=mesh, save_dir=args.save_dir,
    )
    trainer.init_state(next(iter(train_loader)), args.seed)
    if args.load_ckpt:
        trainer.state, extra = ckpt_lib.load(args.load_ckpt, trainer.state)
        print(f"resumed from {args.load_ckpt}: {extra}")

    print(
        f"training on {jax.devices()} | {len(train_ds)} sequences | "
        f"bs={args.batch_size} | {args.epochs} epochs"
    )
    trainer.fit(train_loader, valid_loader, epochs=args.epochs, seed=args.seed)


if __name__ == "__main__":
    main()
