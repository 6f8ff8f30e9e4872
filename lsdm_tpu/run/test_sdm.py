"""Evaluate the SceneDiffusionModel (reference ``run/test_sdm.py``).

Computes CFD (chamfer), exact EMD, F1@0.1, category top-1/top-3 accuracy
and writes ``results.txt``, ``predictions/<seq>.npy`` and
``guiding_points/<seq>.npy`` — byte-compatible with the reference's output
contract (``run/test_sdm.py:210-232``) so the downstream fitting pipeline
consumes them unchanged.

TPU speedups vs the reference protocol: batched sequences (the reference is
locked to bs=1) and the whole 1000-step DDPM loop as one compiled scan.
"""

from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser(description="Evaluate LSDM on TPU")
    ap.add_argument("data_dir")
    ap.add_argument("--load_model", default=None, help=".ckpt (ours) or .pt (torch)")
    ap.add_argument("--objs_data_dir", default=None)
    ap.add_argument("--output_dir", default="test_output")
    ap.add_argument("--datatype", default="proxd", choices=["proxd", "humanise"])
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--use_ddim", action="store_true")
    ap.add_argument("--timestep_respacing", default="")
    ap.add_argument("--diffusion_steps", type=int, default=1000)
    ap.add_argument("--text_encoder", default="auto",
                    choices=["auto", "CLIP", "BERT", "HASH"],
                    help="'auto' (default) = CLIP when a BPE merges source "
                         "exists (vendored asset / $LSDM_TPU_CLIP_BPE / HF "
                         "cache; see tools/vendor_clip_bpe.py), else HASH")
    ap.add_argument("--bpe_path", default=None)
    ap.add_argument("--clip_weights", default=None,
                    help="torch CLIP .pt/.bin to convert for the text tower "
                    "(OpenAI clip or HF CLIPTextModelWithProjection naming)")
    ap.add_argument("--platform", default=None, help="force a jax platform")
    ap.add_argument("--pcd_points", type=int, default=None,
                    help="override cloud size (e.g. tiny smoke runs)")
    ap.add_argument("--fused_step", nargs="?", const="step", default="auto",
                    choices=["auto", "step", "chain", "none"],
                    help="sample with the denoise tail Pallas-fused: 'step' "
                         "= one kernel per step, 'chain' = whole loop as "
                         "one kernel (ops/denoise_pallas.py); 'auto' "
                         "(default) = 'chain' on TPU, composed on CPU; "
                         "'none' = force the composed scan")
    ap.add_argument("--cond_chunk", type=int, default=None,
                    help="encode conditioning in batch chunks (memory cap, "
                         "models/sampling.py)")
    ap.add_argument("--ball_impl", default="auto",
                    choices=["auto", "topk", "topk_p", "topk2", "topk2c", "pallas", "fused", "sg", "scatter",
                             "binsearch"],
                    help="ball-query formulation (PERF.md round 3); all "
                         "choices produce identical indices")
    ap.add_argument("--gather_bwd", default="scatter",
                    choices=["scatter", "matmul", "matmul_fwd"],
                    help="grouping-gather formulation; 'scatter' (default) "
                         "is bit-exact, matmul_fwd trades bf16-grade gather "
                         "numerics for encode speed (PERF.md round 3)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from lsdm_tpu import config as cfg_lib
    from lsdm_tpu.data.dataset import DataLoader, Humanise, ProxDatasetTxt
    from lsdm_tpu.diffusion import make_schedule, spaced_schedule
    from lsdm_tpu.models.sdm import SceneDiffusionModel
    from lsdm_tpu.models.text import TextEncoder
    from lsdm_tpu.ops.metrics import emd as emd_fn, fscore, topk_accuracy
    from lsdm_tpu.ops.pointcloud import chamfer_distance
    from lsdm_tpu.train import checkpoint as ckpt_lib
    from lsdm_tpu.train.state import create_train_state, make_optimizer

    os.makedirs(args.output_dir, exist_ok=True)
    os.makedirs(os.path.join(args.output_dir, "predictions"), exist_ok=True)
    os.makedirs(os.path.join(args.output_dir, "guiding_points"), exist_ok=True)

    model_cfg = (
        cfg_lib.sdm_proxd() if args.datatype == "proxd" else cfg_lib.sdm_humanise()
    )
    import dataclasses

    if args.pcd_points:
        model_cfg = dataclasses.replace(
            model_cfg, pcd_points=args.pcd_points,
            vert_dims=min(model_cfg.vert_dims, args.pcd_points),
        )
    # round-4 default promotion: "auto" resolves to the fused eval path on
    # TPU (on-chip equivalence in PERF.md round 4), composed on CPU
    from lsdm_tpu.models.sampling import resolve_fast_path

    args.ball_impl, args.fused_step = resolve_fast_path(
        args.ball_impl, args.fused_step)
    model_cfg = dataclasses.replace(model_cfg, ball_impl=args.ball_impl,
                                    gather_bwd=args.gather_bwd)
    ds_cls = ProxDatasetTxt if args.datatype == "proxd" else Humanise
    objs_kw = {}
    if args.objs_data_dir:
        objs_kw["objs_data_dir"] = args.objs_data_dir
    ds = ds_cls(args.data_dir, max_cats=model_cfg.max_cats,
                pnt_size=model_cfg.pcd_points, **objs_kw)
    loader = DataLoader(ds, args.batch_size, shuffle=False)

    if args.timestep_respacing:
        schedule = spaced_schedule(
            "cosine", args.diffusion_steps, args.timestep_respacing
        )
    else:
        schedule = make_schedule("cosine", args.diffusion_steps)

    model = SceneDiffusionModel(model_cfg)
    clip_params = None
    if args.clip_weights:
        import torch as _torch

        _sd = _torch.load(args.clip_weights, map_location="cpu",
                          weights_only=False)
        _sd = _sd.get("state_dict", _sd)
        clip_params = ckpt_lib.convert_clip_text(
            {k: v.detach().cpu().numpy() for k, v in _sd.items()}
        )
        print(f"converted CLIP text tower: {args.clip_weights}")
    from lsdm_tpu.models.text import resolve_text_encoder

    args.text_encoder = resolve_text_encoder(args.text_encoder,
                                             args.bpe_path)
    text_encoder = TextEncoder(
        args.text_encoder, dim=model_cfg.clip_dim, bpe_path=args.bpe_path,
        params=clip_params,
        # evaluating a checkpoint with a mismatched tokenizer silently
        # produces wrong numbers: refuse instead (models/text.py)
        require_parity=bool(args.load_model)
        and args.text_encoder in ("CLIP", "BERT"),
    )
    if args.load_model and args.text_encoder == "HASH":
        print(
            "WARNING: evaluating a checkpoint with --text_encoder HASH; "
            "prompt embeddings will not match the reference CLIP tower. "
            "Use --text_encoder CLIP with --clip_weights (and a BPE merges "
            "source, auto-detected when available) for parity-grade numbers."
        )

    # --- load weights
    b0 = next(iter(loader))
    text0 = jnp.asarray(text_encoder.encode(b0.text))
    # init at batch 1 (params are batch-independent; a full-batch init
    # forward pays the whole conditioning-activation peak for nothing)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(b0.target_verts[:1]), jnp.asarray(b0.mask[:1]),
        jnp.zeros((1,), jnp.int32),
        jnp.asarray(b0.given_objs[:1]), jnp.asarray(b0.given_cats[:1]),
        text0[:1],
    )
    tx = make_optimizer()
    state = create_train_state(variables, tx)
    if args.load_model:
        if args.load_model.endswith(".pt"):
            params, batch_stats, extra = ckpt_lib.load_torch_checkpoint(
                args.load_model, max_cats=model_cfg.max_cats
            )
            state = state.replace(params=params, batch_stats=batch_stats or
                                  state.batch_stats)
            print(f"converted torch checkpoint: {args.load_model}")
        else:
            state, extra = ckpt_lib.load(args.load_model, state)
            print(f"loaded {args.load_model}: {extra}")

    from lsdm_tpu.models.sampling import sample_sdm

    @jax.jit
    def eval_batch(params, batch_stats, mask, objs, cats, text_emb, key):
        sample, last = sample_sdm(
            model, {"params": params, "batch_stats": batch_stats}, schedule,
            mask, objs, cats, text_emb, key,
            clip_denoised=False, use_ddim=args.use_ddim,
            timestep_map=schedule.timestep_map if args.timestep_respacing else None,
            cond_chunk=args.cond_chunk, fused_step=args.fused_step,
        )
        return sample, last.cat, last.guiding

    key = jax.random.PRNGKey(args.seed)
    chamfers, emds, f1s, accs, top3s = [], [], [], [], []
    lines = []
    for bi, batch in enumerate(loader):
        mask = jnp.asarray(batch.mask)
        objs = jnp.asarray(batch.given_objs)
        cats = jnp.asarray(batch.given_cats)
        target = jnp.asarray(batch.target_verts)
        text_emb = jnp.asarray(text_encoder.encode(batch.text))
        pred, cat_probs, guiding = eval_batch(
            state.params, state.batch_stats, mask, objs, cats, text_emb,
            jax.random.fold_in(key, bi),
        )
        nvalid = len(set(batch.seq_names))  # padded tail repeats the last seq
        for i, seq in enumerate(batch.seq_names[:nvalid]):
            p = pred[i : i + 1]
            tgt = target[i : i + 1]
            cfd = float(chamfer_distance(p, tgt))
            e = emd_fn(p, tgt)
            f1 = float(fscore(p[0], tgt[0], 0.1)[0])
            chamfers.append(cfd)
            emds.append(e)
            f1s.append(f1)
            tcat = jnp.argmax(jnp.asarray(batch.target_cat[i : i + 1]), axis=1)
            probs = cat_probs[i : i + 1, 0, :]
            (top1,) = topk_accuracy(probs, tcat, (1,))
            (top3,) = topk_accuracy(probs, tcat, (3,))
            accs.append(float(top1) / 100.0)
            top3s.append(float(top3) / 100.0)
            lines.append(f"Chamfer distance for seq {seq}: {cfd:.4f}")
            np.save(
                os.path.join(args.output_dir, "predictions", seq + ".npy"),
                np.asarray(pred[i], np.float32),
            )
            np.save(
                os.path.join(args.output_dir, "guiding_points", seq + ".npy"),
                np.asarray(guiding[i], np.float32),
            )
        print(f"batch {bi}: cfd={np.mean(chamfers):.4f}")

    with open(os.path.join(args.output_dir, "results.txt"), "w") as f:
        for line in lines:
            f.write(line + "\n")
        f.write(f"Final Chamfer distance: {np.mean(chamfers):.4f}\n")
        f.write(f"Final EMD: {np.mean(emds):.4f}\n")
        f.write(f"Final F1 score: {np.mean(f1s):.4f}\n")
        f.write(f"Category accuracy: {np.mean(accs):.4f}\n")
        f.write(f"Top 3 accuracy: {np.mean(top3s):.4f}\n")
    print(
        f"CFD {np.mean(chamfers):.4f} | EMD {np.mean(emds):.4f} | "
        f"F1 {np.mean(f1s):.4f} | acc {np.mean(accs):.4f} | top3 {np.mean(top3s):.4f}"
    )


if __name__ == "__main__":
    main()
