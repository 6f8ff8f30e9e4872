"""Batch-sample SDM predictions for a dataset -> ``predictions/<seq>.npy``
(reference ``run/predict_contact.py`` — which ships with a syntax error at
``:75`` and is unrunnable upstream; this is the working equivalent: the
sampling loop of ``test_sdm`` without the metric computation)."""

from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data_dir")
    ap.add_argument("--load_model", default=None)
    ap.add_argument("--objs_data_dir", default=None)
    ap.add_argument("--output_dir", default="predict_output")
    ap.add_argument("--datatype", default="proxd", choices=["proxd", "humanise"])
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--diffusion_steps", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--text_encoder", default="auto",
                    choices=["auto", "CLIP", "BERT", "HASH"],
                    help="'auto' = CLIP when a BPE merges source exists "
                         "(tools/vendor_clip_bpe.py), else HASH")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from lsdm_tpu import config as cfg_lib
    from lsdm_tpu.data.dataset import DataLoader, Humanise, ProxDatasetTxt
    from lsdm_tpu.diffusion import make_schedule
    from lsdm_tpu.models.sdm import SceneDiffusionModel
    from lsdm_tpu.models.text import TextEncoder
    from lsdm_tpu.train import checkpoint as ckpt_lib
    from lsdm_tpu.train.state import create_train_state, make_optimizer

    model_cfg = (
        cfg_lib.sdm_proxd() if args.datatype == "proxd" else cfg_lib.sdm_humanise()
    )
    ds_cls = ProxDatasetTxt if args.datatype == "proxd" else Humanise
    kw = {"objs_data_dir": args.objs_data_dir} if args.objs_data_dir else {}
    ds = ds_cls(args.data_dir, max_cats=model_cfg.max_cats, **kw)
    loader = DataLoader(ds, args.batch_size, shuffle=False)
    schedule = make_schedule("cosine", args.diffusion_steps)
    model = SceneDiffusionModel(model_cfg)
    from lsdm_tpu.models.text import resolve_text_encoder

    args.text_encoder = resolve_text_encoder(args.text_encoder)
    text_encoder = TextEncoder(args.text_encoder, dim=model_cfg.clip_dim)

    b0 = next(iter(loader))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(b0.target_verts), jnp.asarray(b0.mask),
        jnp.zeros((b0.mask.shape[0],), jnp.int32), jnp.asarray(b0.given_objs),
        jnp.asarray(b0.given_cats), jnp.asarray(text_encoder.encode(b0.text)),
    )
    state = create_train_state(variables, make_optimizer())
    if args.load_model:
        state, _ = ckpt_lib.load(args.load_model, state)

    from lsdm_tpu.models.sampling import sample_sdm

    @jax.jit
    def sample(params, batch_stats, mask, objs, cats, text_emb, key):
        return sample_sdm(
            model, {"params": params, "batch_stats": batch_stats}, schedule,
            mask, objs, cats, text_emb, key, clip_denoised=False,
        )

    os.makedirs(os.path.join(args.output_dir, "predictions"), exist_ok=True)
    key = jax.random.PRNGKey(args.seed)
    for bi, batch in enumerate(loader):
        pred, _ = sample(
            state.params, state.batch_stats, jnp.asarray(batch.mask),
            jnp.asarray(batch.given_objs), jnp.asarray(batch.given_cats),
            jnp.asarray(text_encoder.encode(batch.text)),
            jax.random.fold_in(key, bi),
        )
        nvalid = len(set(batch.seq_names))
        for i, seq in enumerate(batch.seq_names[:nvalid]):
            np.save(os.path.join(args.output_dir, "predictions", seq + ".npy"),
                    np.asarray(pred[i], np.float32))
        print(f"batch {bi}: wrote {nvalid} predictions")


if __name__ == "__main__":
    main()
