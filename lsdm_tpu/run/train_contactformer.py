"""Train the ContactFormer (the reference documents this workflow in its
usage strings, e.g. ``run/train_sdm.py:29`` / ``contact_former`` lineage,
but ships no trainer script; this provides it).

Loss: masked per-vertex contact cross-entropy + beta * VAE KL
(``posa/general_utils.py:7-29`` recon loss + the POSA VAE objective).
"""

from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_data_dir", required=True)
    ap.add_argument("--mesh_ds_dir", default="data/mesh_ds")
    ap.add_argument("--save_dir", default="training_output")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--steps_per_epoch", type=int, default=0,
                    help="0 = one pass over the dataset")
    ap.add_argument("--decoder_mode", type=int, default=1)
    ap.add_argument("--max_frame", type=int, default=256)
    ap.add_argument("--jump_step", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--kl_beta", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--fix_ori", action="store_true")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from lsdm_tpu.data.contact_dataset import ProxContactDataset
    from lsdm_tpu.data.mesh_assets import load_mesh_assets
    from lsdm_tpu.models.contactformer import ContactFormer
    from lsdm_tpu.ops.recon_metrics import compute_recon_loss
    from lsdm_tpu.train import checkpoint as ckpt_lib
    from lsdm_tpu.train.state import create_train_state
    from lsdm_tpu.utils.logger import KVLogger

    ds = ProxContactDataset(
        args.train_data_dir, fix_orientation=args.fix_ori,
        max_frame=args.max_frame, jump_step=args.jump_step, seed=args.seed,
    )
    V = ds[0][0].shape[1]  # vertex count from the data
    assets = load_mesh_assets(
        args.mesh_ds_dir, nv_override=(V, max(V // 4, 2), max(V // 16, 1))
    )
    if assets.synthetic:
        print(f"WARNING: mesh_ds assets not found; synthetic graph nv={assets.nv}")

    model = ContactFormer(
        spiral_indices=assets.spiral_indices,
        down_mats=assets.down_mats,
        seg_len=args.max_frame,
        decoder_mode=args.decoder_mode,
        vert_dims=assets.nv[0],
    )
    vc0, cs0, m0 = ds[0]
    variables = model.init(
        {"params": jax.random.PRNGKey(args.seed)},
        jnp.asarray(cs0), jnp.asarray(vc0), jnp.asarray(m0)[None],
        jax.random.PRNGKey(1),
    )
    tx = optax.adam(args.lr)
    state = create_train_state(variables, tx)
    logger = KVLogger(os.path.join(args.save_dir, "logs"))
    os.makedirs(args.save_dir, exist_ok=True)

    @jax.jit
    def step(state, cf, verts, mask, key):
        def loss_fn(params):
            out, mu, logvar = model.apply(
                {"params": params}, cf, verts, mask, key
            )
            gt = jnp.argmax(cf, -1)[None]  # (1, T, V)
            frame_mask = jnp.broadcast_to(mask[..., None], gt.shape)  # (1, T, V)
            recon, acc = compute_recon_loss(gt, out, mask=frame_mask)
            kl = -0.5 * jnp.mean(1 + logvar - mu**2 - jnp.exp(logvar))
            return recon + args.kl_beta * kl, (recon, acc, kl)

        (loss, (recon, acc, kl)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), loss, recon, acc

    key = jax.random.PRNGKey(args.seed)
    steps = args.steps_per_epoch or len(ds)
    best = float("inf")
    for epoch in range(args.epochs):
        tot, tot_acc = 0.0, 0.0
        for i in range(steps):
            vc, cs, m = ds[i]
            k = jax.random.fold_in(key, epoch * 100003 + i)
            state, loss, recon, acc = step(
                state, jnp.asarray(cs), jnp.asarray(vc), jnp.asarray(m)[None], k
            )
            tot += float(loss)
            tot_acc += float(acc)
        mean, mean_acc = tot / steps, tot_acc / steps
        logger.log("train/loss", mean, step=epoch)
        logger.log("train/recon_acc", mean_acc, step=epoch)
        print(f"epoch {epoch}: loss {mean:.4f} acc {mean_acc:.4f}")
        if mean < best:
            best = mean
            ckpt_lib.save(
                os.path.join(args.save_dir, "best_model_recon_acc.ckpt"), state,
                extra={"epoch": epoch, "loss": mean, "acc": mean_acc},
            )


if __name__ == "__main__":
    main()
