"""Train ATISS on cached 3D-FRONT rooms (the upstream-ATISS workflow the
vendored reference only ships the library half of).

Data flows through the full reference-shaped encoding chain
(``data/threed_front_dataset.py``: cached rooms -> class-frequency ordering
-> [-1,1] scaling -> permutation -> autoregressive WOCM split), collated to
fixed ``max_boxes`` slots with a validity mask for TPU-static shapes; the
loss is the original ATISS objective — class cross-entropy + DMLL (or MSE
with ``--scalar_head``) on the split box
(``bbox_output.py:70-139`` reconstruction_loss lineage).

Usage:
  python -m lsdm_tpu.run.train_atiss_3dfront --dataset_directory <cache> \\
      --annotation_file splits.csv --train_stats stats.json \\
      --epochs 100 --save_dir out [--platform cpu]
"""

from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_directory", required=True)
    ap.add_argument("--annotation_file", required=True)
    ap.add_argument("--train_stats", default="dataset_stats.txt")
    ap.add_argument("--room_layout_size", default="64,64")
    ap.add_argument("--box_ordering", default=None,
                    choices=[None, "class_frequencies"])
    ap.add_argument("--max_boxes", type=int, default=12)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--steps_per_epoch", type=int, default=0,
                    help="0 = one pass over the split")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--n_layers", type=int, default=4)
    ap.add_argument("--n_heads", type=int, default=8)
    ap.add_argument("--dim_ff", type=int, default=1024)
    ap.add_argument("--n_mixtures", type=int, default=4)
    ap.add_argument("--scalar_head", action="store_true",
                    help="LSDM-fork scalar heads + MSE instead of DMLL")
    ap.add_argument("--feature_extractor", default="resnet18",
                    choices=["simple", "resnet18", "alexnet"])
    ap.add_argument("--save_dir", default="training_output")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from lsdm_tpu.data.threed_front_dataset import get_dataset_raw_and_encoded
    from lsdm_tpu.models.atiss import AutoregressiveTransformer, dmll
    from lsdm_tpu.train import checkpoint as ckpt_lib
    from lsdm_tpu.train.state import create_train_state
    from lsdm_tpu.utils.logger import KVLogger

    config = {
        "dataset_type": "cached_threedfront",
        "encoding_type": "cached_autoregressive_wocm",
        "dataset_directory": args.dataset_directory,
        "annotation_file": args.annotation_file,
        "train_stats": args.train_stats,
        "room_layout_size": args.room_layout_size,
        "box_ordering": args.box_ordering,
    }
    np.random.seed(args.seed)
    raw, enc = get_dataset_raw_and_encoded(config, split=["train", "val"])
    C = len(raw.class_labels)
    print(f"{len(enc)} rooms, {C} classes (incl. start/end)")

    model = AutoregressiveTransformer(
        n_classes=C, n_layers=args.n_layers, n_heads=args.n_heads,
        dim_ff=args.dim_ff, n_mixtures=args.n_mixtures,
        scalar_head=args.scalar_head,
        feature_extractor_name=args.feature_extractor)

    K = args.max_boxes

    def make_boxes(samples):
        """Reference collate -> fixed-K slots + valid_mask (TPU-static)."""
        batch = enc.collate_fn(samples)
        B, L = batch["class_labels"].shape[:2]
        out = {
            "class_labels": np.zeros((B, K, C), np.float32),
            "translations": np.zeros((B, K, 3), np.float32),
            "sizes": np.zeros((B, K, 3), np.float32),
            "angles": np.zeros((B, K, 1), np.float32),
            "valid_mask": np.zeros((B, K), np.float32),
        }
        n = min(L, K)
        for k in ("class_labels", "translations", "sizes", "angles"):
            out[k][:, :n] = batch[k][:, :n]
        for i, length in enumerate(batch["lengths"].astype(int)):
            out["valid_mask"][i, :min(length, K)] = 1.0
        out["room_layout"] = batch["room_layout"]
        for k in ("class_labels_tr", "translations_tr", "sizes_tr",
                  "angles_tr"):
            out[k] = batch[k]
        return {k: jnp.asarray(v) for k, v in out.items()}

    boxes0 = make_boxes([enc[i] for i in range(min(args.batch_size, len(enc)))])
    variables = model.init(jax.random.PRNGKey(args.seed), boxes0)
    tx = optax.adamw(args.lr, weight_decay=0.0)  # reference networks/__init__.py:49
    state = create_train_state(variables, tx)
    logger = KVLogger(os.path.join(args.save_dir, "logs"))

    @jax.jit
    def step(state, boxes):
        def loss_fn(params):
            vs = {"params": params}
            if state.batch_stats:
                vs["batch_stats"] = state.batch_stats
            out = model.apply(vs, boxes)
            cls_tr = boxes["class_labels_tr"][:, 0]
            ce = optax.softmax_cross_entropy(out.class_labels[:, 0],
                                             cls_tr).mean()
            props = [
                (out.translations_x, boxes["translations_tr"][..., 0:1]),
                (out.translations_y, boxes["translations_tr"][..., 1:2]),
                (out.translations_z, boxes["translations_tr"][..., 2:3]),
                (out.sizes_x, boxes["sizes_tr"][..., 0:1]),
                (out.sizes_y, boxes["sizes_tr"][..., 1:2]),
                (out.sizes_z, boxes["sizes_tr"][..., 2:3]),
                (out.angles, boxes["angles_tr"]),
            ]
            if args.scalar_head:
                reg = sum(jnp.mean((p[:, 0] - t[:, 0]) ** 2)
                          for p, t in props)
            else:
                reg = sum(dmll(p, t) for p, t in props)
            return ce + reg

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), loss

    os.makedirs(args.save_dir, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    steps = args.steps_per_epoch or max(len(enc) // args.batch_size, 1)
    best = float("inf")
    for epoch in range(args.epochs):
        total = 0.0
        for _ in range(steps):
            idxs = rng.randint(0, len(enc), size=args.batch_size)
            state, loss = step(state, make_boxes([enc[i] for i in idxs]))
            total += float(loss)
        mean = total / steps
        logger.log("train/loss", mean, step=epoch)
        print(f"epoch {epoch}: loss {mean:.4f}")
        if mean < best:
            best = mean
            ckpt_lib.save(os.path.join(args.save_dir, "best_model_3dfront.ckpt"),
                          state, extra={"epoch": epoch, "loss": mean})
    ckpt_lib.save(os.path.join(args.save_dir, "final_3dfront.ckpt"), state,
                  extra={"epoch": args.epochs - 1})


if __name__ == "__main__":
    main()
