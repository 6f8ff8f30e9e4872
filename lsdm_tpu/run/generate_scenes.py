"""Generate full scenes autoregressively with a trained ATISS/MIME model.

Exposes the scene-generation APIs (``models/atiss.py:generate_boxes`` /
``complete_scene``) as a CLI, the capability the reference's vendored ATISS
provides through ``AutoregressiveTransformer.generate_boxes``
(``atiss/scene_synthesis/networks/autoregressive_transformer.py:209-227``;
the LSDM fork ships no generation runner — this completes the surface).

Outputs one ``scene_XXXX.npz`` per scene with ``class_labels (K, C)``,
``translations (K, 3)``, ``sizes (K, 3)``, ``angles (K, 1)``,
``valid_mask (K,)`` and ``count`` (generated boxes incl. the end symbol).

Usage:
  python -m lsdm_tpu.run.generate_scenes --load_model best_model_atiss.ckpt \
      --n_scenes 4 --max_boxes 12 --output_dir generated [--platform cpu]
"""

from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--load_model", required=True,
                    help=".ckpt (ours) or reference .pt")
    ap.add_argument("--kind", default="atiss",
                    choices=["atiss", "atiss_pe", "mime"])
    ap.add_argument("--datatype", default="proxd",
                    choices=["proxd", "humanise"])
    ap.add_argument("--n_scenes", type=int, default=4)
    ap.add_argument("--max_boxes", type=int, default=12)
    ap.add_argument("--room_mask", default=None,
                    help=".npy layout mask (1, 1, 64, 64); default all-ones "
                         "like the LSDM training path (run/train_atiss.py:68)")
    ap.add_argument("--complete_from", default=None,
                    help=".npz of partial boxes to autocomplete "
                         "(complete_scene instead of generate_boxes)")
    ap.add_argument("--output_dir", default="generated_scenes")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--feature_extractor", default="simple",
                    choices=["simple", "resnet18", "alexnet"])
    ap.add_argument("--no_freeze_bn", action="store_true")
    ap.add_argument("--torch_seq_axis_quirk", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from lsdm_tpu import config as cfg_lib
    from lsdm_tpu.models import atiss as A
    from lsdm_tpu.run._baseline_common import build_model
    from lsdm_tpu.train import checkpoint as ckpt_lib
    from lsdm_tpu.train.state import create_train_state, make_optimizer

    num_cats = cfg_lib.num_cats_for(args.datatype)
    model, input_dims = build_model(args.kind, num_cats, args)

    if args.room_mask:
        room = jnp.asarray(np.load(args.room_mask), jnp.float32)
        if room.ndim == 2:
            room = room[None, None]
    else:
        room = jnp.ones((1, 1, 64, 64))

    boxes0 = A._empty_boxes(1, 2, input_dims, model.contact)
    boxes0["room_layout"] = room
    boxes0.update({
        "class_labels_tr": jnp.ones((1, 1, input_dims)),
        "translations_tr": jnp.ones((1, 1, 3)),
        "sizes_tr": jnp.ones((1, 1, 3)),
        "angles_tr": jnp.ones((1, 1, 1)),
    })
    variables = model.init(jax.random.PRNGKey(0), boxes0)
    state = create_train_state(variables, make_optimizer())
    if args.load_model.endswith(".pt"):
        import torch

        ckpt = torch.load(args.load_model, map_location="cpu",
                          weights_only=False)
        sd = ckpt.get("model_state_dict", ckpt)
        params, batch_stats = ckpt_lib.convert_atiss_state_dict(
            {k: v.detach().cpu().numpy() for k, v in sd.items()})
        state = state.replace(params=params, batch_stats=batch_stats)
    else:
        state, _ = ckpt_lib.load(args.load_model, state)
    vs = {"params": state.params}
    if state.batch_stats:
        vs["batch_stats"] = state.batch_stats

    partial = None
    if args.complete_from:
        with np.load(args.complete_from) as d:
            partial = {
                k: jnp.asarray(d[k], jnp.float32)[None]
                for k in ("class_labels", "translations", "sizes", "angles")
            }

    os.makedirs(args.output_dir, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)
    for i in range(args.n_scenes):
        key, sub = jax.random.split(key)
        if partial is not None:
            boxes, count = A.complete_scene(model, vs, partial, room, sub,
                                            max_boxes=args.max_boxes)
        else:
            boxes, count = A.generate_boxes(model, vs, room, sub,
                                            max_boxes=args.max_boxes)
        out = os.path.join(args.output_dir, f"scene_{i:04d}.npz")
        np.savez(
            out,
            class_labels=np.asarray(boxes["class_labels"][0]),
            translations=np.asarray(boxes["translations"][0]),
            sizes=np.asarray(boxes["sizes"][0]),
            angles=np.asarray(boxes["angles"][0]),
            valid_mask=np.asarray(boxes["valid_mask"][0]),
            count=int(count),
        )
        print(f"{out}: {int(count)} boxes")


if __name__ == "__main__":
    main()
