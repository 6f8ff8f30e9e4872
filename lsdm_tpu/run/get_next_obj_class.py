"""Sample the next object class + translation inside a bbox
(reference ``get_next_obj_class.py``): ATISS class distribution +
DMLL-translation rejection sampling.

Requires an ATISS checkpoint trained with the DMLL heads
(``scalar_head=False``); the reference's own script is broken with the
scalar-head fork (SURVEY.md §2.6).
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--load_model", default=None, help="ATISS .ckpt (DMLL heads)")
    ap.add_argument("--num_classes", type=int, default=23)
    ap.add_argument("--bbox_min", type=float, nargs=3, default=[-1, -1, -1])
    ap.add_argument("--bbox_max", type=float, nargs=3, default=[1, 1, 1])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from lsdm_tpu.fitting.next_obj_class import sample_in_bbox
    from lsdm_tpu.models.atiss import AutoregressiveTransformer
    from lsdm_tpu.train import checkpoint as ckpt_lib
    from lsdm_tpu.train.state import create_train_state, make_optimizer

    C = args.num_classes
    model = AutoregressiveTransformer(n_classes=C, scalar_head=False)
    boxes = {
        "class_labels": jnp.zeros((1, 1, C)),
        "translations": jnp.zeros((1, 1, 3)),
        "sizes": jnp.zeros((1, 1, 3)),
        "angles": jnp.zeros((1, 1, 1)),
        "room_layout": jnp.ones((1, 1, 64, 64)),
        "class_labels_tr": jnp.zeros((1, 1, C)),
        "translations_tr": jnp.zeros((1, 1, 3)),
        "sizes_tr": jnp.zeros((1, 1, 3)),
        "angles_tr": jnp.zeros((1, 1, 1)),
    }
    variables = model.init(jax.random.PRNGKey(args.seed), boxes)
    if args.load_model:
        state = create_train_state(variables, make_optimizer())
        state, _ = ckpt_lib.load(args.load_model, state)
        variables = {"params": state.params}

    cls, tr = sample_in_bbox(
        model, variables, boxes,
        np.asarray(args.bbox_min), np.asarray(args.bbox_max),
        jax.random.PRNGKey(args.seed),
    )
    print(json.dumps({"class": int(cls), "translation": [float(x) for x in tr]}))


if __name__ == "__main__":
    main()
