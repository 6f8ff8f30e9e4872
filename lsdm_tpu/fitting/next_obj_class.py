"""Next-object class + translation sampling inside a bbox
(reference ``get_next_obj_class.py:12-57``): rejection-sample the ATISS
DMLL translation distribution until the sample lands inside the target
bbox; classes from ``distribution_classes``.

Requires the DMLL-parameterized head (``scalar_head=False``); the LSDM
fork's scalar heads carry no distribution to sample (SURVEY.md §2.6 notes
the upstream script is broken for the same reason).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def sample_in_bbox(
    model,
    variables,
    boxes: Dict[str, jax.Array],
    bbox_min: np.ndarray,
    bbox_max: np.ndarray,
    key: jax.Array,
    max_tries: int = 100,
) -> Tuple[int, np.ndarray]:
    """Sample (class, translation) with translation rejected until inside
    the bbox.  Returns (class index, translation (3,))."""
    probs = np.asarray(
        model.apply(variables, boxes, method=model.distribution_classes)
    )[0, 0]
    probs = probs / probs.sum()
    k1, key = jax.random.split(key)
    cls = int(jax.random.choice(k1, len(probs), p=jnp.asarray(probs)))
    cls_onehot = jax.nn.one_hot(jnp.asarray([[cls]]), len(probs))

    F = model.apply(variables, boxes, method=model.encode)
    for i in range(max_tries):
        key, k = jax.random.split(key)
        tr = np.asarray(
            model.apply(
                variables, F, cls_onehot, k,
                method=lambda m, F, c, k: m.hidden2output.sample_translations(F, c, k),
            )
        )[0, 0]
        if (tr >= bbox_min).all() and (tr <= bbox_max).all():
            return cls, tr
    # fall back to bbox center after max_tries rejections
    return cls, (np.asarray(bbox_min) + np.asarray(bbox_max)) / 2
