"""Pose optimization for object placement — the TPU rewrite of
``place_obj_opt.py``.

The reference evaluates 36 rotations x 11 x 11 translations in a host loop
(4356 sequential loss evals, ``place_obj_opt.py:74-98``) and then runs 200
Adam steps one-by-one (``:142-169``).  Here:

  * :func:`grid_search` evaluates ALL candidate poses in one vmapped jitted
    call — a single batched (4356, N, 3) transform + loss reduction;
  * :func:`refine_pose` runs the 200-step Adam refinement as one
    ``lax.scan`` with best-so-far tracking in the carry, matching the
    reference losses exactly (contact: mean min-dist^2 x weight,
    ``place_obj_opt.py:10-15``; penetration: sum of sub-threshold squared
    SDF x class weight, ``:32-47``; Adam lr/weight_decay 1e-4, ``:139``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lsdm_tpu.ops.rotations import rotz


def contact_loss(
    contact_points: jax.Array, object_points: jax.Array, weight: float = 100.0
) -> jax.Array:
    """weight * mean over contact points of squared distance to the nearest
    object point (reference ``place_obj_opt.py:10-15``)."""
    d2 = (
        jnp.sum(contact_points**2, -1)[:, None]
        + jnp.sum(object_points**2, -1)[None, :]
        - 2.0
        * jnp.einsum(
            "nc,mc->nm", contact_points, object_points,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    )
    mins = jnp.min(jnp.maximum(d2, 0.0), axis=1)
    return weight * jnp.sum(mins) / contact_points.shape[0]


def compute_signed_distances(
    sdf: jax.Array, sdf_centroid: jax.Array, sdf_extents: jax.Array,
    query_points: jax.Array,
) -> jax.Array:
    """Trilinear SDF lookup with the fitting pipeline's normalization
    (reference ``place_obj_opt.py:18-29``): points normalized by
    ``(q - centroid) * 2 / extents.max()`` into [-1, 1], sampled with
    align_corners=True / border padding."""
    from jax.scipy.ndimage import map_coordinates

    D = sdf.shape[0]
    norm = (query_points - sdf_centroid) * 2.0 / jnp.max(sdf_extents)
    coords = (norm + 1.0) / 2.0 * (D - 1)
    coords = jnp.clip(coords, 0, D - 1)
    return map_coordinates(
        sdf, [coords[:, 0], coords[:, 1], coords[:, 2]], order=1, mode="nearest"
    )


def penetration_loss(
    sdf: jax.Array, sdf_centroid: jax.Array, sdf_extents: jax.Array,
    object_points: jax.Array, pen_thresh: float = 0.0, weight: float = 10.0,
) -> jax.Array:
    """weight * sum of squared signed distances below the threshold
    (reference ``place_obj_opt.py:32-47``)."""
    sd = compute_signed_distances(sdf, sdf_centroid, sdf_extents, object_points)
    neg = jnp.where(sd < pen_thresh, sd**2, 0.0)
    return weight * jnp.sum(neg)


class GridResult(NamedTuple):
    loss: jax.Array
    rot_deg: jax.Array
    transl_x: jax.Array
    transl_y: jax.Array
    points: jax.Array


@partial(jax.jit, static_argnames=("contact_weight",))
def _grid_search_jit(
    obj_points_centered: jax.Array,  # (N, 3), centered
    obj_center: jax.Array,  # (2,) original xy center
    transl_range: jax.Array,  # (4,) min_x, max_x, min_y, max_y
    contact_points: jax.Array,  # (C, 3)
    sdf: jax.Array, sdf_centroid: jax.Array, sdf_extents: jax.Array,
    pen_weight: jax.Array,
    pen_thresh: jax.Array,
    contact_weight: float = 100.0,
) -> GridResult:
    rot_degs = jnp.arange(0, 360, 10, dtype=jnp.float32)  # 36
    steps = jnp.arange(11, dtype=jnp.float32)
    min_x, max_x, min_y, max_y = transl_range
    xs = min_x + (max_x - min_x) / 10.0 * steps
    ys = min_y + (max_y - min_y) / 10.0 * steps

    # all (36, 11, 11) pose combinations, flattened
    R, X, Y = jnp.meshgrid(rot_degs, xs, ys, indexing="ij")
    poses = jnp.stack([R.ravel(), X.ravel(), Y.ravel()], axis=-1)  # (4356, 3)

    def eval_pose(pose):
        deg, x, y = pose[0], pose[1], pose[2]
        rot = rotz(jnp.deg2rad(deg))
        pts = obj_points_centered @ rot.T
        pts = pts.at[:, 0].add(obj_center[0] + x)
        pts = pts.at[:, 1].add(obj_center[1] + y)
        ct = contact_loss(contact_points, pts, contact_weight)
        pen = penetration_loss(
            sdf, sdf_centroid, sdf_extents, pts, pen_thresh, pen_weight
        )
        return ct + pen, pts

    losses, all_pts = jax.vmap(eval_pose)(poses)
    best = jnp.argmin(losses)
    return GridResult(
        loss=losses[best],
        rot_deg=poses[best, 0],
        transl_x=poses[best, 1],
        transl_y=poses[best, 2],
        points=all_pts[best],
    )


def grid_search(
    obj_points_centered: np.ndarray,
    obj_center_xy: np.ndarray,
    contact_points: np.ndarray,
    sdf: np.ndarray,
    sdf_centroid: np.ndarray,
    sdf_extents: np.ndarray,
    contact_weight: float = 100.0,
    pen_thresh: float = -0.05,
    pen_weight: float = 10.0,
) -> GridResult:
    """Exhaustive pose grid, one device program.

    Translation bounds follow the reference (``place_obj_opt.py:70-73``):
    slide the object's bbox across the contact cluster's bbox.
    """
    obj = jnp.asarray(obj_points_centered, jnp.float32)
    contact = jnp.asarray(contact_points, jnp.float32)
    obj_min = obj.min(0)
    obj_max = obj.max(0)
    c_min = contact.min(0)
    c_max = contact.max(0)
    transl_range = jnp.stack(
        [
            c_min[0] - obj_max[0], c_max[0] - obj_min[0],
            c_min[1] - obj_max[1], c_max[1] - obj_min[1],
        ]
    )
    return _grid_search_jit(
        obj, jnp.asarray(obj_center_xy, jnp.float32), transl_range, contact,
        jnp.asarray(sdf, jnp.float32), jnp.asarray(sdf_centroid, jnp.float32),
        jnp.asarray(sdf_extents, jnp.float32), jnp.asarray(pen_weight),
        jnp.asarray(pen_thresh), contact_weight,
    )


class RefineResult(NamedTuple):
    loss: jax.Array
    rot: jax.Array
    transl_x: jax.Array
    transl_y: jax.Array
    points: jax.Array


@partial(jax.jit, static_argnames=("contact_weight", "lr", "opt_steps"))
def _refine_jit(
    start_points: jax.Array,  # (N, 3) rotated by grid_rot, centered
    grid_center: jax.Array,  # (2,)
    contact_points: jax.Array,
    sdf: jax.Array, sdf_centroid: jax.Array, sdf_extents: jax.Array,
    pen_weight: jax.Array, pen_thresh: jax.Array,
    contact_weight: float = 100.0,
    lr: float = 0.003,
    opt_steps: int = 200,
) -> RefineResult:
    # torch Adam(weight_decay=1e-4): L2 added to the grad BEFORE the Adam
    # moments (coupled, unlike AdamW) — place_obj_opt.py:139.
    tx = optax.chain(
        optax.add_decayed_weights(1e-4),
        optax.scale_by_adam(),
        optax.scale(-lr),
    )
    params = {
        "rot": jnp.asarray([0.01], jnp.float32),
        "x": jnp.asarray([0.001], jnp.float32),
        "y": jnp.asarray([0.001], jnp.float32),
    }
    opt_state = tx.init(params)

    def apply_pose(p):
        rot = rotz(p["rot"][0])
        pts = start_points @ rot.T
        pts = pts.at[:, 0].add(grid_center[0] + p["x"][0])
        pts = pts.at[:, 1].add(grid_center[1] + p["y"][0])
        return pts

    def loss_fn(p):
        pts = apply_pose(p)
        ct = contact_loss(contact_points, pts, contact_weight)
        pen = penetration_loss(
            sdf, sdf_centroid, sdf_extents, pts, pen_thresh, pen_weight
        )
        return ct + pen, pts

    # initial (identity-pose) candidate, like the reference (:119-135)
    init_pts = start_points.at[:, 0].add(grid_center[0]).at[:, 1].add(grid_center[1])
    init_ct = contact_loss(contact_points, init_pts, contact_weight)
    init_pen = penetration_loss(
        sdf, sdf_centroid, sdf_extents, init_pts, pen_thresh, pen_weight
    )
    best0 = RefineResult(
        loss=init_ct + init_pen,
        rot=jnp.zeros(()), transl_x=jnp.zeros(()), transl_y=jnp.zeros(()),
        points=init_pts,
    )

    def body(carry, _):
        params, opt_state, best = carry
        (loss, pts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        improved = loss < best.loss
        best = RefineResult(
            loss=jnp.where(improved, loss, best.loss),
            rot=jnp.where(improved, params["rot"][0], best.rot),
            transl_x=jnp.where(improved, params["x"][0], best.transl_x),
            transl_y=jnp.where(improved, params["y"][0], best.transl_y),
            points=jnp.where(improved, pts, best.points),
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, best), None

    (_, _, best), _ = jax.lax.scan(
        body, (params, opt_state, best0), None, length=opt_steps
    )
    return best


def refine_pose(
    obj_points_centered: np.ndarray,
    grid_center_xy: np.ndarray,
    grid_rot_deg: float,
    contact_points: np.ndarray,
    sdf: np.ndarray, sdf_centroid: np.ndarray, sdf_extents: np.ndarray,
    contact_weight: float = 100.0,
    pen_thresh: float = 0.0,
    pen_weight: float = 1.0,
    lr: float = 0.003,
    opt_steps: int = 200,
) -> RefineResult:
    """Adam refinement of (theta, tx, ty) from the grid-search pose
    (reference ``optimization``, ``place_obj_opt.py:102-170``)."""
    rot = rotz(jnp.deg2rad(jnp.asarray(grid_rot_deg, jnp.float32)))
    start = jnp.asarray(obj_points_centered, jnp.float32) @ rot.T
    return _refine_jit(
        start, jnp.asarray(grid_center_xy, jnp.float32),
        jnp.asarray(contact_points, jnp.float32),
        jnp.asarray(sdf, jnp.float32), jnp.asarray(sdf_centroid, jnp.float32),
        jnp.asarray(sdf_extents, jnp.float32), jnp.asarray(pen_weight),
        jnp.asarray(pen_thresh), contact_weight, lr, opt_steps,
    )
