"""Point-to-point ICP with random restarts, fully on device.

Replaces open3d ``registration_icp`` in the editing/collision pipelines
(reference ``run/scene_edit.py:100-136``, ``custom_collision.py:10-35``).
The reference launches up to 1000 sequential host ICPs with random inits;
here the restarts are a single ``vmap`` over initial poses and each ICP is
a fixed-length ``lax.scan`` of (nearest-neighbour correspondences ->
thresholded Kabsch update) — one device program for the entire search.

Returns the same registration statistics open3d exposes: ``fitness``
(inlier fraction of source points), ``inlier_rmse`` and the correspondence
count.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lsdm_tpu.ops.pointcloud import square_distance
from lsdm_tpu.ops.rotations import quaternion_to_matrix


class ICPResult(NamedTuple):
    transformation: jax.Array  # (4, 4)
    fitness: jax.Array  # inlier fraction
    inlier_rmse: jax.Array
    n_correspondences: jax.Array


def _kabsch(src: jax.Array, dst: jax.Array, w: jax.Array):
    """Weighted rigid alignment src -> dst (Kabsch/Umeyama)."""
    wsum = jnp.maximum(w.sum(), 1e-8)
    mu_s = (src * w[:, None]).sum(0) / wsum
    mu_d = (dst * w[:, None]).sum(0) / wsum
    H = ((src - mu_s) * w[:, None]).T @ (dst - mu_d)
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0]) * jnp.asarray([1.0, 1.0, d]))
    R = Vt.T @ D @ U.T
    t = mu_d - R @ mu_s
    return R, t


@partial(jax.jit, static_argnames=("iters",))
def icp(
    source: jax.Array,  # (N, 3)
    target: jax.Array,  # (M, 3)
    init: jax.Array,  # (4, 4)
    threshold: float = 0.2,
    iters: int = 30,
) -> ICPResult:
    """Fixed-iteration point-to-point ICP from a given initial pose."""
    src0 = source @ init[:3, :3].T + init[:3, 3]

    def body(carry, _):
        src, R_acc, t_acc = carry
        d2 = square_distance(src[None], target[None])[0]  # (N, M)
        nn = jnp.argmin(d2, axis=1)
        nn_d2 = jnp.min(d2, axis=1)
        w = (nn_d2 <= threshold**2).astype(jnp.float32)
        R, t = _kabsch(src, target[nn], w)
        src = src @ R.T + t
        return (src, R @ R_acc, R @ t_acc + t), None

    (src, R_acc, t_acc), _ = jax.lax.scan(
        body, (src0, init[:3, :3], init[:3, 3]), None, length=iters
    )
    d2 = square_distance(src[None], target[None])[0]
    # the |x|^2+|y|^2-2xy expansion can go slightly negative at ~0 distance
    nn_d2 = jnp.maximum(jnp.min(d2, axis=1), 0.0)
    inlier = nn_d2 <= threshold**2
    n_corr = inlier.sum()
    fitness = n_corr / source.shape[0]
    rmse = jnp.sqrt(
        jnp.where(n_corr > 0, (nn_d2 * inlier).sum() / jnp.maximum(n_corr, 1), 0.0)
    )
    T = jnp.eye(4).at[:3, :3].set(R_acc).at[:3, 3].set(t_acc)
    return ICPResult(T, fitness, rmse, n_corr)


@partial(jax.jit, static_argnames=("n_tries", "iters"))
def random_restart_icp(
    source: jax.Array,
    target: jax.Array,
    key: jax.Array,
    n_tries: int = 64,
    threshold: float = 0.2,
    iters: int = 30,
) -> ICPResult:
    """vmapped multi-start ICP; keeps the result with the most
    correspondences (reference criterion, ``scene_edit.py:127-130``).

    Initial poses: centroid-aligning translation + uniformly random
    rotations (the reference seeds with random *linear* 4x4 matrices —
    random rotations cover the same search space without shearing)."""
    vec = target.mean(0) - source.mean(0)
    q = jax.random.normal(key, (n_tries, 4))
    Rs = quaternion_to_matrix(q)
    inits = (
        jnp.broadcast_to(jnp.eye(4), (n_tries, 4, 4))
        .at[:, :3, :3].set(Rs)
        .at[:, :3, 3].set(vec)
    )
    # identity-rotation init first, like the mean-shift the reference applies
    inits = inits.at[0, :3, :3].set(jnp.eye(3))

    results = jax.vmap(lambda T: icp(source, target, T, threshold, iters))(inits)
    best = jnp.argmax(results.n_correspondences)
    return ICPResult(
        results.transformation[best],
        results.fitness[best],
        results.inlier_rmse[best],
        results.n_correspondences[best],
    )


def transform_points(points: jax.Array, T: jax.Array) -> jax.Array:
    return points @ T[:3, :3].T + T[:3, 3]
