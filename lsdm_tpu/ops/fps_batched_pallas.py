"""Batch-parallel farthest-point sampling: ONE kernel for all clouds.

The per-scene kernel (:mod:`lsdm_tpu.ops.fps_pallas`) is correct but its
``grid=(B,)`` cells execute SEQUENTIALLY on the TensorCore, so a train
step pays ``B * npoint`` dependent iterations of tiny (1, N) VPU ops —
the round-5 ablation (PERF.md bt_abl_fps_r5b) measured FPS at ~7.4 ms of
the 43.4 ms step, ~0.4 us/iteration: loop-overhead-bound, not
compute-bound.  This kernel instead carries ALL clouds' state at once —
min-distance (B, N), current-farthest (B, 1), output (B, P), each a VMEM
resident — so one ``fori_loop`` of ``npoint`` iterations advances every
cloud in parallel on full (B, N) VPU tiles: ``npoint`` loop overheads
instead of ``B * npoint``.

Per-cloud arithmetic is IDENTICAL to the per-scene kernel and the scan
formulation (reference semantics ``pointnet2_utils.py:60-81``): the
centroid "gather" is a masked lane reduction, the distance is the same
``sum((x - c)^2)`` (not the |x|^2-2cx expansion), and argmax is
first-max ``min(where(d == max(d), iota, N))`` — selected indices are
bit-identical (pinned in tests/test_pointcloud_ops.py).

VMEM: x (3, B, N) + dist (B, N) f32 — 0.9 MB at the flagship (54, 1024).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _fps_batched_kernel(start_ref, x0_ref, x1_ref, x2_ref, out_ref, *,
                        npoint: int, n_points: int):
    x0 = x0_ref[...]                                  # (B, N) f32 coords
    x1 = x1_ref[...]
    x2 = x2_ref[...]
    B = x0.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, n_points), 1)
    iota_out = jax.lax.broadcasted_iota(jnp.int32, (1, npoint), 1)

    def body(i, carry):
        dist, far, out = carry                        # (B,N) f32, (B,1), (B,P)
        out = jnp.where(iota_out == i, far, out)
        oh = (iota == far).astype(jnp.float32)        # (B, N) one-hot rows
        # masked lane reduction = the selected point's coords, per cloud
        c0 = jnp.sum(x0 * oh, axis=1, keepdims=True)  # (B, 1)
        c1 = jnp.sum(x1 * oh, axis=1, keepdims=True)
        c2 = jnp.sum(x2 * oh, axis=1, keepdims=True)
        d = (x0 - c0) ** 2 + (x1 - c1) ** 2 + (x2 - c2) ** 2
        dist = jnp.minimum(dist, d)
        m = jnp.max(dist, axis=1, keepdims=True)
        far = jnp.min(jnp.where(dist == m, iota, n_points), axis=1,
                      keepdims=True)                  # first-max, per cloud
        return dist, far, out

    dist0 = jnp.full((B, n_points), 1e10, jnp.float32)
    out0 = jnp.zeros((B, npoint), jnp.int32)
    _, _, out = jax.lax.fori_loop(
        0, npoint, body, (dist0, start_ref[...], out0))
    out_ref[...] = out


@partial(jax.jit, static_argnames=("npoint", "interpret"))
def farthest_point_sample_batched(
    xyz: jax.Array,        # (B, N, 3) points
    npoint: int,
    start: jax.Array,      # (B,) int32 first selected index
    interpret: bool = False,
) -> jax.Array:
    """FPS indices (B, npoint), bit-identical to the scan formulation."""
    B, N, _ = xyz.shape
    x = xyz.astype(jnp.float32)
    # three whole (B, N) coordinate planes: full-array blocks (legal
    # tilings — block dims equal the array dims), VPU-friendly layout
    planes = [x[:, :, k] for k in range(3)]
    return pl.pallas_call(
        partial(_fps_batched_kernel, npoint=npoint, n_points=N),
        out_shape=jax.ShapeDtypeStruct((B, npoint), jnp.int32),
        interpret=interpret,
    )(start.astype(jnp.int32).reshape(B, 1), *planes)
