"""Farthest-point sampling as ONE Pallas kernel per scene.

Reference algorithm (``pointnet2_utils.py:60-81``): iteratively select
the point farthest from the already-selected set.  The XLA formulation
(:func:`lsdm_tpu.ops.pointcloud.farthest_point_sample`) is a
``lax.scan`` whose per-step body is four small HBM-roundtrip ops
(gather centroid, distance, min, argmax); here the whole selection runs
in-kernel with the running min-distance row resident in VMEM:

* the centroid "gather" is a masked reduction ``sum(xt * onehot, lanes)``
  — no random access;
* the per-step distance uses the same ``sum((x - c)^2)`` arithmetic as
  the scan version (NOT the |x|^2-2cx expansion), so selected indices
  are bit-identical;
* argmax is ``min(where(d == max(d), iota, N))`` — first-max semantics,
  exactly ``jnp.argmax``;
* selected indices accumulate into a VMEM row via one-hot writes and
  are stored once at the end.

Sequential by nature (npoint dependent steps) but all steps are VPU ops
on VMEM rows — the win is dropping the per-step XLA op dispatch and HBM
traffic of the scan body.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(start_ref, xt_ref, out_ref, *, npoint: int, n_points: int):
    xt = xt_ref[0]                                   # (3, N) f32
    # whole (B, 1) start column lives in SMEM (a (1, 1) block of a (B, 1)
    # array is an illegal Mosaic tiling for B > 1); index this scene's row
    start = start_ref[pl.program_id(0), 0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, n_points), 1)
    iota_out = jax.lax.broadcasted_iota(jnp.int32, (1, npoint), 1)

    def body(i, carry):
        dist, far, out = carry                       # (1,N) f32, (), (1,P)
        out = jnp.where(iota_out == i, far, out)
        oh = (iota == far).astype(jnp.float32)       # (1, N)
        c = jnp.sum(xt * oh, axis=1, keepdims=True)  # (3, 1) selected point
        d = jnp.sum((xt - c) ** 2, axis=0, keepdims=True)  # (1, N)
        dist = jnp.minimum(dist, d)
        m = jnp.max(dist, axis=1, keepdims=True)
        far = jnp.min(jnp.where(dist == m, iota, n_points))
        return dist, far, out

    dist0 = jnp.full((1, n_points), 1e10, jnp.float32)
    out0 = jnp.zeros((1, npoint), jnp.int32)
    _, _, out = jax.lax.fori_loop(
        0, npoint, body, (dist0, start, out0))
    out_ref[...] = out[None]


@partial(jax.jit, static_argnames=("npoint", "interpret"))
def farthest_point_sample_pallas(
    xyz: jax.Array,        # (B, N, 3) points
    npoint: int,
    start: jax.Array,      # (B,) int32 first selected index
    interpret: bool = False,
) -> jax.Array:
    """FPS indices (B, npoint), bit-identical to the scan formulation."""
    B, N, _ = xyz.shape
    xt = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # (B, 3, N)
    return pl.pallas_call(
        partial(_fps_kernel, npoint=npoint, n_points=N),
        out_shape=jax.ShapeDtypeStruct((B, 1, npoint), jnp.int32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, N), lambda b: (b, 0, 0)),
        ],
        # 3-D (B, 1, P) output: a (1, P) block of a (B, P) array is an
        # illegal Mosaic tiling for P < 128; (1, 1, P) == trailing dims
        out_specs=pl.BlockSpec((1, 1, npoint), lambda b: (b, 0, 0)),
        interpret=interpret,
    )(start.astype(jnp.int32).reshape(B, 1), xt)[:, 0]
