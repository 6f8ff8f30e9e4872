"""Fused ball-query + neighbourhood gather as ONE Pallas kernel, with a
custom VJP — the TRAIN-mode sibling of the eval-only fused SA stage.

Reference semantics (``pointnet2_utils.py:84-104`` selection +
``pointnet2_utils.py:41-57`` gather + the center-relative xyz of
``pointnet2_utils.py:158-199``), replicated by the composed path in
:class:`lsdm_tpu.models.pointnet2.PointNetSetAbstraction`:

    idx     = query_ball_point(radius, K, xyz, new_xyz)
    grouped = base[idx]                            # (B, S, K, C)
    out     = concat(grouped[..., :3] - new_xyz[:, :, None],
                     grouped[..., 3:])

Why one kernel (vs the promoted ``ball_impl="pallas"`` + one-hot-matmul
gather chain): each of the ball-query kernel's ``nsample`` min-pass
selection sweeps produces an equality mask that IS the one-hot gather
matrix for that slot (the trick the eval stage kernel proved,
ops/sa_fused_pallas.py) — so the separate forward gather einsum, its
one-hot reconstruction from the index tensor (a second K-sweep compare
over (S*K, N)), and the idx HBM round-trip all disappear.  The distance
matmul, selection, gather contraction, and center subtraction share one
VMEM-resident (BS, N) block.

Unlike the eval stage kernel this one stops BEFORE the MLP: training
BatchNorm needs cross-(B, S, K) batch statistics, and the MLP backward
belongs to XLA's autodiff.  The kernel emits exactly the composed path's
``new_points`` input (plus the index tensor for the backward), so
Conv/BN/ReLU/maxpool and their gradients are untouched.

Backward (custom VJP — pallas_call has no autodiff rule):

* grad_base: the one-hot segment-sum MXU contraction shared with
  ``index_points_mm`` (ops/pointcloud.py:onehot_segment_sum), driven by
  the saved index tensor.
* grad_new_xyz: ``-sum_K grad[..., :3]`` (the center-subtraction term).
* grad_xyz (the distance/selection operand): zero — integer selection is
  non-differentiable in every formulation; the composed paths reach xyz
  only through ``base``'s leading columns and ``new_xyz``, both of which
  this VJP covers.  Matches the stop_gradient semantics of
  ``ball_impl="pallas"`` exactly (pinned by tests/test_sg_fused.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _sg_kernel(q_ref, xt_ref, xx_ref, base_ref, out_ref, idx_ref, *,
               radius2: float, nsample: int, n_points: int, compute_dtype):
    q = q_ref[0]                                    # (BS, 3) f32
    # HIGHEST precision: the |q|^2+|x|^2-2qx expansion cancels
    # catastrophically under default bf16 passes (ops/pointcloud.py)
    d = -2.0 * jax.lax.dot_general(
        q, xt_ref[0],                               # (BS, 3) x (3, N)
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d = d + jnp.sum(q * q, axis=-1, keepdims=True)
    d = d + xx_ref[0]                               # (BS, N)

    BS = d.shape[0]
    cdt = compute_dtype
    base = base_ref[0]                              # (N, C) cdt
    qc = q.astype(cdt)                              # center, compute dtype
    # fp32 gather contractions need the HIGHEST (bf16x3) pass to stay
    # ~bit-exact; bf16 inputs are exact under the default pass (1.0 * v
    # accumulated in f32) — mirrors ops/pointcloud.py:_gather_mm
    gprec = (jax.lax.Precision.HIGHEST if cdt == jnp.float32
             else jax.lax.Precision.DEFAULT)

    iota = jax.lax.broadcasted_iota(jnp.int32, (BS, n_points), 1)
    cand = jnp.where(d <= radius2, iota, n_points)
    first = jnp.min(cand, axis=-1, keepdims=True)   # first in-radius index
    # fully-empty rows gather point N-1, exactly like the composed paths'
    # clip(idx, 0, N-1) of an all-N candidate row (cannot happen
    # in-model: every query center is itself one of the points; pinned by
    # tests/test_sg_fused.py::test_sg_forward_empty_balls_and_empty_slots).
    # One-hot masks are built as f32 VALUES, never as bool vectors:
    # selecting between i1 vectors lowers to an arith.trunci the real
    # libtpu AOT compiler rejects (CLAUDE.md kernel workflow; the lint in
    # tools/verify_mosaic.py pins the pattern).
    first_oh = jnp.where(first == n_points,
                         (iota == n_points - 1).astype(jnp.float32),
                         (cand == first).astype(jnp.float32))
    first_ix = jnp.clip(first, 0, n_points - 1)     # (BS, 1)
    cur = jnp.where(cand == first, n_points, cand)

    i_cols = []
    oh = first_oh
    ix = first_ix
    for k in range(nsample):
        if k > 0:
            nxt = jnp.min(cur, axis=-1, keepdims=True)
            # empty slots repeat the first in-radius index (reference
            # quirk, pointnet2_utils.py:101-103)
            oh = jnp.where(nxt == n_points, first_oh,
                           (cur == nxt).astype(jnp.float32))
            ix = jnp.where(nxt == n_points, first_ix, nxt)
            cur = jnp.where(cur == nxt, n_points, cur)
        g = jax.lax.dot_general(                    # == base[idx_k]
            oh.astype(cdt), base,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=gprec,
        ).astype(cdt)                               # (BS, C) exact gather
        # center-relative xyz columns, computed in the compute dtype —
        # identical arithmetic to the composed path's grouped - center
        g = jnp.concatenate([g[:, :3] - qc, g[:, 3:]], axis=-1)
        # K-major per-slot store: indexing the LEADING (non-tiled) dims
        # keeps every vector value 2-D.  Assembling (BS, K, C) in-kernel
        # via g[:, None, :] lowers to a rank-2 -> rank-3 unit-middle
        # vector.shape_cast that jax.export accepts but the real libtpu
        # AOT compiler rejects ("infer-vector-layout: unsupported shape
        # cast", .bench_logs/bt_sg.log) — the second export
        # false-negative class, linted by tools/verify_mosaic.py.
        out_ref[0, k] = g                           # (BS, C) slot k
        i_cols.append(ix)
    idx_ref[0] = jnp.concatenate(i_cols, axis=-1)   # (BS, K)


@partial(jax.jit,
         static_argnames=("radius", "nsample", "compute_dtype", "interpret"))
def _sg_call(radius, nsample, xyz, new_xyz, base, compute_dtype, interpret):
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    C = base.shape[-1]
    BS = 256 if S % 256 == 0 else S
    grid = (B, S // BS)
    cdt = jnp.dtype(compute_dtype)

    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)      # (B, 3, N)
    xx = jnp.sum(xyz.astype(jnp.float32) ** 2, -1)[:, None]  # (B, 1, N)

    # grouped comes back K-major — (B, K, S, C) — because the kernel
    # stores one (BS, C) slab per selection sweep (leading-dim indexing;
    # see the in-kernel comment on the rejected shape_cast).  The
    # transpose back to the composed path's (B, S, K, C) is one XLA
    # copy outside the kernel, fused into the consumer's layout.
    grouped, idx = pl.pallas_call(
        partial(_sg_kernel, radius2=float(radius) ** 2, nsample=nsample,
                n_points=N, compute_dtype=cdt),
        out_shape=(jax.ShapeDtypeStruct((B, nsample, S, C), cdt),
                   jax.ShapeDtypeStruct((B, S, nsample), jnp.int32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BS, 3), lambda b, s: (b, s, 0)),
            pl.BlockSpec((1, 3, N), lambda b, s: (b, 0, 0)),
            pl.BlockSpec((1, 1, N), lambda b, s: (b, 0, 0)),
            pl.BlockSpec((1, N, C), lambda b, s: (b, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, nsample, BS, C),
                                lambda b, s: (b, 0, s, 0)),
                   pl.BlockSpec((1, BS, nsample), lambda b, s: (b, s, 0))),
        interpret=interpret,
    )(new_xyz.astype(jnp.float32), xyz_t, xx, base.astype(cdt))
    return jnp.swapaxes(grouped, 1, 2), idx


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def select_gather_grouped(radius, nsample, compute_dtype, interpret,
                          xyz, new_xyz, base):
    """Fused ball query + gather + center-relative xyz -> (B, S, K, C).

    Drop-in producer of the SetAbstraction ``new_points`` tensor
    (``ball_impl="sg"``).  xyz (B, N, 3) are the source points (distance
    operand — receives zero gradient), new_xyz (B, S, 3) the query
    centers, base (B, N, C) the pre-concatenated [xyz, feats] columns in
    the compute dtype.  Static args lead (custom_vjp nondiff_argnums
    must be a prefix).  Caller contract (checked by the module):
    S % 8 == 0, features present."""
    grouped, _ = _sg_call(radius, nsample, xyz, new_xyz, base,
                          compute_dtype, interpret)
    return grouped


def _sg_fwd(radius, nsample, compute_dtype, interpret, xyz, new_xyz, base):
    grouped, idx = _sg_call(radius, nsample, xyz, new_xyz, base,
                            compute_dtype, interpret)
    # residuals: the index tensor plus the primal references (cheap —
    # they are live inputs; residual leaves must be JAX types, so the
    # shapes/dtypes the backward needs ride on the arrays themselves)
    return grouped, (idx, xyz, new_xyz, base)


def _sg_bwd(radius, nsample, compute_dtype, interpret, res, grad):
    from lsdm_tpu.ops.pointcloud import onehot_segment_sum

    idx, xyz, new_xyz, base = res
    N = xyz.shape[1]
    # the gather's VJP: one-hot segment-sum on the MXU (shared with
    # index_points_mm's backward — same math, same bf16-grade gradients)
    grad_base = onehot_segment_sum(idx, grad, N).astype(base.dtype)
    # the center subtraction's VJP
    grad_center = -jnp.sum(grad[..., :3].astype(jnp.float32), axis=2)
    return (jnp.zeros_like(xyz), grad_center.astype(new_xyz.dtype),
            grad_base)


select_gather_grouped.defvjp(_sg_fwd, _sg_bwd)
