"""Whole SetAbstraction stage as ONE Pallas kernel (eval mode).

Reference stage semantics (``pointnet2_utils.py:158-199``, replicated by
:class:`lsdm_tpu.models.pointnet2.PointNetSetAbstraction`): ball query ->
grouped gather -> center-relative xyz -> Conv/BN/ReLU chain -> maxpool
over the K neighbours.

Why fusing the *stage* (not just the ball query) is the right TPU shape:
the composed path materializes the grouped (B, S, K, C) tensor in HBM
(the backbone's dominant cost, PERF.md round-3 attribution: gather
12.7 ms + ball query 15.4 ms vs 5.6 ms of actual MLP at sa1 train
shapes).  In-kernel, for each query tile:

* distances to all N points are one MXU matmul, resident in VMEM;
* selection is ``nsample`` iterated row-min passes over
  ``where(in_radius, iota, N)`` (ops/ballquery_pallas.py) — and each
  pass's equality mask IS the one-hot gather matrix, so selection and
  gather fuse into one ``(BS, N) @ (N, F1)`` MXU contraction.  No index
  tensor, no random-access gather, no (S, K, C) HBM buffer — ever;
* layer 1 is hoisted to the N points: with eval-mode BatchNorm folded to
  a per-channel affine, ``block1(grouped - center)`` =
  ``relu(Z1[idx] - center @ W1[:3])`` where ``Z1 = base @ W1' + b1'`` is
  computed ONCE per point outside the kernel (N rows instead of S*K —
  32x fewer layer-1 FLOPs at sa1 shapes);
* layers 2..L and the K-maxpool run on the (BS, F) tile in VMEM.

Eval-only: training-mode BatchNorm needs cross-(B, S, K) batch statistics,
which breaks the per-tile fusion, and the selection masks carry no useful
gradients — the composed path (with its ``gather_bwd`` formulations)
remains the training path.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def fold_conv_bn(variables, eps: float = 1e-5) -> Tuple[jax.Array, jax.Array]:
    """Fold a ConvBNBlock's eval-mode BatchNorm into its Dense layer.

    ``relu(BN(x @ W + b))`` with running statistics is
    ``relu(x @ (W * s) + ((b - mean) * s + beta))`` where
    ``s = gamma / sqrt(var + eps)``.  Returns fp32 (W', b')."""
    p = variables["params"]
    st = variables["batch_stats"]
    w = p["conv"]["kernel"].astype(jnp.float32)   # (Cin, F)
    b = p["conv"]["bias"].astype(jnp.float32)     # (F,)
    gamma = p["bn"]["scale"].astype(jnp.float32)
    beta = p["bn"]["bias"].astype(jnp.float32)
    mean = st["bn"]["mean"].astype(jnp.float32)
    var = st["bn"]["var"].astype(jnp.float32)
    s = gamma * jax.lax.rsqrt(var + eps)
    return w * s, (b - mean) * s + beta


def _sa_kernel(q_ref, xt_ref, xx_ref, z1_ref, w1x_ref, *wb_refs,
               radius2: float, nsample: int, n_points: int,
               compute_dtype):
    out_ref = wb_refs[-1]
    layer_refs = wb_refs[:-1]  # (w2, b2, w3, b3, ...) for layers 2..L

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
    z1 = z1_ref[0].astype(cdt)                      # (N, F1)
    # layer-1 center correction: (g - c) @ W1' = g @ W1' - c @ W1'[:3]
    cterm = jax.lax.dot_general(
        q.astype(cdt), w1x_ref[...].astype(cdt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                               # (BS, F1) f32

    iota = jax.lax.broadcasted_iota(jnp.int32, (BS, n_points), 1)
    cand = jnp.where(d <= radius2, iota, n_points)
    first = jnp.min(cand, axis=-1, keepdims=True)   # first in-radius index
    # fully-empty rows gather point 0, like the clamped XLA paths (cannot
    # happen in-model: every query center is itself one of the points).
    # The one-hot masks are built as f32, never as bool vectors: selecting
    # between i1 vectors lowers to an arith.trunci i8->i1 that the real
    # libtpu AOT compiler rejects ("Unsupported target bitwidth for
    # truncation") even though the jax.export Mosaic pipeline accepts it.
    first_oh = jnp.where(first == n_points,
                         (iota == 0).astype(jnp.float32),
                         (cand == first).astype(jnp.float32))
    cur = jnp.where(cand == first, n_points, cand)

    acc = None
    oh = first_oh
    for k in range(nsample):
        if k > 0:
            nxt = jnp.min(cur, axis=-1, keepdims=True)
            # empty slots repeat the first in-radius index (reference
            # quirk, pointnet2_utils.py:101-103)
            oh = jnp.where(nxt == n_points, first_oh,
                           (cur == nxt).astype(jnp.float32))
            cur = jnp.where(cur == nxt, n_points, cur)
        g = jax.lax.dot_general(                    # == Z1[idx_k]
            oh.astype(cdt), z1,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                           # (BS, F1) f32
        h = jax.nn.relu(g - cterm).astype(cdt)
        for i in range(0, len(layer_refs), 2):
            w = layer_refs[i][...].astype(cdt)      # (Fi, Fo)
            b = layer_refs[i + 1][...]              # (1, Fo) f32
            h = jax.lax.dot_general(
                h, w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            h = jax.nn.relu(h + b).astype(cdt)
        acc = h if acc is None else jnp.maximum(acc, h)
    out_ref[0] = acc.astype(out_ref.dtype)


@partial(jax.jit,
         static_argnames=("radius", "nsample", "compute_dtype", "interpret"))
def sa_stage_fused(
    radius: float,
    nsample: int,
    xyz: jax.Array,       # (B, N, 3) points
    new_xyz: jax.Array,   # (B, S, 3) query centers (subset of xyz)
    base: jax.Array,      # (B, N, Cin) pre-concatenated [xyz, feats]
    folded: Sequence[Tuple[jax.Array, jax.Array]],  # BN-folded (W', b')
    compute_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    """Fused eval-mode SetAbstraction stage -> (B, S, F_last).

    ``folded`` is the per-block output of :func:`fold_conv_bn` in MLP
    order.  Caller contract (checked by the backbone): S % 8 == 0,
    eval mode, features present."""
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    BS = 256 if S % 256 == 0 else S
    grid = (B, S // BS)
    cdt = jnp.dtype(compute_dtype)

    (w1, b1) = folded[0]
    F1 = w1.shape[1]
    # layer 1 hoisted to the N points (N rows instead of S*K)
    z1 = jax.lax.dot_general(
        base.astype(cdt), w1.astype(cdt),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1                                          # (B, N, F1) f32
    w1x = w1[:3]                                    # (3, F1) xyz rows

    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)      # (B, 3, N)
    xx = jnp.sum(xyz.astype(jnp.float32) ** 2, -1)[:, None]  # (B, 1, N)

    rest = []
    in_specs = [
        pl.BlockSpec((1, BS, 3), lambda b, s: (b, s, 0)),   # q tile
        pl.BlockSpec((1, 3, N), lambda b, s: (b, 0, 0)),    # xyz^T
        pl.BlockSpec((1, 1, N), lambda b, s: (b, 0, 0)),    # |x|^2
        pl.BlockSpec((1, N, F1), lambda b, s: (b, 0, 0)),   # Z1
        pl.BlockSpec((3, F1), lambda b, s: (0, 0)),         # W1 xyz rows
    ]
    for (w, b) in folded[1:]:
        rest += [w.astype(jnp.float32), b.astype(jnp.float32)[None]]
        in_specs += [
            pl.BlockSpec(w.shape, lambda b, s: (0, 0)),
            pl.BlockSpec((1, b.shape[0]), lambda b, s: (0, 0)),
        ]
    F_out = folded[-1][0].shape[1]

    return pl.pallas_call(
        partial(_sa_kernel, radius2=float(radius) ** 2,
                nsample=min(nsample, N), n_points=N, compute_dtype=cdt),
        out_shape=jax.ShapeDtypeStruct((B, S, F_out), cdt),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, BS, F_out), lambda b, s: (b, s, 0)),
        interpret=interpret,
    )(new_xyz.astype(jnp.float32), xyz_t, xx, z1, w1x, *rest)
