"""Whole FeaturePropagation stage as ONE Pallas kernel (eval mode).

Reference stage semantics (``pointnet2_utils.py:262-312``, replicated by
:class:`lsdm_tpu.models.pointnet2.PointNetFeaturePropagation`): 3-NN of
each target in the coarse source set -> inverse-distance-weighted feature
interpolation -> concat with the target level's own features ->
Conv/BN/ReLU chain.

Same fusion argument as :mod:`lsdm_tpu.ops.sa_fused_pallas`: the 3-NN
selection's per-pass equality masks, SCALED by the normalized
inverse-distance weights, sum to one (BS, S) combination matrix W with
``W @ points2 == sum_k w_k * points2[idx_k]`` — interpolation becomes one
MXU contraction, the (B, N, 3, C) gathered buffer never exists, and the
eval-mode MLP (BatchNorm folded, :func:`sa_fused_pallas.fold_conv_bn`)
runs on the VMEM-resident tile.  Layers may carry ``act="none"`` so a
trailing Linear (e.g. the backbone head) can ride the same kernel.

Eval-only, like the SA fusion: training BatchNorm needs cross-batch
statistics and the selection masks carry no useful gradients.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _fp_kernel(q_ref, xt_ref, xx_ref, p2_ref, *rest,
               k: int, n_src: int, eps: float, has_p1: bool,
               acts: Tuple[str, ...], compute_dtype):
    if has_p1:
        p1_ref, *wb_refs = rest
    else:
        p1_ref, wb_refs = None, list(rest)
    out_ref = wb_refs[-1]
    layer_refs = wb_refs[:-1]

    q = q_ref[0]                                    # (BS, 3) f32
    # HIGHEST precision: the |q|^2+|x|^2-2qx expansion cancels
    # catastrophically under default bf16 passes (ops/pointcloud.py)
    d = -2.0 * jax.lax.dot_general(
        q, xt_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d = d + jnp.sum(q * q, axis=-1, keepdims=True)
    d = d + xx_ref[0]                               # (BS, S)

    BS = d.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (BS, n_src), 1)
    cur = d
    recips, masks = [], []
    for _ in range(k):
        m = jnp.min(cur, axis=-1, keepdims=True)
        # ties resolve to the lowest index, exactly lax.top_k(-d)
        sel = jnp.min(jnp.where(cur == m, iota, n_src), axis=-1,
                      keepdims=True)
        recips.append(1.0 / (m + eps))
        masks.append(iota == sel)
        # mask by POSITION (distances can tie across positions)
        cur = jnp.where(iota == sel, jnp.inf, cur)
    norm = sum(recips)
    w = sum((r / norm) * mk for r, mk in zip(recips, masks))  # (BS, S) f32

    cdt = compute_dtype
    h = jax.lax.dot_general(                        # == sum_k w_k*p2[idx_k]
        w.astype(cdt), p2_ref[0].astype(cdt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cdt)                                   # (BS, D2)
    if has_p1:
        h = jnp.concatenate([p1_ref[0].astype(cdt), h], axis=-1)
    for i in range(0, len(layer_refs), 2):
        wgt = layer_refs[i][...].astype(cdt)        # (Fi, Fo)
        b = layer_refs[i + 1][...]                  # (1, Fo) f32
        h = jax.lax.dot_general(
            h, wgt,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b
        if acts[i // 2] == "relu":
            h = jax.nn.relu(h)
        h = h.astype(cdt)
    out_ref[0] = h.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("acts", "compute_dtype", "interpret"))
def fp_stage_fused(
    xyz1: jax.Array,              # (B, N, 3) target positions
    xyz2: jax.Array,              # (B, S, 3) source positions
    points1: Optional[jax.Array],  # (B, N, D1) or None
    points2: jax.Array,           # (B, S, D2) source features
    folded: Sequence[Tuple[jax.Array, jax.Array]],  # BN-folded (W', b')
    acts: Tuple[str, ...] = None,
    compute_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    """Fused eval-mode FeaturePropagation stage -> (B, N, F_last).

    ``acts`` gives each layer's activation ("relu"/"none"), default all
    relu (ConvBNBlock chains).  Caller contract (checked by the module):
    N % 8 == 0, S > 1, eval mode."""
    B, N, _ = xyz1.shape
    S = xyz2.shape[1]
    k = min(3, S)
    BS = 256 if N % 256 == 0 else N
    grid = (B, N // BS)
    cdt = jnp.dtype(compute_dtype)
    if acts is None:
        acts = ("relu",) * len(folded)

    xyz2_t = jnp.swapaxes(xyz2.astype(jnp.float32), 1, 2)     # (B, 3, S)
    xx = jnp.sum(xyz2.astype(jnp.float32) ** 2, -1)[:, None]  # (B, 1, S)

    D2 = points2.shape[-1]
    in_specs = [
        pl.BlockSpec((1, BS, 3), lambda b, s: (b, s, 0)),   # q tile
        pl.BlockSpec((1, 3, S), lambda b, s: (b, 0, 0)),    # xyz2^T
        pl.BlockSpec((1, 1, S), lambda b, s: (b, 0, 0)),    # |x2|^2
        pl.BlockSpec((1, S, D2), lambda b, s: (b, 0, 0)),   # points2
    ]
    args = [xyz1.astype(jnp.float32), xyz2_t, xx, points2]
    if points1 is not None:
        in_specs.append(
            pl.BlockSpec((1, BS, points1.shape[-1]), lambda b, s: (b, s, 0)))
        args.append(points1)
    for (w, b) in folded:
        args += [w.astype(jnp.float32), b.astype(jnp.float32)[None]]
        in_specs += [
            pl.BlockSpec(w.shape, lambda b, s: (0, 0)),
            pl.BlockSpec((1, b.shape[0]), lambda b, s: (0, 0)),
        ]
    F_out = folded[-1][0].shape[1]

    return pl.pallas_call(
        partial(_fp_kernel, k=k, n_src=S, eps=1e-8,
                has_p1=points1 is not None, acts=tuple(acts),
                compute_dtype=cdt),
        out_shape=jax.ShapeDtypeStruct((B, N, F_out), cdt),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, BS, F_out), lambda b, s: (b, s, 0)),
        interpret=interpret,
    )(*args)
