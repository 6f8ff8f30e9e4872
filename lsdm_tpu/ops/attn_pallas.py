"""Rank-1-head multihead attention as Pallas kernels (eval + train).

The SDM's ``pcd_attention`` (reference ``model/sdm.py:95,195``) is
torch MHA with embed_dim == num_heads == 12, i.e. head_dim = 1, over
L = S = 1024-token sequences per object.  The XLA formulation
(``ops/attention.py:50-70``) materializes the (B·O, H, L, S) logits and
softmax-weights tensors — 2 x 432 MB of HBM traffic per batch-1 encode
(and 3.5 GB at batch 8), for what is arithmetically a rank-1 outer
product per head.

Here each (scene, query-tile) program keeps everything in VMEM: per
head, logits are ``q_h (BL,1) * k_h (1,S)`` (one VPU broadcast), the
f32 softmax follows, and the value contraction is a (BL, S) x (S, 1)
reduction.  The (L, S) plane never exists outside VMEM.

``rank1_mha_pallas`` is the eval kernel (no VJP).  ``rank1_mha_train``
wraps the same forward in a ``custom_vjp`` whose backward is a second
Pallas kernel: it *recomputes* the per-head softmax in VMEM
(flash-attention style — the row statistics are cheap rank-1 work) and
streams dq/dk/dv out, so training also never materializes the (L, S)
plane in HBM.  The only saved residuals are (q, k, v, out); the
softmax-grad row term uses the identity D_i = g_i * out_i available
from the saved forward output (head_dim = 1 makes it elementwise).

Numerics mirror ``multihead_attention``: scale = 1/sqrt(1) = 1, f32
logits and softmax, value contraction in ``compute_dtype`` with f32
accumulation.  The backward recomputes the softmax in f32 and then
rounds the weights (and values) to ``compute_dtype`` before every
contraction, so it differentiates the SAME w_c·v_c product the forward
evaluated — in particular D_i = g_i·out_i is exact and dv = w_cᵀg is
the exact linear-term VJP (advisor r4 finding).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(q_ref, k_ref, v_ref, out_ref, *, n_heads: int, compute_dtype):
    q = q_ref[0].astype(jnp.float32)               # (BL, H)
    k = k_ref[0].astype(jnp.float32)               # (S, H)
    v = v_ref[0].astype(compute_dtype)             # (S, H)
    cols = []
    for h in range(n_heads):
        logits = q[:, h:h + 1] * k[:, h][None]     # (BL, S) rank-1
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        w = e / jnp.sum(e, axis=-1, keepdims=True)
        cols.append(jnp.sum(w.astype(compute_dtype).astype(jnp.float32)
                            * v[:, h].astype(jnp.float32)[None], axis=-1,
                            keepdims=True))        # (BL, 1)
    out_ref[0] = jnp.concatenate(cols, axis=-1).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("compute_dtype", "interpret"))
def rank1_mha_pallas(
    q: jax.Array,  # (B, L, H) projected queries, one scalar per head
    k: jax.Array,  # (B, S, H) projected keys
    v: jax.Array,  # (B, S, H) projected values
    compute_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    """softmax_s(q_h ⊗ k_h) @ v_h per head -> (B, L, H), no HBM logits."""
    B, L, H = q.shape
    S = k.shape[1]
    BL = 256 if L % 256 == 0 else L
    return pl.pallas_call(
        partial(_kernel, n_heads=H, compute_dtype=jnp.dtype(compute_dtype)),
        out_shape=jax.ShapeDtypeStruct((B, L, H), jnp.float32),
        grid=(B, L // BL),
        in_specs=[
            pl.BlockSpec((1, BL, H), lambda b, l: (b, l, 0)),
            pl.BlockSpec((1, S, H), lambda b, l: (b, 0, 0)),
            pl.BlockSpec((1, S, H), lambda b, l: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BL, H), lambda b, l: (b, l, 0)),
        interpret=interpret,
    )(q.astype(jnp.float32), k.astype(jnp.float32), v)


def _bwd_kernel(q_ref, k_ref, v_ref, out_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, n_heads: int, compute_dtype):
    """Per-(scene, query-tile) backward: recompute each head's (BL, S)
    softmax plane in VMEM and contract it against the cotangent.  dq
    leaves per query tile; dk/dv ACCUMULATE across the query-tile grid
    axis into a revisited per-scene block (the tile axis is innermost,
    so the block stays resident).  The (L, S) plane never reaches HBM,
    and peak VMEM is ~3 (BL, S) f32 planes (~3 MB at BL=256, S=1024)
    instead of the full-L ~12 MB that would crowd the ~16 MB core."""
    lt = pl.program_id(1)

    @pl.when(lt == 0)
    def _init():
        dk_ref[...] = jnp.zeros(dk_ref.shape, dk_ref.dtype)
        dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)

    q = q_ref[0].astype(jnp.float32)               # (BL, H)
    k = k_ref[0].astype(jnp.float32)               # (S, H)
    # Match the forward's value rounding (v enters linearly, so using the
    # rounded v_c makes dw = g·v_c exact, not approximate).
    v = v_ref[0].astype(compute_dtype).astype(jnp.float32)  # (S, H)
    out = out_ref[0].astype(jnp.float32)           # (BL, H)
    g = g_ref[0].astype(jnp.float32)               # (BL, H) cotangent
    dq_cols = []
    for h in range(n_heads):
        logits = q[:, h:h + 1] * k[:, h][None]     # (BL, S) rank-1
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        w = e / jnp.sum(e, axis=-1, keepdims=True)  # (BL, S)
        # Round the recomputed weights to the forward's compute dtype so
        # every contraction below sees the SAME w_c the forward used:
        # D_i = g_i·out_i is then exactly Σ_j w_c g v_c, and dv = w_cᵀ g
        # is the exact linear-term VJP.  (Advisor r4: without this the
        # D-term used rounded w via `out` while the w·(g·v − D) term used
        # full-f32 w — an inconsistent mix beyond ordinary rounding.)
        w = w.astype(compute_dtype).astype(jnp.float32)
        # softmax-grad row term: D_i = sum_j w_ij g_i v_j = g_i * out_i
        d_row = (g[:, h] * out[:, h])[:, None]      # (BL, 1)
        dlog = w * (g[:, h:h + 1] * v[:, h][None] - d_row)  # (BL, S)
        dq_cols.append(jnp.sum(dlog * k[:, h][None], axis=-1,
                               keepdims=True))      # (BL, 1)
        # dk/dv rows leave K(head)-major via leading-dim-indexed 2-D
        # stores — transposed back outside the kernel.  In-kernel (1, S)
        # -> (S, 1) transposes are the Mosaic-rejected tiled-shape-cast
        # class (lint_tiled_shape_casts, .bench_logs/bt_sg.log).
        dk_ref[0, h] = dk_ref[0, h] + jnp.sum(
            dlog * q[:, h:h + 1], axis=0, keepdims=True)  # (1, S)
        dv_ref[0, h] = dv_ref[0, h] + jnp.sum(
            w * g[:, h:h + 1], axis=0, keepdims=True)     # (1, S)
    dq_ref[0] = jnp.concatenate(dq_cols, axis=-1).astype(dq_ref.dtype)


@partial(jax.jit, static_argnames=("compute_dtype", "interpret"))
def _rank1_mha_bwd_pallas(q, k, v, out, g, compute_dtype=jnp.float32,
                          interpret: bool = False):
    B, L, H = q.shape
    S = k.shape[1]
    BL = 256 if L % 256 == 0 else L
    qtile = lambda b, l: (b, l, 0)
    full3 = lambda b, l: (b, 0, 0)
    acc4 = lambda b, l: (b, 0, 0, 0)  # revisited across the l axis
    dq, dk_hm, dv_hm = pl.pallas_call(
        partial(_bwd_kernel, n_heads=H,
                compute_dtype=jnp.dtype(compute_dtype)),
        out_shape=(
            jax.ShapeDtypeStruct((B, L, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H, 1, S), jnp.float32),
            jax.ShapeDtypeStruct((B, H, 1, S), jnp.float32),
        ),
        grid=(B, L // BL),  # l innermost: dk/dv blocks stay resident
        in_specs=[
            pl.BlockSpec((1, BL, H), qtile),
            pl.BlockSpec((1, S, H), full3),
            pl.BlockSpec((1, S, H), full3),
            pl.BlockSpec((1, BL, H), qtile),
            pl.BlockSpec((1, BL, H), qtile),
        ],
        out_specs=(
            pl.BlockSpec((1, BL, H), qtile),
            pl.BlockSpec((1, H, 1, S), acc4),
            pl.BlockSpec((1, H, 1, S), acc4),
        ),
        interpret=interpret,
    )(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
      out.astype(jnp.float32), g.astype(jnp.float32))
    dk = jnp.transpose(dk_hm[:, :, 0, :], (0, 2, 1))  # (B, S, H)
    dv = jnp.transpose(dv_hm[:, :, 0, :], (0, 2, 1))
    return dq, dk, dv


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def rank1_mha_train(q, k, v, compute_dtype=jnp.float32,
                    interpret: bool = False):
    """Differentiable fused rank-1 MHA: same forward as
    ``rank1_mha_pallas``; the VJP recomputes the softmax in a second
    Pallas kernel (no (L, S) plane in HBM either direction)."""
    return rank1_mha_pallas(q, k, v, compute_dtype=compute_dtype,
                            interpret=interpret)


def _train_fwd(q, k, v, compute_dtype, interpret):
    out = rank1_mha_pallas(q, k, v, compute_dtype=compute_dtype,
                           interpret=interpret)
    return out, (q, k, v, out)


def _train_bwd(compute_dtype, interpret, res, g):
    q, k, v, out = res
    dq, dk, dv = _rank1_mha_bwd_pallas(q, k, v, out, g,
                                       compute_dtype=compute_dtype,
                                       interpret=interpret)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype))


rank1_mha_train.defvjp(_train_fwd, _train_bwd)


def _shard_count(sharding) -> int:
    """Number of shards the sharded (batch) axis 0 is split into."""
    from lsdm_tpu.parallel.mesh import shard_count

    return shard_count(sharding)


def rank1_mha_sharded(q, k, v, sharding, compute_dtype=jnp.float32,
                      interpret: bool = False, train: bool = False):
    """The fused rank-1 kernels under ``jax.shard_map`` over a sharded
    cloud (batch) axis (round 5).

    The kernel is per-cloud, so sharding axis 0 needs ZERO collectives:
    each device runs the Pallas program (or, in training, the custom-VJP
    pair — shard_map composes with custom_vjp, so the backward kernel is
    shard-mapped too) on its local batch shard.  This removes the
    round-4 limitation where a sharded object axis forced the composed
    HBM-logits formulation (``models/sdm.py``: "no SPMD rule").

    Caller must ensure ``q.shape[0]`` divides by the shard count
    (``shard_count(sharding)``) — shard_map requires exact divisibility,
    unlike GSPMD's implicit padding.
    """
    spec = jax.sharding.PartitionSpec(sharding.spec[0], None, None)
    fn = rank1_mha_train if train else rank1_mha_pallas
    return jax.shard_map(
        lambda a, b, c: fn(a, b, c, compute_dtype, interpret),
        mesh=sharding.mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)
