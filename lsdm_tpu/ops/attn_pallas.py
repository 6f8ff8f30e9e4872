"""Rank-1-head multihead attention as one Pallas kernel (eval mode).

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

Eval-only (no VJP); the composed path stays for training.  Numerics
mirror ``multihead_attention``: scale = 1/sqrt(1) = 1, f32 logits and
softmax, value contraction in ``compute_dtype`` with f32 accumulation.
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
