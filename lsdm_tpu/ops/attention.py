"""Multi-head attention with torch.nn.MultiheadAttention parity.

The SDM uses two nonstandard MHAs (reference ``model/sdm.py:79,95``):

  * ``attn_layer``:   embed_dim=128, heads=8,  kdim=32,  vdim=1024*3
  * ``pcd_attention``: embed_dim=12, heads=12, kdim=3,   vdim=3 (head_dim=1!)

Both rely on torch-specific semantics that this implementation reproduces:

  * separate q/k/v input projections when kdim != vdim != embed_dim
    (q: E<-E, k: E<-kdim, v: E<-vdim), shared output projection E<-E;
  * a *float* ``attn_mask`` is ADDED to the attention logits (the reference
    passes the 0/1 object mask as float, so "given" objects get a +1 logit
    bias — quirky but what trained checkpoints expect, ``model/sdm.py:180-182``);
  * returned attention weights are averaged over heads.

Exposed both as a pure function (for Pallas-fusible call sites) and a flax
module with torch-layout parameters (weights stored (out, in) to make the
checkpoint converter a plain copy).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def multihead_attention(
    q: jax.Array,  # (B, L, E) already projected
    k: jax.Array,  # (B, S, E)
    v: jax.Array,  # (B, S, E)
    num_heads: int,
    attn_mask: Optional[jax.Array] = None,  # additive, (B*H, L, S) or (L, S)
    dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """Scaled dot-product attention over merged heads.

    Returns (output (B, L, E), weights averaged over heads (B, L, S)).
    """
    B, L, E = q.shape
    S = k.shape[1]
    H = num_heads
    Dh = E // H
    assert H * Dh == E, "embed_dim must divide num_heads"
    scale = 1.0 / jnp.sqrt(jnp.asarray(Dh, jnp.float32))

    if Dh == 1:
        # Degenerate head_dim=1 case (the SDM's pcd_attention: embed 12,
        # heads 12, model/sdm.py:95).  The generic path would build
        # (B, H, L, 1) tensors whose lane dimension pads 1 -> 128 on TPU.
        # Rank-1 logits instead: logits[b,h,l,s] = q[b,l,h] * k[b,s,h] —
        # no dimension-1 arrays anywhere.
        logits = jnp.einsum(
            "blh,bsh->bhls", (q * scale).astype(jnp.float32),
            k.astype(jnp.float32), preferred_element_type=jnp.float32,
        )
        if attn_mask is not None:
            if attn_mask.ndim == 3:
                logits = logits + attn_mask.reshape(B, H, L, S).astype(logits.dtype)
            else:
                logits = logits + attn_mask.astype(logits.dtype)[None, None]
        weights = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum(
            "bhls,bsh->blh", weights.astype(dtype), v,
            preferred_element_type=jnp.float32,
        )
        return out, jnp.mean(weights, axis=1)

    qh = q.reshape(B, L, H, Dh).transpose(0, 2, 1, 3)  # (B, H, L, Dh)
    kh = k.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
    vh = v.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)

    logits = jnp.einsum(
        "bhld,bhsd->bhls", qh * scale, kh, preferred_element_type=jnp.float32
    )
    if attn_mask is not None:
        if attn_mask.ndim == 3:  # torch convention: (B*H, L, S)
            logits = logits + attn_mask.reshape(B, H, L, S).astype(logits.dtype)
        else:  # (L, S)
            logits = logits + attn_mask.astype(logits.dtype)[None, None]
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhls,bhsd->bhld", weights.astype(dtype), vh,
        preferred_element_type=jnp.float32,
    )
    out = out.transpose(0, 2, 1, 3).reshape(B, L, E)
    return out, jnp.mean(weights, axis=1)  # torch averages heads by default


class TorchLinear(nn.Module):
    """Linear layer with torch parameter layout: weight (out, in), bias (out,).

    Keeping torch layout makes torch->jax checkpoint conversion a key-rename
    with no transposes, at zero runtime cost (XLA folds the transpose).
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        weight = self.param(
            "weight",
            nn.initializers.lecun_normal(),
            (self.features, in_features),
            jnp.float32,
        )
        y = x.astype(self.dtype) @ weight.T.astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class TorchMultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention(batch_first=True) parity module.

    Parameter names mirror torch's (``q_proj_weight``/``k_proj_weight``/
    ``v_proj_weight``/``in_proj_bias``/``out_proj``) so the checkpoint
    converter maps 1:1.  Only the kdim!=vdim ("unmerged") torch path is
    implemented because that's all the SDM uses.
    """

    embed_dim: int
    num_heads: int
    kdim: int
    vdim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # (B, L, E)
        key: jax.Array,  # (B, S, kdim)
        value: jax.Array,  # (B, S, vdim)
        attn_mask: Optional[jax.Array] = None,
        fused: bool = False,
        fused_train: bool = False,
        shard: Optional[object] = None,  # NamedSharding over axis 0
    ) -> Tuple[jax.Array, jax.Array]:
        E = self.embed_dim
        init = nn.initializers.xavier_uniform()
        q_w = self.param("q_proj_weight", init, (E, E), jnp.float32)
        k_w = self.param("k_proj_weight", init, (E, self.kdim), jnp.float32)
        v_w = self.param("v_proj_weight", init, (E, self.vdim), jnp.float32)
        in_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * E,), jnp.float32)

        q = query.astype(self.dtype) @ q_w.T.astype(self.dtype) + in_b[:E].astype(self.dtype)
        k = key.astype(self.dtype) @ k_w.T.astype(self.dtype) + in_b[E : 2 * E].astype(self.dtype)
        v = value.astype(self.dtype) @ v_w.T.astype(self.dtype) + in_b[2 * E :].astype(self.dtype)

        # ``shard``: a NamedSharding over axis 0 (the flattened cloud
        # axis).  The rank-1 kernels have no GSPMD rule, but they are
        # per-cloud — under shard_map each device runs the kernel (and,
        # in training, its custom-VJP backward) on its local shard with
        # zero collectives (ops/attn_pallas.py:rank1_mha_sharded).
        # Requires exact divisibility; otherwise fall through composed.
        shard_ok = shard is None
        if shard is not None and (fused or fused_train):
            from lsdm_tpu.ops.attn_pallas import _shard_count
            shard_ok = q.shape[0] % _shard_count(shard) == 0

        if (fused and self.num_heads == E and attn_mask is None
                and q.shape[1] % 8 == 0 and shard_ok):
            # head_dim == 1 eval fast path: the (B, H, L, S) logits tensor
            # never leaves VMEM (ops/attn_pallas.py); weights (the second
            # return) are not computed — callers on this path discard them
            from lsdm_tpu.ops.attn_pallas import (rank1_mha_pallas,
                                                  rank1_mha_sharded)
            if shard is not None:
                out = rank1_mha_sharded(
                    q, k, v, shard, compute_dtype=self.dtype,
                    interpret=jax.default_backend() == "cpu", train=False)
            else:
                out = rank1_mha_pallas(
                    q, k, v, compute_dtype=self.dtype,
                    interpret=jax.default_backend() == "cpu")
            out = TorchLinear(E, dtype=self.dtype, name="out_proj")(
                out.astype(self.dtype))
            return out, None

        if (fused_train and self.num_heads == E and attn_mask is None
                and q.shape[1] % 8 == 0 and shard_ok):
            # head_dim == 1 TRAIN fast path: same fused forward, plus a
            # flash-style custom-VJP backward that recomputes the softmax
            # in VMEM (ops/attn_pallas.py:rank1_mha_train) — the (L, S)
            # plane never reaches HBM in either direction.  Weights are
            # not computed; this path's callers discard them.
            from lsdm_tpu.ops.attn_pallas import (rank1_mha_sharded,
                                                  rank1_mha_train)
            if shard is not None:
                out = rank1_mha_sharded(
                    q, k, v, shard, compute_dtype=jnp.dtype(self.dtype),
                    interpret=jax.default_backend() == "cpu", train=True)
            else:
                out = rank1_mha_train(
                    q, k, v, jnp.dtype(self.dtype),
                    jax.default_backend() == "cpu")
            out = TorchLinear(E, dtype=self.dtype, name="out_proj")(
                out.astype(self.dtype))
            return out, None

        out, weights = multihead_attention(
            q, k, v, self.num_heads, attn_mask=attn_mask, dtype=self.dtype
        )
        out = TorchLinear(E, dtype=self.dtype, name="out_proj")(out)
        return out, weights
