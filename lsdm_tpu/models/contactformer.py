"""ContactFormer: per-frame POSA VAE + temporal decoder over a motion
sequence (reference ``contact_former/contact_former.py:18-196``).

Predicts per-vertex contact-semantic labels (8 classes) for each frame of a
655-vertex downsampled body sequence.  Five decoder modes, matching the
reference:

  0 — POSA only (per-frame, no temporal context)
  1 — full encoder-decoder transformer (``TransformerDecoder``)
  2 — TransformerEncoder only (``TransformerDecoder2``)
  3 — frame-wise MLP (``MLPDecoder3``)
  4 — bidirectional LSTM (``LSTMDecoder4``)

The temporal sequence axis is the *frame* axis (seg_len up to 256); all
decoders first compress each frame's (655 x 8) POSA logits to ``d_hid``,
run the temporal model, then broadcast back per-vertex and fuse with the
POSA logits through a small MLP head.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from lsdm_tpu.models.atiss import TorchTransformerEncoderLayer
from lsdm_tpu.models.posa import POSA
from lsdm_tpu.ops.attention import TorchLinear, multihead_attention
from lsdm_tpu.ops.embeddings import positional_encoding_table


class TorchTransformerDecoderLayer(nn.Module):
    """torch.nn.TransformerDecoderLayer parity (post-LN): self-attn +
    cross-attn + FFN."""

    d_model: int
    n_heads: int
    dim_ff: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, tgt_mask=None, mem_mask=None, train=False):
        E = self.d_model

        def mha(name, q_in, kv_in, mask):
            in_w = self.param(f"{name}_in_proj_weight",
                              nn.initializers.xavier_uniform(), (3 * E, E),
                              jnp.float32)
            in_b = self.param(f"{name}_in_proj_bias", nn.initializers.zeros,
                              (3 * E,), jnp.float32)
            q = q_in @ in_w[:E].T + in_b[:E]
            k = kv_in @ in_w[E : 2 * E].T + in_b[E : 2 * E]
            v = kv_in @ in_w[2 * E :].T + in_b[2 * E :]
            out, _ = multihead_attention(q, k, v, self.n_heads, attn_mask=mask,
                                         dtype=self.dtype)
            return TorchLinear(E, dtype=self.dtype, name=f"{name}_out_proj")(out)

        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(
            tgt + mha("self", tgt, tgt, tgt_mask)
        )
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(
            x + mha("cross", x, memory, mem_mask)
        )
        h = TorchLinear(self.dim_ff, dtype=self.dtype, name="linear1")(x)
        h = nn.relu(h)
        h = TorchLinear(E, dtype=self.dtype, name="linear2")(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(x + h)


def _padding_bias(mask: jax.Array) -> jax.Array:
    """Key-padding mask (B, S) of 0/1 valid -> additive (1, S) bias."""
    return jnp.where(mask > 0, 0.0, -1e9)[:, None, :]


class _OutHead(nn.Module):
    """cat(posa_logits, temporal feature) -> contact logits
    (the shared ``out_linear`` stack, reference :71-75)."""

    d_hid: int
    no_obj_classes: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = TorchLinear(self.d_hid // 2, dtype=self.dtype, name="0")(x)
        x = nn.relu(x)
        return TorchLinear(self.no_obj_classes, dtype=self.dtype, name="2")(x)


class ContactFormer(nn.Module):
    """(reference ``ContactFormer``, ``contact_former.py:18-56``)

    ``__call__(cf, vertices, mask, key)``:
      cf:       (T, 655, 8) contact one-hots (VAE input)
      vertices: (T, 655, 3)
      mask:     (1, T) frame validity
      -> (contact logits (1, T, 655, 8), mu (1, T, z), logvar (1, T, z))
    """

    spiral_indices: Sequence[np.ndarray]
    down_mats: Sequence[jnp.ndarray]
    seg_len: int = 256
    decoder_mode: int = 1
    n_layer: int = 6
    n_head: int = 8
    f_vert: int = 64
    dim_ff: int = 512
    d_hid: int = 512
    no_obj_classes: int = 8
    vert_dims: int = 655
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # mesh-level vertex counts follow the down matrices' shapes
        nv = (
            self.down_mats[0].shape[1],
            self.down_mats[0].shape[0],
            self.down_mats[1].shape[0],
        )
        self.posa = POSA(
            spiral_indices=self.spiral_indices,
            down_mats=self.down_mats,
            nv=nv,
            no_obj_classes=self.no_obj_classes,
            dtype=self.dtype,
        )
        D = self.d_hid
        self.frame_emb_linear = TorchLinear(D, dtype=self.dtype)
        self.out_head = _OutHead(D, self.no_obj_classes, dtype=self.dtype)
        if self.decoder_mode in (1, 2):
            self.enc_layers = [
                TorchTransformerEncoderLayer(D, self.n_head, self.dim_ff,
                                             dtype=self.dtype, name=f"enc_{i}")
                for i in range(self.n_layer)
            ]
        if self.decoder_mode == 1:
            self.dec_layers = [
                TorchTransformerDecoderLayer(D, self.n_head, self.dim_ff,
                                             dtype=self.dtype, name=f"dec_{i}")
                for i in range(self.n_layer)
            ]
        if self.decoder_mode == 3:
            self.mlp_block_0 = TorchLinear(D * 2, dtype=self.dtype)
            self.mlp_block_2 = TorchLinear(D, dtype=self.dtype)
        if self.decoder_mode == 4:
            self.lstm_fwd = nn.RNN(nn.OptimizedLSTMCell(self.dim_ff))
            self.lstm_bwd = nn.RNN(
                nn.OptimizedLSTMCell(self.dim_ff), reverse=True, keep_order=True
            )
            self.bidir = TorchLinear(self.d_hid, dtype=self.dtype)

    def _frame_embed(self, posa_out: jax.Array) -> jax.Array:
        T = posa_out.shape[0]
        x = posa_out.reshape(T, -1)  # (T, 655*8)
        x = nn.relu(self.frame_emb_linear(x))
        pe = jnp.asarray(positional_encoding_table(self.d_hid, self.seg_len))
        return x + pe[:T]  # (T, d_hid)

    def _temporal(self, posa_out: jax.Array, mask: jax.Array) -> jax.Array:
        """(T, 655, 8), (1, T) -> temporal features (T, d_hid)."""
        T = posa_out.shape[0]
        h = self._frame_embed(posa_out)[None]  # (1, T, D)
        if self.decoder_mode in (1, 2):
            # key-padding -> additive attention bias over keys, the torch
            # src_key_padding_mask semantics
            bias = _padding_bias(mask[:, :T])  # (1, 1, T) broadcasting (L, S)
            bias = jnp.broadcast_to(bias, (1, T, T))[0]
            x = h
            for layer in self.enc_layers:
                x = layer(x, attn_bias=bias)
            mem = x
            if self.decoder_mode == 1:
                y = h
                for layer in self.dec_layers:
                    y = layer(y, mem, tgt_mask=bias, mem_mask=bias)
                return y[0]
            return mem[0]
        if self.decoder_mode == 3:
            x = nn.relu(self.mlp_block_0(h[0]))
            x = nn.relu(self.mlp_block_2(x))
            return x
        if self.decoder_mode == 4:
            x = (h[0] * (mask[0, :T] > 0)[:, None])[None]  # (1, T, D)
            out_f = self.lstm_fwd(x)
            out_b = self.lstm_bwd(x)
            out = jnp.concatenate([out_f, out_b], axis=-1)[0]
            return nn.relu(self.bidir(out))
        raise NotImplementedError(self.decoder_mode)

    def __call__(
        self,
        cf: jax.Array,
        vertices: jax.Array,
        mask: jax.Array,
        key: jax.Array,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        posa_out, mu, logvar = self.posa(cf, vertices, key)  # (T, 655, 8)
        if self.decoder_mode == 0:
            return posa_out[None], mu[None], logvar[None]
        temporal = self._temporal(posa_out, mask)  # (T, d_hid)
        T, V, _ = posa_out.shape
        tfeat = jnp.broadcast_to(temporal[:, None, :], (T, V, self.d_hid))
        out = self.out_head(jnp.concatenate([posa_out, tfeat], axis=-1))
        return out[None], mu[None], logvar[None]
