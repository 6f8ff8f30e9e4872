"""Sinusoidal embeddings (reference ``diffusion/nn.py:110`` and
``model/diffusion_utils.py:24-42``)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def timestep_embedding(timesteps: jax.Array, dim: int, max_period: int = 10000):
    """Sinusoidal timestep embeddings (reference ``diffusion/nn.py:110-129``).

    timesteps: (N,) -> (N, dim); first half cos-free sin layout as in the
    guided-diffusion convention: concat(cos, sin) ordering matches the
    reference implementation exactly (cos appended after sin).
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate([embedding, jnp.zeros_like(embedding[:, :1])], -1)
    return embedding


def positional_encoding_table(d_model: int, max_len: int = 5000) -> np.ndarray:
    """Interleaved sin/cos PE table, shape (max_len, d_model).

    Matches reference ``model/diffusion_utils.py:24-37`` (pe[:, 0::2]=sin,
    pe[:, 1::2]=cos).  The SDM's TimestepEmbedder indexes this table by the
    integer timestep (``model/diffusion_utils.py:20-21``).
    """
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(0, max_len, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * (-np.log(10000.0) / d_model)
    )
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe
