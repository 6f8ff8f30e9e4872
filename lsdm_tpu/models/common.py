"""Shared denoiser blocks (reference ``model/diffusion_utils.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from lsdm_tpu.ops.attention import TorchLinear
from lsdm_tpu.ops.embeddings import positional_encoding_table


class TimestepEmbedder(nn.Module):
    """Index a sinusoidal PE table by integer timestep, then a 2-layer SiLU
    MLP (reference ``model/diffusion_utils.py:7-21``).

    Output: (B, 1, latent_dim) — matches the reference after its
    permute dance (``model/sdm.py:141-142``).
    """

    latent_dim: int
    max_len: int = 5000
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, timesteps: jax.Array) -> jax.Array:
        pe = jnp.asarray(positional_encoding_table(self.latent_dim, self.max_len))
        x = pe[timesteps][:, None, :]  # (B, 1, D)
        x = TorchLinear(self.latent_dim, dtype=self.dtype, name="time_embed_0")(x)
        x = jax.nn.silu(x)
        x = TorchLinear(self.latent_dim, dtype=self.dtype, name="time_embed_2")(x)
        return x


class MLP(nn.Module):
    """Linear stack with a per-layer activation list; names the linears
    "0", "2", "4"... like torch nn.Sequential indices so checkpoint keys
    line up."""

    features: tuple
    activations: tuple  # same length; entries: "gelu"|"silu"|"sigmoid"|"relu"|None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        act_map = {
            # torch nn.GELU() is the exact erf formulation, not the tanh
            # approximation jax defaults to — parity requires approximate=False.
            "gelu": lambda y: nn.gelu(y, approximate=False),
            "silu": jax.nn.silu,
            "sigmoid": jax.nn.sigmoid,
            "relu": nn.relu,
            None: lambda y: y,
        }
        idx = 0
        for feats, act in zip(self.features, self.activations):
            x = TorchLinear(feats, dtype=self.dtype, name=str(idx))(x)
            x = act_map[act](x)
            idx += 2 if act is not None else 1
        return x


class InputProcess(nn.Module):
    """Point-wise input MLP (reference ``model/diffusion_utils.py:45-88``):
    pose embedding (3 -> D/2 -> D, Sigmoid) concat cond emb -> combine
    (2D -> 1.5D -> D, Sigmoid)."""

    input_feats: int
    extract_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array) -> jax.Array:
        d = self.extract_dim
        x = x.astype(jnp.float32)
        x = MLP(
            (d // 2, d), ("sigmoid", "sigmoid"), dtype=self.dtype, name="pose_embedding"
        )(x)
        x = jnp.concatenate([x, emb], axis=-1)
        x = MLP(
            (int(d * 1.5), d),
            ("sigmoid", "sigmoid"),
            dtype=self.dtype,
            name="combination_extraction",
        )(x)
        return x


class OutputProcess(nn.Module):
    """Point-wise output MLP (reference ``model/diffusion_utils.py:91-122``):
    D -> D/2 -> input_feats with GELU after *both* layers (output passes
    through a final GELU — a reference quirk that bounds outputs below at
    ~-0.17; kept for checkpoint parity)."""

    input_feats: int
    extract_dim: int
    pcd_points: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = self.extract_dim
        x = MLP(
            (d // 2, self.input_feats), ("gelu", "gelu"), dtype=self.dtype,
            name="pose_final",
        )(x)
        B = x.shape[0]
        return x.reshape(B, self.pcd_points, -1)
