"""POSA spiral-convolution models (reference ``posa/posa_models.py``).

Spiral convolution = gather each vertex's precomputed spiral neighbourhood
(N, L) and apply one linear layer to the flattened window — on TPU this is
an XLA ``take`` plus one MXU matmul per block; the spiral index arrays are
static module constants (see :mod:`lsdm_tpu.ops.spiral`).

Three consumers:
  * :class:`POSADecoderBackbone` — the SDM's default human-pose encoder
    (reference instantiates ``Decoder(input_feats=3, pcd_dim=1024)``,
    ``model/sdm.py:104``; with the default ``seq_length=1`` its "spirals"
    degenerate to per-vertex linears over the first 655 points, then x2
    nearest-neighbour upsampling truncated back to 1024 points).
  * :class:`POSAEncoder`/:class:`POSADecoder` — the contact-semantics VAE
    used by ContactFormer (655 -> 164 -> 41 mesh levels, seq_length=9).
  * :class:`POSA` — encoder + decoder + reparameterization.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from lsdm_tpu.ops.attention import TorchLinear
from lsdm_tpu.ops.mesh import GraphParams, ds_us
from lsdm_tpu.ops.spiral import identity_spirals


class SpiralConv(nn.Module):
    """Gather spiral windows + linear (reference ``posa_models.py:70-111``)."""

    out_channels: int
    indices: np.ndarray  # (N, L) int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (..., V, C) with V >= indices.max()+1
        n_nodes, L = self.indices.shape
        idx = jnp.asarray(self.indices.reshape(-1))
        gathered = jnp.take(x, idx, axis=-2)  # (..., N*L, C)
        gathered = gathered.reshape(x.shape[:-2] + (n_nodes, L * x.shape[-1]))
        return TorchLinear(self.out_channels, dtype=self.dtype, name="layer")(gathered)


def _group_norm(channels: int, num_groups: int, name: str):
    if channels % num_groups != 0:
        num_groups = channels  # reference fallback (posa_models.py:144-145)
    return nn.GroupNorm(num_groups=num_groups, epsilon=1e-5, name=name)


class GraphLin(nn.Module):
    """Per-vertex linear, nested as ``conv.layer`` exactly like the reference
    ``GraphLin`` (posa_models.py:114-129) so torch checkpoint keys
    ``...conv.layer.weight`` map 1:1 for GraphLin and Spiral blocks alike."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return TorchLinear(self.out_channels, dtype=self.dtype, name="layer")(x)


class GraphLinBlock(nn.Module):
    """Per-vertex linear + GroupNorm + ReLU (reference ``posa_models.py:132-160``)."""

    out_channels: int
    num_groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = GraphLin(self.out_channels, dtype=self.dtype, name="conv")(x)
        x = _group_norm(self.out_channels, self.num_groups, "norm")(x)
        return nn.relu(x)


class SpiralBlock(nn.Module):
    """SpiralConv + GroupNorm + ReLU (reference ``posa_models.py:163-187``)."""

    out_channels: int
    indices: np.ndarray
    num_groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = SpiralConv(self.out_channels, self.indices, dtype=self.dtype, name="conv")(x)
        x = _group_norm(self.out_channels, self.num_groups, "norm")(x)
        return nn.relu(x)


class FcBlock(nn.Module):
    """Linear + LayerNorm + ReLU (reference ``posa_models.py:190-215``)."""

    out_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = TorchLinear(self.out_features, dtype=self.dtype, name="lin")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.relu(x)


class POSADecoderBackbone(nn.Module):
    """The SDM human backbone (reference ``Decoder``,
    ``posa_models.py:292-326``, instantiated at ``model/sdm.py:104``).

    With default seq_length=1 the pipeline is: per-point MLP
    3 -> z_dim/2 -> 64 (GroupNorm+ReLU each), an identity-spiral block
    64 -> 64, a final linear 64 -> f_dim(=3) over the first ``vert_dims``
    points, then x2 nearest upsampling truncated to ``pcd_points``.
    """

    vert_dims: int = 655
    z_dim: int = 128
    channels: int = 64
    f_dim: int = 3  # no_obj_classes=3 at the SDM call site
    pcd_points: int = 1024
    num_hidden_layers: int = 1
    num_groups: int = 8
    spiral_indices: Optional[np.ndarray] = None  # (vert_dims, L); identity default
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, vertices: jax.Array) -> jax.Array:
        # vertices: (B, P, 3) with P >= vert_dims (SDM feeds 1024)
        idx = (
            self.spiral_indices
            if self.spiral_indices is not None
            else identity_spirals(self.vert_dims)
        )
        x = GraphLinBlock(self.z_dim // 2, self.num_groups, dtype=self.dtype,
                          name="de_spiral_0")(vertices)
        x = GraphLinBlock(self.channels, self.num_groups, dtype=self.dtype,
                          name="de_spiral_1")(x)
        for i in range(self.num_hidden_layers):
            x = SpiralBlock(self.channels, idx, self.num_groups, dtype=self.dtype,
                            name=f"de_spiral_{2 + i}")(x)
        x = SpiralConv(self.f_dim, idx, dtype=self.dtype,
                       name=f"de_spiral_{2 + self.num_hidden_layers}")(x)
        # nearest x2 upsample along the vertex axis, truncate
        x = jnp.repeat(x, 2, axis=-2)
        return x[..., : self.pcd_points, :]


class POSAEncoder(nn.Module):
    """Contact VAE encoder (reference ``Encoder``, ``posa_models.py:247-289``).

    cat(verts, contact features) -> spiral blocks with mesh downsampling
    655 -> 164 -> 41 -> fc -> (mu, logvar).
    """

    spiral_indices: Sequence[np.ndarray]  # per level, (nv_l, 9)
    down_mats: Sequence[jnp.ndarray]  # D for levels 1, 2: (164, 655), (41, 164)
    nv: Sequence[int] = (655, 164, 41)
    h_dim: int = 512
    z_dim: int = 256
    channels: int = 64
    num_groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, vertices: jax.Array):
        x = jnp.concatenate([vertices, x], axis=-1)
        x = SpiralBlock(self.channels, self.spiral_indices[0], self.num_groups,
                        dtype=self.dtype, name="en_spiral_0")(x)
        x = SpiralBlock(self.channels, self.spiral_indices[0], self.num_groups,
                        dtype=self.dtype, name="en_spiral_1")(x)
        x = ds_us(self.down_mats[0], x)
        x = SpiralBlock(self.channels, self.spiral_indices[1], self.num_groups,
                        dtype=self.dtype, name="en_spiral_2")(x)
        x = ds_us(self.down_mats[1], x)
        x = SpiralBlock(self.channels, self.spiral_indices[2], self.num_groups,
                        dtype=self.dtype, name="en_spiral_3")(x)
        x = x.reshape(x.shape[0], self.nv[-1] * self.channels)
        x = FcBlock(self.h_dim, dtype=self.dtype, name="en_fc_0")(x)
        mu = TorchLinear(self.z_dim, dtype=self.dtype, name="en_mu")(x)
        logvar = TorchLinear(self.z_dim, dtype=self.dtype, name="en_log_var")(x)
        return mu, logvar


class POSADecoder(nn.Module):
    """Contact VAE decoder (the *original* POSA decoder that takes (z, verts),
    reference ``contact_former/posa_models.py:288-336``): broadcast z onto
    each vertex, concat with vertex positions, spiral blocks at full
    resolution -> per-vertex contact-class logits."""

    spiral_indices: np.ndarray  # (655, 9)
    no_obj_classes: int = 8
    z_dim: int = 256
    channels: int = 64
    num_hidden_layers: int = 1
    num_groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array, vertices: jax.Array) -> jax.Array:
        # z: (B, z_dim); vertices: (B, V, 3)
        V = vertices.shape[-2]
        zb = jnp.broadcast_to(z[:, None, :], z.shape[:1] + (V, z.shape[-1]))
        x = jnp.concatenate([vertices, zb], axis=-1)
        x = GraphLinBlock(self.channels, self.num_groups, dtype=self.dtype,
                          name="de_spiral_0")(x)
        for i in range(self.num_hidden_layers):
            x = SpiralBlock(self.channels, self.spiral_indices, self.num_groups,
                            dtype=self.dtype, name=f"de_spiral_{1 + i}")(x)
        x = SpiralConv(self.no_obj_classes, self.spiral_indices, dtype=self.dtype,
                       name=f"de_spiral_{1 + self.num_hidden_layers}")(x)
        return x


class POSA(nn.Module):
    """VAE wrapper (reference ``posa_models.py:329-344``)."""

    spiral_indices: Sequence[np.ndarray]
    down_mats: Sequence[jnp.ndarray]
    nv: Sequence[int] = (655, 164, 41)
    no_obj_classes: int = 8
    h_dim: int = 512
    z_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = POSAEncoder(
            spiral_indices=self.spiral_indices,
            down_mats=self.down_mats,
            nv=self.nv,
            h_dim=self.h_dim,
            z_dim=self.z_dim,
            dtype=self.dtype,
        )
        self.decoder = POSADecoder(
            spiral_indices=np.asarray(self.spiral_indices[0]),
            no_obj_classes=self.no_obj_classes,
            z_dim=self.z_dim,
            dtype=self.dtype,
        )

    def __call__(self, x: jax.Array, vertices: jax.Array, key: jax.Array):
        mu, logvar = self.encoder(x, vertices)
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(key, std.shape, std.dtype)
        z = mu + eps * std
        out = self.decoder(z, vertices)
        return out, mu, logvar

    def decode(self, z: jax.Array, vertices: jax.Array) -> jax.Array:
        return self.decoder(z, vertices)
