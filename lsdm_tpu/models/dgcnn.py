"""DGCNN point-cloud backbone (reference ``model/pcd_backbone/dgcnn.py``).

EdgeConv stack: dynamic kNN graph per layer, per-edge features
``cat(x_j - x_i, x_i)``, 1x1 convs + BatchNorm + LeakyReLU(0.2), max over
neighbours; four stages (64, 64, 128, 256) concatenated, 1d conv to
``emb_dims``, global max+avg pooling, MLP head to ``pcd_points * 3``.

Selected via ``pcd_backbone_type="DGCNN"`` (reference ``model/sdm.py:96-97``,
instantiated with emb_dims=clip_dim, output_channels=pcd_points*xyz_dim).

TPU notes: layout is (B, N, K, C) with Dense over the trailing channel axis
(torch uses (B, C, N, K) Conv2d — same math); the kNN is one MXU matmul +
``top_k``.  The reference's hardcoded ``device='cuda'`` (``dgcnn.py:36``)
has no equivalent here by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from lsdm_tpu.ops.pointcloud import knn, index_points


def edge_features(x: jax.Array, k: int, impl: str = "topk") -> jax.Array:
    """Per-edge features cat(x_j - x_i, x_i): (B, N, C) -> (B, N, k, 2C)
    (reference ``get_graph_feature``, ``dgcnn.py:30-53``)."""
    idx = knn(x, k, impl=impl)  # (B, N, k) — includes self as nearest
    neigh = index_points(x, idx)  # (B, N, k, C)
    center = jnp.broadcast_to(x[:, :, None, :], neigh.shape)
    return jnp.concatenate([neigh - center, center], axis=-1)


class _ConvBNLeaky(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Dense(self.features, use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="bn",
        )(x)
        return nn.leaky_relu(x, 0.2)


class DGCNN(nn.Module):
    emb_dims: int = 512
    k: int = 10  # reference default at the SDM call site (dgcnn.py:89)
    dropout: float = 0.1
    output_channels: int = 3072  # pcd_points * xyz_dim
    dtype: jnp.dtype = jnp.float32
    # "topk" (single-chip) | "spmd" (partition-clean; ops/pointcloud.py)
    select_impl: str = "topk"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # x: (B, N, 3) -> (B, pcd_points, 3)
        B = x.shape[0]
        k = min(self.k, x.shape[1])

        outs = []
        h = x
        for i, feats in enumerate((64, 64, 128, 256)):
            # sharded context: the partitioned top_k keeps the fast TopK
            # custom call and zero collectives (ops/pointcloud.py:topk_rows)
            e = edge_features(h, k, impl="topk_p" if self.select_impl == "spmd" else "topk")  # (B, N, k, 2C)
            e = _ConvBNLeaky(feats, dtype=self.dtype, name=f"conv{i + 1}")(e, train)
            h = jnp.max(e, axis=2)  # (B, N, feats)
            outs.append(h)

        h = jnp.concatenate(outs, axis=-1)  # (B, N, 512)
        h = _ConvBNLeaky(self.emb_dims, dtype=self.dtype, name="conv5")(h, train)
        gmax = jnp.max(h, axis=1)
        gavg = jnp.mean(h, axis=1)
        g = jnp.concatenate([gmax, gavg], axis=-1)  # (B, 2*emb)

        g = nn.Dense(512, use_bias=False, dtype=self.dtype, name="linear1")(g)
        g = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="bn6",
        )(g)
        g = nn.leaky_relu(g, 0.2)
        g = nn.Dropout(self.dropout, deterministic=not train)(g)
        g = nn.Dense(256, dtype=self.dtype, name="linear2")(g)
        g = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="bn7",
        )(g)
        g = nn.leaky_relu(g, 0.2)
        g = nn.Dropout(self.dropout, deterministic=not train)(g)
        g = nn.Dense(self.output_channels, dtype=self.dtype, name="linear3")(g)
        return g.reshape(B, -1, 3)
