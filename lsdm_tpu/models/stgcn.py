"""STGCN ("P2R") human backbone (reference ``model/p2rnet/``).

Spatio-temporal GCN over 1024 virtual "joints": the ``virtualroom`` graph
(52 skeleton edges among the first 53 nodes, everything else self-loop only,
``stgcn_layers.py:144-154``), spatial-partitioned adjacency with max_hop=5
(K = 1 + 2*5 = 11 partition matrices), learnable per-block edge-importance
weights, and a temporal rel-position embedding from a k=20 frame window.
Output: (B, 1024, 3) — drop-in alternative for the POSA human backbone
(selected via ``human_backbone_type="P2R"``, reference ``model/sdm.py:101``).

Graph construction is vectorized numpy (the reference's O(V^2) Python loops
become mask ops); the graph conv itself is one einsum over the (K, V, V)
adjacency stack — a natural MXU op.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from lsdm_tpu.ops.pointcloud import knn as knn_op

VIRTUALROOM_EDGES = [
    (0, 1), (1, 3), (3, 5), (5, 19), (0, 2), (2, 4), (4, 6), (6, 20), (0, 7),
    (7, 8), (8, 9), (9, 10), (10, 21), (10, 22), (8, 11), (11, 13), (13, 15),
    (15, 17), (8, 12), (12, 14), (14, 16), (16, 18), (17, 23), (23, 24),
    (24, 25), (17, 26), (26, 27), (27, 28), (17, 29), (29, 30), (30, 31),
    (17, 32), (32, 33), (33, 34), (17, 35), (35, 36), (36, 37), (18, 38),
    (38, 39), (39, 40), (18, 41), (41, 42), (42, 43), (18, 44), (44, 45),
    (45, 46), (18, 47), (47, 48), (48, 49), (18, 50), (50, 51), (51, 52),
]


@functools.lru_cache(maxsize=4)
def virtualroom_adjacency(
    num_node: int = 1024, max_hop: int = 5, center: int = 0
) -> np.ndarray:
    """Spatial-partitioned adjacency stack (K, V, V)
    (reference ``Graph`` with layout='virtualroom', strategy='spatial',
    ``stgcn_layers.py:83-200``), vectorized."""
    A = np.zeros((num_node, num_node))
    for i, j in VIRTUALROOM_EDGES:
        if i < num_node and j < num_node:  # tiny test graphs truncate the skeleton
            A[i, j] = A[j, i] = 1
    np.fill_diagonal(A, 1)

    # hop distances via boolean matrix powers
    hop_dis = np.full((num_node, num_node), np.inf)
    reach = np.eye(num_node, dtype=bool)
    power = np.eye(num_node)
    mats = [reach]
    for _ in range(max_hop):
        power = power @ A
        mats.append(power > 0)
    for d in range(max_hop, -1, -1):
        hop_dis[mats[d]] = d

    adjacency = (hop_dis <= max_hop).astype(np.float64)
    # normalize_digraph: A @ D^-1 (column-degree)
    deg = adjacency.sum(0)
    dn = np.where(deg > 0, 1.0 / deg, 0.0)
    norm_adj = adjacency * dn[None, :]

    dist_c = hop_dis[:, center]
    stacks = []
    for hop in range(max_hop + 1):
        mask_hop = hop_dis == hop
        same = mask_hop & (dist_c[:, None] == dist_c[None, :]).T
        # reference indexes hop_dis[j, i] vs centers of j and i:
        # a_root: dist(j,c)==dist(i,c); a_close: dist(j,c)>dist(i,c)
        jj, ii = np.meshgrid(dist_c, dist_c, indexing="ij")
        root = np.where(mask_hop & (jj == ii), norm_adj, 0.0)
        close = np.where(mask_hop & (jj > ii), norm_adj, 0.0)
        further = np.where(mask_hop & (jj < ii), norm_adj, 0.0)
        if hop == 0:
            stacks.append(root)
        else:
            stacks.append(root + close)
            stacks.append(further)
    return np.stack(stacks).astype(np.float32)  # (2*max_hop+1, V, V)


class ConvTemporalGraphical(nn.Module):
    """1x1 conv to K*C channels then contraction with the adjacency stack
    (reference ``stgcn_layers.py / ConvTemporalGraphical``)."""

    out_channels: int
    kernel_size: int  # K
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, A: jax.Array) -> jax.Array:
        # x: (B, T, V, C); A: (K, V, V)
        x = nn.Dense(self.out_channels * self.kernel_size, dtype=self.dtype,
                     name="conv")(x)
        B, T, V, _ = x.shape
        x = x.reshape(B, T, V, self.kernel_size, self.out_channels)
        return jnp.einsum(
            "btvkc,kvw->btwc", x, A, preferred_element_type=jnp.float32
        )


class STGCNBlock(nn.Module):
    """GCN + temporal conv + residual (reference ``st_gcn_block``)."""

    out_channels: int
    kernel_size: Tuple[int, int]  # (temporal, spatial)
    stride: int = 1
    residual: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, A: jax.Array, train: bool) -> jax.Array:
        # x: (B, T, V, C)
        tk, sk = self.kernel_size
        in_channels = x.shape[-1]
        if not self.residual:
            res = 0.0
        elif in_channels == self.out_channels and self.stride == 1:
            res = x
        else:
            r = nn.Conv(self.out_channels, (1, 1), strides=(self.stride, 1),
                        dtype=self.dtype, name="res_conv")(x)
            res = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, dtype=jnp.float32, name="res_bn")(r)
        h = ConvTemporalGraphical(self.out_channels, sk, dtype=self.dtype,
                                  name="gcn")(x, A)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="tcn_bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(
            self.out_channels, (tk, 1), strides=(self.stride, 1),
            padding=((tk // 2, tk // 2), (0, 0)), dtype=self.dtype, name="tcn_conv",
        )(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="tcn_bn2")(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.relu(h + res)


class SingleConv(nn.Module):
    """conv(+BN+ReLU) over a 1-D channel sequence, order 'cbr' or 'c'
    (reference ``sub_modules.py:88``)."""

    out_channels: int
    order: str = "cbr"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        # x: (B, L, C)
        x = nn.Dense(self.out_channels, dtype=self.dtype, name="conv")(x)
        if "b" in self.order:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        if "r" in self.order:
            x = nn.relu(x)
        return x


class STGCN(nn.Module):
    """(reference ``model/p2rnet/stgcn.py:10-143``; the SDM calls it with a
    single frame, ``num_frames=1``)."""

    joint_num: int = 1024
    num_frames: int = 1
    origin_joint_id: int = 0
    knn: int = 20
    max_hop: int = 5
    out_channels: int = 3072
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_joints: jax.Array, train: bool = False) -> jax.Array:
        # input_joints: (B, V, 3) single frame, or (B, T, V, 3)
        if input_joints.ndim == 3:
            input_joints = input_joints[:, None]  # (B, 1, V, 3)
        B, T, V, _ = input_joints.shape
        A_np = virtualroom_adjacency(V, self.max_hop, self.origin_joint_id)
        K = A_np.shape[0]
        A = jnp.asarray(A_np)

        origin = input_joints[:, :, self.origin_joint_id]  # (B, T, 3)
        x = input_joints - origin[:, :, None, :]

        # temporal window indices (reference :110-115)
        frame_ids = jnp.arange(T)[None, :, None]
        window = jnp.arange(-self.knn // 2, self.knn // 2)[None, None, :]
        idx = jnp.clip(frame_ids + window, 0, T - 1)  # (1, T, knn)
        idx = jnp.broadcast_to(idx, (B, T, self.knn))
        # rel positions of temporal neighbours (reference get_graph_offset)
        neigh = jnp.take_along_axis(origin[:, None, :, :],
                                    idx[..., None], axis=2)  # (B, T, knn, 3)
        rel = neigh - origin[:, :, None, :]  # (B, T, knn, 3)

        pe = rel.reshape(B, T * self.knn, 3)
        pe = SingleConv(64, "cbr", dtype=self.dtype, name="pos_embed_0")(pe, train)
        pe = SingleConv(2, "c", dtype=self.dtype, name="pos_embed_1")(pe, train)
        pe = pe.reshape(B, T, self.knn, 2).mean(axis=2)  # (B, T, 2)

        sf = x.reshape(B, T * V, 3)
        sf = SingleConv(64, "cbr", dtype=self.dtype, name="sk_feat_0")(sf, train)
        sf = SingleConv(2, "c", dtype=self.dtype, name="sk_feat_1")(sf, train)
        sf = sf.reshape(B, T, V, 2)

        h = sf + pe[:, :, None, :]  # (B, T, V, 2)

        # learnable edge importance per block (reference :70-74)
        imp0 = self.param("edge_importance_0", nn.initializers.ones, (K, V, V),
                          jnp.float32)
        imp1 = self.param("edge_importance_1", nn.initializers.ones, (K, V, V),
                          jnp.float32)
        h = STGCNBlock(64, (3, K), residual=False, dtype=self.dtype,
                       name="st_gcn_0")(h, A * imp0, train)
        h = STGCNBlock(2, (3, K), dtype=self.dtype, name="st_gcn_1")(
            h, A * imp1, train
        )

        # (B, T, V, 2) -> (B, V*2 per frame) -> conv_joint -> (B, V, 3)
        h = jnp.swapaxes(h, 1, 2).reshape(B, V * h.shape[-1], T)
        h = jnp.swapaxes(h, 1, 2)  # (B, T, V*C)
        h = nn.Dense(self.out_channels, dtype=self.dtype, name="conv_joint")(h)
        return h[:, 0].reshape(B, V, -1)  # single-frame output (B, V, 3)
