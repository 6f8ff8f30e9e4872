"""Mesh down/up-sampling graph parameters.

The reference stores sparse scipy CSR matrices (A/D/U per level) in
``mesh_ds/`` and multiplies them per-sample through a custom sparse-matmul
autograd function (``posa/posa_utils.py:54-94``).  On TPU the matrices are
tiny (largest 655 x 2619), so we densify once at load time and use regular
XLA matmuls — differentiable for free and MXU-friendly
(SURVEY.md §2.9 "torch sparse" row).
"""

from __future__ import annotations

import os.path as osp
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


class GraphParams(NamedTuple):
    """Dense A (row-normalized adjacency), U (upsample), D (downsample)."""

    A: jnp.ndarray
    U: jnp.ndarray
    D: jnp.ndarray


def row_normalized_adjacency(adj: "np.ndarray | object", nsize: int = 1) -> np.ndarray:
    """Row-normalized adjacency with self-loops
    (reference ``adjmat_sparse``, ``posa_utils.py:32-51``)."""
    import scipy.sparse as sp

    adjmat = sp.csr_matrix(adj)
    if nsize > 1:
        orig = adjmat.copy()
        for _ in range(1, nsize):
            adjmat = adjmat * orig
    adjmat.data = np.ones_like(adjmat.data)
    adjmat = sp.lil_matrix(adjmat)
    for i in range(adjmat.shape[0]):
        adjmat[i, i] = 1
    adjmat = sp.csr_matrix(adjmat)
    num_neighbors = np.asarray(1.0 / adjmat.sum(axis=-1)).ravel()
    adjmat = sp.diags(num_neighbors) @ adjmat
    return np.asarray(adjmat.todense(), np.float32)


def get_graph_params(ds_us_dir: str, layer: int = 1) -> GraphParams:
    """Load A/D/U npz for a level and densify
    (reference ``get_graph_params``, ``posa_utils.py:105-116``)."""
    import scipy.sparse as sp

    A = sp.load_npz(osp.join(ds_us_dir, f"A_{layer}.npz"))
    D = sp.load_npz(osp.join(ds_us_dir, f"D_{layer}.npz"))
    U = sp.load_npz(osp.join(ds_us_dir, f"U_{layer}.npz"))
    return GraphParams(
        A=jnp.asarray(row_normalized_adjacency(A)),
        U=jnp.asarray(np.asarray(U.todense(), np.float32)),
        D=jnp.asarray(np.asarray(D.todense(), np.float32)),
    )


def ds_us(M: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Mesh down/up-sample: batched dense matmul ``M @ x``.

    x: (..., N, C); M: (N', N) -> (..., N', C).  Replaces the reference's
    per-sample sparse loop (``posa_utils.py:78-94``) with one XLA matmul.
    """
    return jnp.einsum("mn,...nc->...mc", M, x, preferred_element_type=jnp.float32)


def synthetic_graph_params(nv_out: int, nv_in: int) -> GraphParams:
    """Deterministic fake D/U/A for tests when mesh_ds data is absent:
    D averages pairs of consecutive vertices; U repeats."""
    D = np.zeros((nv_out, nv_in), np.float32)
    for i in range(nv_out):
        src = min(2 * i, nv_in - 1)
        D[i, src] = 0.5
        D[i, min(src + 1, nv_in - 1)] += 0.5
    U = np.zeros((nv_in, nv_out), np.float32)
    for i in range(nv_in):
        U[i, min(i // 2, nv_out - 1)] = 1.0
    A = np.eye(nv_out, dtype=np.float32)
    return GraphParams(A=jnp.asarray(A), U=jnp.asarray(U), D=jnp.asarray(D))
