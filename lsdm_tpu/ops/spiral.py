"""Spiral-sequence extraction from triangle meshes — pure numpy.

Replaces the reference's openmesh-based one-ring walk
(``posa/posa_utils.py:119-177``) with a half-edge traversal built from the
face array, so no C++ mesh library is needed at runtime.  Spirals are static
per mesh level; extract once at startup (or offline) and feed the (N, L)
index array to :class:`~lsdm_tpu.models.posa.SpiralConv` as a constant.

Falls back to a KD-tree neighbourhood when the ring expansion runs dry,
like the reference (``posa_utils.py:160-168``).

Note: for ``seq_length=1`` (the SDM human backbone,
``posa/posa_models.py:294`` default) the spiral is just the vertex itself —
``identity_spirals`` covers that without any mesh.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def identity_spirals(num_vertices: int) -> np.ndarray:
    """Length-1 spirals: each vertex attends to itself (SDM human backbone)."""
    return np.arange(num_vertices, dtype=np.int32)[:, None]


def load_obj(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Minimal OBJ loader (v / f lines only) — replaces trimesh for the
    template meshes in ``mesh_ds/mesh_{0..5}.obj``."""
    verts: List[List[float]] = []
    faces: List[List[int]] = []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("f "):
                idx = [int(tok.split("/")[0]) - 1 for tok in line.split()[1:4]]
                faces.append(idx)
    return np.asarray(verts, np.float64), np.asarray(faces, np.int32)


def _ordered_one_rings(faces: np.ndarray, nv: int) -> List[List[int]]:
    """Ordered one-ring neighbourhoods via half-edge walking.

    For each vertex, neighbours are returned in consistent winding order
    (starting from an arbitrary neighbour; boundary vertices start from a
    boundary edge so the ring is a contiguous fan).
    """
    # next-vertex map per directed edge within a face: (a->b) exists if some
    # face is (a, b, c); opposite(a->b) = (b->a).
    succ: Dict[Tuple[int, int], int] = {}
    out_edges: List[List[int]] = [[] for _ in range(nv)]
    for (a, b, c) in faces:
        succ[(a, b)] = c
        succ[(b, c)] = a
        succ[(c, a)] = b
        out_edges[a].append(b)
        out_edges[b].append(c)
        out_edges[c].append(a)

    rings: List[List[int]] = []
    for v in range(nv):
        nbrs = out_edges[v]
        if not nbrs:
            rings.append([])
            continue
        # Find a starting neighbour: prefer one with no incoming (v, x)
        # predecessor, i.e. a boundary start.
        start = None
        nbr_set = set(nbrs)
        for n in nbrs:
            # n is a boundary start if no edge (x, n) with succ (v) exists,
            # i.e. we cannot step backwards from n around v.
            if (n, v) not in succ:
                start = n
                break
        if start is None:
            start = nbrs[0]
        ring = [start]
        seen = {start}
        cur = start
        while True:
            # rotate around v: the vertex after `cur` in the ring is
            # succ[(v, cur)] (third vertex of face (v, cur, .)).
            nxt = succ.get((v, cur))
            if nxt is None or nxt in seen:
                break
            ring.append(nxt)
            seen.add(nxt)
            cur = nxt
        # pick up any neighbours missed by a broken fan (non-manifold)
        for n in nbrs:
            if n not in seen:
                ring.append(n)
                seen.add(n)
        rings.append(ring)
    return rings


def extract_spirals(
    verts: np.ndarray,
    faces: np.ndarray,
    seq_length: int,
    dilation: int = 1,
) -> np.ndarray:
    """Spiral index sequences (N, seq_length).

    Same ring-expansion algorithm as reference ``extract_spirals``
    (``posa_utils.py:142-170``): start at the vertex, append whole rings
    until the spiral is long enough; if the mesh runs out of rings, fall
    back to euclidean nearest neighbours.
    """
    nv = verts.shape[0]
    if seq_length == 1:
        return identity_spirals(nv)
    rings = _ordered_one_rings(faces, nv)
    adj: List[set] = [set(r) for r in rings]

    kdt = None
    spirals = []
    for v in range(nv):
        spiral = [v]
        spiral_set = {v}
        last_ring = list(rings[v])
        while last_ring and len(spiral) < seq_length * dilation:
            spiral.extend(last_ring)
            spiral_set.update(last_ring)
            nxt: List[int] = []
            nxt_set = set()
            for u in last_ring:
                for w in rings[u]:
                    if w not in spiral_set and w not in nxt_set:
                        nxt.append(w)
                        nxt_set.add(w)
            last_ring = nxt
        if len(spiral) < seq_length * dilation:
            if kdt is None:
                from sklearn.neighbors import KDTree

                kdt = KDTree(verts, metric="euclidean")
            k = min(seq_length * dilation, nv)
            spiral = kdt.query(
                verts[v : v + 1], k=k, return_distance=False
            )[0].tolist()
            while len(spiral) < seq_length * dilation:  # mesh smaller than window
                spiral.append(spiral[-1])
        spirals.append(spiral[: seq_length * dilation : dilation])
    return np.asarray(spirals, np.int32)


def grid_mesh(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Synthetic n x n triangulated grid — test/fallback mesh when the
    reference's ``mesh_ds`` template meshes are not on disk."""
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    verts = np.stack(
        [ii.ravel() / max(n - 1, 1), jj.ravel() / max(n - 1, 1), np.zeros(n * n)], 1
    )
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            b = a + 1
            c = a + n
            d = c + 1
            faces.append([a, b, c])
            faces.append([b, d, c])
    return verts, np.asarray(faces, np.int32)
