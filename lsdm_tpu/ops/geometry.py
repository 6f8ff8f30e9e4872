"""Scene-geometry utilities: orientation normalization, SDF sampling,
oriented bounding boxes, floor estimation.

TPU-native equivalents of:
  * ``posa/data_utils.py``: ``rotation_matrix_from_vectors`` (:124),
    ``normalize_orientation`` (:138), ``read_sdf`` (:253 — torch
    grid_sample -> trilinear ``map_coordinates``);
  * ``util/translate_obj_bbox.py``: point-cloud <-> oriented-bbox
    conversion (open3d OBB -> PCA OBB here), including fixing the
    reference's self-assignment bug at ``:34``;
  * ``utils.py:354-371``: floor-height estimation (sklearn DBSCAN -> our
    native DBSCAN with 1-D clustering).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rotation_matrix_from_vectors(vec1: np.ndarray, vec2: np.ndarray) -> np.ndarray:
    """Rotation aligning vec1 to vec2 (host numpy; reference
    ``data_utils.py:124-136``)."""
    a = np.asarray(vec1, np.float64).reshape(3)
    b = np.asarray(vec2, np.float64).reshape(3)
    a = a / np.linalg.norm(a)
    b = b / np.linalg.norm(b)
    v = np.cross(a, b)
    c = float(np.dot(a, b))
    s = float(np.linalg.norm(v))
    if s < 1e-12:
        return np.eye(3) if c > 0 else -np.eye(3)
    kmat = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + kmat + kmat @ kmat * ((1 - c) / (s**2))


def normalize_orientation(
    verts_can: jax.Array, associated_joints: np.ndarray
) -> jax.Array:
    """Rotate a motion sequence about z so the first-frame pose faces +x
    (reference ``data_utils.py:138-163``): direction = mean(verts of joint 1)
    - mean(verts of joint 2), z zeroed, aligned to (1, 0, 0); the rotation
    is applied to all frames.

    verts_can: (T, V, 3); associated_joints: (V,) int.
    """
    first = np.asarray(verts_can[0])
    j1 = first[np.asarray(associated_joints) == 1].mean(0)
    j2 = first[np.asarray(associated_joints) == 2].mean(0)
    direction = j1 - j2
    direction[2] = 0.0
    rot = rotation_matrix_from_vectors(direction, np.array([1.0, 0.0, 0.0]))
    rot = jnp.asarray(rot, jnp.float32)
    return jnp.einsum("ij,tvj->tvi", rot, verts_can)


def read_sdf(
    vertices: jax.Array,
    sdf_grid: jax.Array,
    grid_min: jax.Array,
    grid_max: jax.Array,
) -> jax.Array:
    """Trilinear SDF sampling at world-space points.

    Equivalent of reference ``read_sdf`` (``data_utils.py:253-265``):
    torch ``grid_sample(align_corners=True, padding_mode='border')`` over a
    (D, D, D) grid with the verts' (x, y, z) mapping to grid axes (0, 1, 2).

    vertices: (B, N, 3); sdf_grid: (D, D, D) -> (B, N) sdf values.
    """
    from jax.scipy.ndimage import map_coordinates

    D = sdf_grid.shape[0]
    rel = (vertices - grid_min) / (grid_max - grid_min)  # [0, 1]
    coords = rel * (D - 1)  # align_corners=True mapping
    coords = jnp.clip(coords, 0, D - 1)  # padding_mode='border'

    def sample_one(pts):
        return map_coordinates(
            sdf_grid, [pts[:, 0], pts[:, 1], pts[:, 2]], order=1, mode="nearest"
        )

    return jax.vmap(sample_one)(coords)


def load_scene_data(
    name: str,
    sdf_dir: str,
    use_semantics: bool = False,
    no_obj_classes: int = 42,
) -> dict:
    """Load a scene SDF grid + optional semantics (reference
    ``load_scene_data``, ``posa/data_utils.py:216-251``), including the
    label remaps (34 -> 10 seating->sofa, 25 -> 28 shower->lighting)."""
    import json
    import os.path as osp

    from lsdm_tpu.ops.rotations import euler_to_matrix

    with open(osp.join(sdf_dir, name + ".json")) as f:
        meta = json.load(f)
    grid_dim = meta["dim"]
    grid_min = np.asarray(meta["min"], np.float32)
    grid_max = np.asarray(meta["max"], np.float32)
    sdf = np.load(osp.join(sdf_dir, name + "_sdf.npy")).astype(np.float32)
    sdf = sdf.reshape(grid_dim, grid_dim, grid_dim)

    out = {
        "R": np.asarray(
            euler_to_matrix(jnp.asarray(np.pi / 2), jnp.asarray(0.0),
                            jnp.asarray(0.0))
        ),
        "t": np.zeros((1, 3), np.float32),
        "grid_dim": grid_dim,
        "grid_min": grid_min,
        "grid_max": grid_max,
        "voxel_size": (grid_max - grid_min) / grid_dim,
        "bbox": np.asarray(meta.get("bbox", []), np.float32),
        "badding_val": meta.get("badding_val"),
        "sdf": sdf,
        "semantics": None,
        "scene_semantics": None,
    }
    if use_semantics:
        sem = np.load(osp.join(sdf_dir, name + "_semantics.npy")).astype(np.float32)
        sem = sem.reshape(grid_dim, grid_dim, grid_dim)
        sem[sem == 34] = 10  # seating -> sofa (N0SittingBooth)
        sem[sem == 25] = 28  # mislabeled shower -> lighting
        present = np.unique(sem).astype(int)
        onehot = np.zeros((1, no_obj_classes), np.float32)
        onehot[0, present[present < no_obj_classes]] = 1
        out["semantics"] = sem
        out["scene_semantics"] = onehot
    return out


def oriented_bbox(points: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """PCA oriented bounding box: (center (3,), rotation (3, 3), extent (3,)).

    Replaces open3d ``OrientedBoundingBox.create_from_points``
    (reference ``util/translate_obj_bbox.py:6-16``).  Columns of the
    rotation are the principal axes.
    """
    pts = np.asarray(points, np.float64)
    mean = pts.mean(0)
    centered = pts - mean
    cov = centered.T @ centered / max(len(pts) - 1, 1)
    eigval, eigvec = np.linalg.eigh(cov)
    order = np.argsort(eigval)[::-1]
    R = eigvec[:, order]
    if np.linalg.det(R) < 0:
        R[:, 2] = -R[:, 2]
    local = centered @ R
    lo, hi = local.min(0), local.max(0)
    extent = hi - lo
    center = mean + R @ ((lo + hi) / 2)
    return center.astype(np.float32), R.astype(np.float32), extent.astype(np.float32)


def translate_objs_to_bbox(obj_verts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Batch point clouds -> (centers (B, 3), sizes (B, 3))
    (reference ``translate_objs_to_bbox``, ``util/translate_obj_bbox.py:18-38``,
    minus its self-assignment bug at ``:34``)."""
    obj_verts = np.asarray(obj_verts)
    centers = np.zeros((obj_verts.shape[0], 3), np.float32)
    sizes = np.zeros((obj_verts.shape[0], 3), np.float32)
    for i, verts in enumerate(obj_verts):
        c, _, e = oriented_bbox(verts)
        centers[i] = c
        sizes[i] = e
    return centers, sizes


def translate_bbox_obj(
    center: np.ndarray,
    size: np.ndarray,
    n_points: int = 1024,
    seed: int = 0,
    rotation: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Uniformly sample points inside a bbox (reference
    ``translate_bbox_obj``, ``util/translate_obj_bbox.py:55-71``)."""
    rng = np.random.RandomState(seed)
    local = (rng.rand(n_points, 3).astype(np.float32) - 0.5) * np.asarray(
        size, np.float32
    )
    if rotation is not None:
        local = local @ np.asarray(rotation, np.float32).T
    return local + np.asarray(center, np.float32)


def estimate_floor_height(
    verts: np.ndarray,
    contact_mask: Optional[np.ndarray] = None,
    eps: float = 0.005,
    min_samples: int = 100,
) -> float:
    """Floor height = center of the densest 1-D cluster of (floor-contact)
    vertex z values (reference ``estimate_floor_height``,
    ``utils.py:354-371``, sklearn DBSCAN over heights)."""
    z = np.asarray(verts).reshape(-1, verts.shape[-1])[:, 2]
    if contact_mask is not None:
        flat = np.asarray(contact_mask).reshape(-1) > 0
        if flat.any():
            z = z[flat]
    if len(z) == 0:
        return 0.0
    from lsdm_tpu.fitting.native import dbscan

    pts = np.stack([z, np.zeros_like(z), np.zeros_like(z)], -1).astype(np.float32)
    labels = dbscan(pts, eps=eps, min_pts=min(min_samples, max(len(z) // 10, 1)))
    valid = labels >= 0
    if not valid.any():
        return float(np.median(z))
    counts = np.bincount(labels[valid])
    densest = int(np.argmax(counts))
    return float(z[labels == densest].mean())
