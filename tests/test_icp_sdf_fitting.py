"""Tests: ICP registration, native SDF generation, fitting drivers, mesh IO."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from lsdm_tpu.ops.icp import icp, random_restart_icp, transform_points
from lsdm_tpu.ops.rotations import rotz
from lsdm_tpu.fitting.sdf import generate_sdf
from lsdm_tpu.fitting.meshio import (
    write_obj, write_ply, merge_meshes, sample_surface, load_obj_candidates,
)
from lsdm_tpu.fitting.fit_objects import (
    align_to_floor, center_xy, cluster_contact_points, vote_contact_points,
    fit_cluster,
)
from lsdm_tpu.ops.spiral import grid_mesh, load_obj


def test_icp_recovers_rigid_transform(rng):
    src = rng.rand(128, 3).astype(np.float32)
    R = np.asarray(rotz(jnp.asarray(0.4)))
    t = np.array([0.3, -0.2, 0.1], np.float32)
    dst = src @ R.T + t
    res = icp(jnp.asarray(src), jnp.asarray(dst), jnp.eye(4), threshold=1.0,
              iters=30)
    aligned = np.asarray(transform_points(jnp.asarray(src), res.transformation))
    assert float(res.fitness) == 1.0
    np.testing.assert_allclose(aligned, dst, atol=1e-3)
    assert float(res.inlier_rmse) < 1e-3


def test_random_restart_icp_large_rotation(rng):
    # a structured (non-symmetric) cloud rotated 150 degrees: single-start
    # ICP from identity gets stuck, restarts recover it
    src = rng.rand(96, 3).astype(np.float32) * np.array([2.0, 0.7, 0.3])
    src[:32, 2] += 1.0  # break symmetry
    R = np.asarray(rotz(jnp.asarray(2.6)))
    dst = src @ R.T + np.array([1.0, 0.5, 0.0], np.float32)
    res = random_restart_icp(
        jnp.asarray(src), jnp.asarray(dst), jax.random.PRNGKey(0),
        n_tries=64, threshold=0.3, iters=40,
    )
    assert float(res.fitness) > 0.9


def test_generate_sdf_sphere():
    # surface samples of a unit sphere
    rng = np.random.RandomState(0)
    d = rng.randn(5000, 3)
    pts = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    sdf, centroid, extents = generate_sdf(pts, dim=64)
    np.testing.assert_allclose(centroid, 0.0, atol=0.05)
    D = sdf.shape[0]
    c = D // 2
    assert sdf[c, c, c] < 0  # center is inside
    assert sdf[0, 0, 0] > 0  # corner is outside
    # |sdf| at center ~ radius 1 (within voxel tolerance)
    assert 0.7 < -sdf[c, c, c] < 1.2


def test_sdf_matches_scipy_fallback():
    from lsdm_tpu.fitting import sdf as sdf_mod

    rng = np.random.RandomState(1)
    d = rng.randn(2000, 3)
    pts = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    native_sdf, c1, e1 = sdf_mod.generate_sdf(pts, dim=32)
    lib = sdf_mod._LIB
    try:
        sdf_mod._LIB = None  # force numpy fallback
        fb_sdf, c2, e2 = sdf_mod.generate_sdf(pts, dim=32)
    finally:
        sdf_mod._LIB = lib
    # same sign structure and similar magnitudes
    agree = np.mean(np.sign(native_sdf) == np.sign(fb_sdf))
    assert agree > 0.97
    np.testing.assert_allclose(np.abs(native_sdf), np.abs(fb_sdf), atol=0.15)


def test_mesh_io_roundtrip(tmp_path, rng):
    verts, faces = grid_mesh(4)
    p = str(tmp_path / "m.obj")
    write_obj(p, verts, faces)
    v2, f2 = load_obj(p)
    np.testing.assert_allclose(v2, verts, atol=1e-5)
    np.testing.assert_array_equal(f2, faces)
    write_ply(str(tmp_path / "m.ply"), verts, faces)
    assert os.path.getsize(str(tmp_path / "m.ply")) > 0
    cands = load_obj_candidates(str(tmp_path))
    assert len(cands) == 1 and cands[0][0] == "m"


def test_merge_meshes():
    v1, f1 = grid_mesh(3)
    v2, f2 = grid_mesh(3)
    v, f = merge_meshes([(v1, f1), (v2 + 5, f2)])
    assert len(v) == 2 * len(v1)
    assert f.max() == 2 * len(v1) - 1


def test_sample_surface_on_mesh():
    verts, faces = grid_mesh(5)  # unit square in xy plane
    pts = sample_surface(verts, faces, 500, seed=0)
    assert pts.shape == (500, 3)
    assert (pts[:, 0] >= -1e-6).all() and (pts[:, 0] <= 1 + 1e-6).all()
    np.testing.assert_allclose(pts[:, 2], 0.0, atol=1e-6)


def test_align_and_center():
    v = np.array([[0, 0, 3], [1, 2, 5]], np.float32)
    out = align_to_floor(v, 1.0)
    assert out[:, 2].min() == 1.0
    c, center = center_xy(out)
    assert abs(c[:, 0].min() + c[:, 0].max()) < 1e-6


def test_cluster_contact_points(rng):
    a = rng.rand(50, 3).astype(np.float32) * 0.1
    b = a + np.array([5, 0, 0], np.float32)
    clusters = cluster_contact_points(np.concatenate([a, b]), class_id=3, eps=0.3)
    assert len(clusters) == 2


def test_vote_contact_points(rng):
    T, V = 4, 100
    verts = rng.rand(T, V, 3).astype(np.float32)
    labels = np.zeros((T, V), np.int32)
    labels[:, :40] = 5  # table contact on a stable subset
    voted = vote_contact_points(verts, labels)
    assert 5 in voted  # mpcat40 id for table
    assert len(voted[5]) > 0


def test_fit_cluster_end_to_end(tmp_path, rng):
    """Tiny but complete fit: one candidate mesh onto an offset cluster."""
    verts, faces = grid_mesh(4)
    verts = verts * 0.4  # small square
    cluster = sample_surface(verts, faces, 64, seed=1) + np.array(
        [1.0, 0.5, 0.0], np.float32
    )
    sdf = np.full((16, 16, 16), 1.0, np.float32)
    obj_id, pts, loss, pose = fit_cluster(
        cluster, [("cand0", verts, faces)], sdf, np.zeros(3), np.ones(3) * 4,
        class_id=5, floor_height=0.0,
        params={
            "grid_search_contact_weight": 100.0,
            "grid_search_pen_thresh": -0.05,
            "grid_search_classes_pen_weight": {5: 10.0},
            "lr": 0.003, "opt_steps": 50,
            "opt_contact_weight": 100.0, "opt_pen_thresh": 0.0,
            "opt_classes_pen_weight": {5: 100.0},
        },
    )
    assert obj_id == "cand0"
    # fitted points land on the cluster
    center_err = np.abs(pts[:, :2].mean(0) - cluster[:, :2].mean(0))
    assert (center_err < 0.3).all()


def test_sample_label_draws_map_and_determinism(rng):
    """fit_prob_obj's label sampler: draw 0 is the argmax/MAP assignment,
    stochastic draws are seed-deterministic and follow the distribution."""
    from lsdm_tpu.run.fit_prob_obj import sample_label_draws

    T, V, C = 3, 200, 8
    logits = rng.randn(T, V, C).astype(np.float32) * 2.0
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)

    draws = sample_label_draws(probs, 4, seed=7)
    assert draws.shape == (4, T, V) and draws.dtype == np.int32
    np.testing.assert_array_equal(draws[0], probs.argmax(-1))
    # seed-deterministic, and logits in == probs in (softmax normalization)
    np.testing.assert_array_equal(draws, sample_label_draws(probs, 4, seed=7))
    np.testing.assert_array_equal(draws, sample_label_draws(logits, 4, seed=7))
    assert (draws[1] != draws[2]).any()  # independent draws differ
    # a near-delta distribution samples its mode (distribution sanity)
    peaked = np.full((1, 50, C), 1e-6, np.float32)
    peaked[..., 3] = 1.0
    assert (sample_label_draws(peaked / peaked.sum(-1, keepdims=True),
                               3, seed=0) == 3).mean() > 0.99
