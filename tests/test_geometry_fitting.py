"""Tests: rotations, geometry utils, fitting losses/grid-search, recon metrics."""

import jax
import jax.numpy as jnp
import numpy as np

from lsdm_tpu.ops.rotations import (
    axis_angle_to_matrix,
    matrix_to_axis_angle,
    quaternion_to_matrix,
    matrix_to_quaternion,
    rotation_6d_to_matrix,
    matrix_to_rotation_6d,
    rotz,
    euler_to_matrix,
)
from lsdm_tpu.ops.geometry import (
    rotation_matrix_from_vectors,
    normalize_orientation,
    read_sdf,
    oriented_bbox,
    translate_objs_to_bbox,
    translate_bbox_obj,
    estimate_floor_height,
)
from lsdm_tpu.fitting.place_obj import (
    contact_loss,
    penetration_loss,
    compute_signed_distances,
    grid_search,
    refine_pose,
)
from lsdm_tpu.ops.recon_metrics import (
    compute_recon_loss,
    compute_iou,
    compute_f1_score,
    compute_consistency_metric,
)


# ---------------- rotations ----------------


def test_rotation_roundtrips(rng):
    aa = rng.randn(8, 3).astype(np.float32) * 0.8
    R = axis_angle_to_matrix(jnp.asarray(aa))
    # orthonormal, det 1
    eye = np.einsum("bij,bkj->bik", np.asarray(R), np.asarray(R))
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)
    # axis-angle roundtrip
    aa2 = np.asarray(matrix_to_axis_angle(R))
    np.testing.assert_allclose(aa2, aa, atol=1e-4)
    # quaternion roundtrip
    q = matrix_to_quaternion(R)
    R2 = quaternion_to_matrix(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
    # 6d roundtrip
    R3 = rotation_6d_to_matrix(matrix_to_rotation_6d(R))
    np.testing.assert_allclose(np.asarray(R3), np.asarray(R), atol=1e-5)


def test_rotz_matches_axis_angle():
    theta = jnp.asarray(0.7)
    R1 = rotz(theta)
    R2 = axis_angle_to_matrix(jnp.asarray([0.0, 0.0, 0.7]))
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=1e-6)


def test_euler_sxyz():
    R = euler_to_matrix(jnp.asarray(np.pi / 2), jnp.asarray(0.0), jnp.asarray(0.0))
    v = np.asarray(R) @ np.array([0, 1, 0.0])
    np.testing.assert_allclose(v, [0, 0, 1], atol=1e-6)


# ---------------- geometry ----------------


def test_rotation_matrix_from_vectors():
    R = rotation_matrix_from_vectors([1, 0, 0], [0, 1, 0])
    np.testing.assert_allclose(R @ np.array([1, 0, 0]), [0, 1, 0], atol=1e-9)


def test_normalize_orientation_faces_x(rng):
    # 10 verts of joint 1 at +y offset, 10 of joint 2 at -y: direction = +y
    T, V = 3, 20
    verts = rng.randn(T, V, 3).astype(np.float32) * 0.01
    verts[:, :10, 1] += 1.0
    verts[:, 10:, 1] -= 1.0
    joints = np.array([1] * 10 + [2] * 10)
    out = np.asarray(normalize_orientation(jnp.asarray(verts), joints))
    # after rotation the joint1-joint2 direction aligns with +x
    d = out[0, :10].mean(0) - out[0, 10:].mean(0)
    d[2] = 0
    d = d / np.linalg.norm(d)
    np.testing.assert_allclose(d, [1, 0, 0], atol=1e-2)


def test_read_sdf_trilinear():
    D = 8
    # sdf(x, y, z) = x grid coordinate / (D-1)
    grid = np.broadcast_to(
        np.linspace(0, 1, D)[:, None, None], (D, D, D)
    ).astype(np.float32)
    grid_min = jnp.asarray([0.0, 0.0, 0.0])
    grid_max = jnp.asarray([1.0, 1.0, 1.0])
    pts = jnp.asarray([[[0.5, 0.3, 0.7], [0.25, 0.9, 0.1], [2.0, 0.5, 0.5]]])
    vals = np.asarray(read_sdf(pts, jnp.asarray(grid), grid_min, grid_max))
    np.testing.assert_allclose(vals[0, 0], 0.5, atol=1e-5)
    np.testing.assert_allclose(vals[0, 1], 0.25, atol=1e-5)
    np.testing.assert_allclose(vals[0, 2], 1.0, atol=1e-5)  # border clamp


def test_oriented_bbox_recovers_box(rng):
    # axis-aligned box rotated by a known rotation
    extent = np.array([2.0, 1.0, 0.5])
    local = (rng.rand(500, 3) - 0.5) * extent
    theta = 0.6
    R = np.asarray(rotz(jnp.asarray(theta)))
    center = np.array([1.0, -2.0, 0.3])
    pts = local @ R.T + center
    c, rot, e = oriented_bbox(pts)
    np.testing.assert_allclose(c, center, atol=0.05)
    np.testing.assert_allclose(sorted(e), sorted(extent), atol=0.1)


def test_translate_bbox_roundtrip(rng):
    objs = rng.randn(2, 200, 3).astype(np.float32)
    centers, sizes = translate_objs_to_bbox(objs)
    assert centers.shape == (2, 3) and sizes.shape == (2, 3)
    pts = translate_bbox_obj(centers[0], sizes[0], 128)
    assert pts.shape == (128, 3)
    # sampled points stay inside the axis-aligned bbox of the size
    assert (np.abs(pts - centers[0]) <= sizes[0] / 2 + 1e-5).all()


def test_estimate_floor_height(rng):
    # dense floor at z=0.05, sparse noise above
    floor = rng.rand(500, 3).astype(np.float32)
    floor[:, 2] = 0.05 + rng.randn(500).astype(np.float32) * 0.001
    noise = rng.rand(50, 3).astype(np.float32)
    noise[:, 2] = rng.rand(50) * 2 + 0.5
    h = estimate_floor_height(np.concatenate([floor, noise]))
    assert abs(h - 0.05) < 0.02


# ---------------- fitting ----------------


def test_contact_loss_zero_when_touching(rng):
    pts = jnp.asarray(rng.randn(20, 3).astype(np.float32))
    assert float(contact_loss(pts, pts)) < 1e-4
    far = float(contact_loss(pts, pts + 10.0))
    assert far > 100


def test_penetration_loss_sign():
    D = 8
    sdf = np.full((D, D, D), 1.0, np.float32)  # all outside -> no penalty
    centroid = jnp.zeros(3)
    extents = jnp.asarray([2.0, 2.0, 2.0])
    pts = jnp.asarray(np.random.RandomState(0).randn(10, 3).astype(np.float32) * 0.3)
    assert float(penetration_loss(jnp.asarray(sdf), centroid, extents, pts)) == 0.0
    sdf_neg = np.full((D, D, D), -0.5, np.float32)  # all inside -> penalty
    assert float(penetration_loss(jnp.asarray(sdf_neg), centroid, extents, pts)) > 0


def test_grid_search_finds_translation(rng):
    """Object must slide onto the contact cluster."""
    obj = (rng.rand(64, 3).astype(np.float32) - 0.5) * 0.4  # centered blob
    contact = obj + np.array([2.0, -1.0, 0.0], np.float32)  # same shape, offset
    sdf = np.full((8, 8, 8), 1.0, np.float32)  # no penetration anywhere
    res = grid_search(
        obj, np.zeros(2, np.float32), contact, sdf, np.zeros(3), np.ones(3) * 4
    )
    # recovered translation moves the object onto the cluster
    np.testing.assert_allclose(
        [float(res.transl_x), float(res.transl_y)], [2.0, -1.0], atol=0.25
    )
    assert float(res.loss) < 10.0


def test_refine_pose_improves(rng):
    obj = (rng.rand(64, 3).astype(np.float32) - 0.5) * 0.4
    contact = obj + np.array([0.3, 0.1, 0.0], np.float32)
    sdf = np.full((8, 8, 8), 1.0, np.float32)
    res = refine_pose(
        obj, np.zeros(2, np.float32), 0.0, contact, sdf, np.zeros(3),
        np.ones(3) * 4, opt_steps=100,
    )
    # optimizer should close most of the 0.32-offset gap
    assert float(res.loss) < float(contact_loss(jnp.asarray(contact), jnp.asarray(obj)))


# ---------------- recon metrics ----------------


def test_recon_loss_and_acc():
    gt = jnp.asarray([[0, 1, 2, 0]])
    logits = jax.nn.one_hot(jnp.asarray([[0, 1, 0, 0]]), 8) * 10.0
    loss, acc = compute_recon_loss(gt, logits)
    assert float(acc) == 0.75
    mask = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
    _, acc_m = compute_recon_loss(gt, logits, mask)
    assert float(acc_m) == 1.0


def test_iou_f1():
    gt = jnp.asarray([0, 1, 1, 0])
    pred = jnp.asarray([0, 1, 0, 0])
    assert abs(float(compute_iou(gt, pred)) - 0.5) < 1e-6
    assert abs(float(compute_f1_score(gt, pred)) - 2 / 3) < 1e-6


def test_consistency_metric():
    # two clusters; one point mislabeled inside its neighborhood
    verts = jnp.asarray(
        [[0, 0, 0], [0.01, 0, 0], [0.02, 0, 0], [5, 5, 5]], jnp.float32
    )
    labels = jnp.asarray([1, 1, 2, 3])
    m = float(compute_consistency_metric(verts, labels, eps=0.1))
    # point 2 disagrees with its cluster's mode; points 0,1 agree; 3 isolated ok
    assert 0.2 < m < 0.5
