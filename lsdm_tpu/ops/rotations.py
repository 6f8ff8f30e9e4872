"""Rotation representation conversions in JAX.

Functional equivalent of the reference's ``util/rotation_conversions.py``
(a pytorch3d-style library) plus the Euler-angle helpers from
``posa/eulerangles.py`` that ``load_scene_data`` uses.  All functions are
batched over leading dimensions and jit/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quaternion_to_matrix(q: jax.Array) -> jax.Array:
    """(..., 4) wxyz -> (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        -2,
    )


def matrix_to_quaternion(m: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 4) wxyz; branchless (Shepperd via max trace)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    qw = safe_sqrt(1 + m00 + m11 + m22) / 2
    qx = safe_sqrt(1 + m00 - m11 - m22) / 2
    qy = safe_sqrt(1 - m00 + m11 - m22) / 2
    qz = safe_sqrt(1 - m00 - m11 + m22) / 2
    # pick the largest component's formulation for stability
    cands = jnp.stack(
        [
            jnp.stack([qw, (m21 - m12) / (4 * qw), (m02 - m20) / (4 * qw), (m10 - m01) / (4 * qw)], -1),
            jnp.stack([(m21 - m12) / (4 * qx), qx, (m01 + m10) / (4 * qx), (m02 + m20) / (4 * qx)], -1),
            jnp.stack([(m02 - m20) / (4 * qy), (m01 + m10) / (4 * qy), qy, (m12 + m21) / (4 * qy)], -1),
            jnp.stack([(m10 - m01) / (4 * qz), (m02 + m20) / (4 * qz), (m12 + m21) / (4 * qz), qz], -1),
        ],
        -2,
    )  # (..., 4 candidates, 4)
    mags = jnp.stack([qw, qx, qy, qz], -1)
    best = jnp.argmax(mags, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), -2)[..., 0, :]
    return q * jnp.sign(q[..., :1] + 1e-30)  # canonical w >= 0


def axis_angle_to_matrix(aa: jax.Array) -> jax.Array:
    """(..., 3) Rodrigues -> (..., 3, 3)."""
    angle = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    axis = aa / jnp.maximum(angle, 1e-12)
    x, y, z = jnp.moveaxis(axis, -1, 0)
    zero = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        -2,
    )
    a = angle[..., None]
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    return eye + jnp.sin(a) * K + (1 - jnp.cos(a)) * (K @ K)


def matrix_to_axis_angle(m: jax.Array) -> jax.Array:
    q = matrix_to_quaternion(m)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    angle = 2 * jnp.arccos(w)
    s = jnp.sqrt(jnp.maximum(1 - w * w, 1e-12))
    axis = q[..., 1:] / s[..., None]
    small = angle[..., None] < 1e-6
    return jnp.where(small, q[..., 1:] * 2, axis * angle[..., None])


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """(..., 6) Zhou et al. continuous 6D -> (..., 3, 3) via Gram-Schmidt."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-12)
    a2 = a2 - jnp.sum(b1 * a2, -1, keepdims=True) * b1
    b2 = a2 / jnp.maximum(jnp.linalg.norm(a2, axis=-1, keepdims=True), 1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], -2)


def matrix_to_rotation_6d(m: jax.Array) -> jax.Array:
    return m[..., :2, :].reshape(m.shape[:-2] + (6,))


def euler_to_matrix(ai, aj, ak, axes: str = "sxyz") -> jax.Array:
    """Euler angles -> rotation matrix, 'sxyz' family conventions
    (functional equivalent of ``posa/eulerangles.py`` euler2mat)."""
    if axes == "sxyz":
        Rx = axis_angle_to_matrix(jnp.stack([ai, jnp.zeros_like(ai), jnp.zeros_like(ai)], -1))
        Ry = axis_angle_to_matrix(jnp.stack([jnp.zeros_like(aj), aj, jnp.zeros_like(aj)], -1))
        Rz = axis_angle_to_matrix(jnp.stack([jnp.zeros_like(ak), jnp.zeros_like(ak), ak], -1))
        return Rz @ Ry @ Rx
    if axes == "szyx":
        Rz = axis_angle_to_matrix(jnp.stack([jnp.zeros_like(ai), jnp.zeros_like(ai), ai], -1))
        Ry = axis_angle_to_matrix(jnp.stack([jnp.zeros_like(aj), aj, jnp.zeros_like(aj)], -1))
        Rx = axis_angle_to_matrix(jnp.stack([ak, jnp.zeros_like(ak), jnp.zeros_like(ak)], -1))
        return Rx @ Ry @ Rz
    raise NotImplementedError(axes)


def rotz(theta: jax.Array) -> jax.Array:
    """Rotation about z by theta — the fitting pipeline's pose parameter."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    zero, one = jnp.zeros_like(theta), jnp.ones_like(theta)
    return jnp.stack(
        [
            jnp.stack([c, -s, zero], -1),
            jnp.stack([s, c, zero], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        -2,
    )
