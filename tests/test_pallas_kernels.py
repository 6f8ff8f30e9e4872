"""Pallas kernel parity tests (interpret mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from lsdm_tpu.ops.chamfer_pallas import chamfer_distance_pallas
from lsdm_tpu.ops.pointcloud import chamfer_distance


def test_chamfer_pallas_matches_xla(rng):
    x = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32))
    y = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32))
    ref = float(chamfer_distance(x, y))
    got = float(chamfer_distance_pallas(x, y, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_chamfer_pallas_zero_identical(rng):
    x = jnp.asarray(rng.randn(1, 128, 3).astype(np.float32))
    assert float(chamfer_distance_pallas(x, x, interpret=True)) < 1e-6


def test_chamfer_pallas_is_differentiable(rng):
    x = jnp.asarray(rng.randn(1, 128, 3).astype(np.float32))
    y = jnp.asarray(rng.randn(1, 128, 3).astype(np.float32))
    g = jax.grad(lambda a: chamfer_distance_pallas(a, y, interpret=True))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_chamfer_pallas_grad_matches_xla(rng):
    """Custom VJP vs autodiff through the XLA chamfer."""
    x = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32))
    y = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32))
    g_ref = jax.grad(lambda a: chamfer_distance(a, y))(x)
    g_pal = jax.grad(lambda a: chamfer_distance_pallas(a, y, True))(x)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), atol=1e-5)
    gy_ref = jax.grad(lambda b: chamfer_distance(x, b))(y)
    gy_pal = jax.grad(lambda b: chamfer_distance_pallas(x, b, True))(y)
    np.testing.assert_allclose(np.asarray(gy_pal), np.asarray(gy_ref), atol=1e-5)
