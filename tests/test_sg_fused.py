"""Fused select+gather kernel (ops/sg_fused_pallas.py, ball_impl="sg").

Equivalence targets:
* forward == the composed pallas-ball-query + gather + center-relative
  path (which itself equals the reference semantics, pinned in
  tests/test_pointcloud_ops.py) — exact in bf16, ~exact in fp32;
* backward == the matmul-gather formulation's gradients (the kernel's
  VJP IS the shared onehot_segment_sum plus the center term);
* module-level: PointNetSetAbstraction(ball_impl="sg") matches the
  composed module in both modes, including under jax.grad.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lsdm_tpu.ops.pointcloud import (index_points, index_points_mm,
                                     query_ball_point)
from lsdm_tpu.ops.sg_fused_pallas import select_gather_grouped


def _composed(radius, nsample, xyz, new_xyz, base):
    """The exact composed formulation the kernel replaces."""
    idx = query_ball_point(radius, nsample, xyz, new_xyz, impl="scan")
    grouped = index_points(base, idx)
    center = new_xyz[:, :, None, :].astype(grouped.dtype)
    return jnp.concatenate(
        [grouped[..., :3] - center, grouped[..., 3:]], axis=-1)


def _mk(B=2, N=64, S=16, C=9, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    xyz = jax.random.uniform(k1, (B, N, 3), minval=-1, maxval=1)
    feats = jax.random.normal(k2, (B, N, C - 3))
    base = jnp.concatenate([xyz, feats], axis=-1)
    new_xyz = xyz[:, :S]
    return xyz, new_xyz, base


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_sg_forward_matches_composed(dtype):
    xyz, new_xyz, base = _mk()
    b = base.astype(dtype)
    out = select_gather_grouped(0.4, 8, dtype, True, xyz, new_xyz, b)
    ref = _composed(0.4, 8, xyz, new_xyz, b)
    assert out.dtype == ref.dtype
    tol = 0 if dtype == jnp.bfloat16 else 2e-6
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=tol)


def test_sg_forward_empty_balls_and_empty_slots():
    """Radius small enough that some rows have few/no in-radius points:
    empty slots repeat the first in-radius index (reference quirk) and
    fully-empty rows gather point 0 — both must match the composed path."""
    xyz, new_xyz, base = _mk(seed=3)
    # centers NOT in the source set -> fully-empty rows possible
    far = new_xyz + 10.0
    out = select_gather_grouped(0.05, 8, jnp.float32, True, xyz, far, base)
    ref = _composed(0.05, 8, xyz, far, base)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_sg_grads_match_matmul_gather_formulation():
    """The VJP must equal the promoted composed train path's gradients
    (pallas ball query under stop_gradient + matmul fwd+bwd gather):
    grad wrt base and new_xyz match; grad wrt the distance operand is
    zero in both."""
    xyz, new_xyz, base = _mk(seed=1)

    def loss_sg(b, q, x):
        out = select_gather_grouped(0.4, 8, jnp.float32, True, x, q, b)
        return jnp.sum(out ** 2)

    def loss_comp(b, q, x):
        idx = query_ball_point(0.4, 8, jax.lax.stop_gradient(x),
                               jax.lax.stop_gradient(q), impl="scan")
        grouped = index_points_mm(b, idx, x.shape[1], "matmul")
        center = q[:, :, None, :]
        out = jnp.concatenate(
            [grouped[..., :3] - center, grouped[..., 3:]], axis=-1)
        return jnp.sum(out ** 2)

    gs = jax.grad(loss_sg, argnums=(0, 1, 2))(base, new_xyz, xyz)
    gc = jax.grad(loss_comp, argnums=(0, 1, 2))(base, new_xyz, xyz)
    # base: both run the one-hot segment-sum (bf16-grade), same code path
    np.testing.assert_allclose(np.asarray(gs[0]), np.asarray(gc[0]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gs[1]), np.asarray(gc[1]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gs[2]), np.asarray(gc[2]))


def test_sa_module_sg_matches_composed_train_and_grads():
    """PointNetSetAbstraction(ball_impl='sg') == the composed module:
    same params tree, same train-mode forward (incl. batch_stats), and
    matching input gradients through conv/BN/maxpool."""
    from lsdm_tpu.models.pointnet2 import PointNetSetAbstraction

    B, N, S = 2, 32, 16
    xyz = jax.random.uniform(jax.random.PRNGKey(5), (B, N, 3))
    pts = jax.random.normal(jax.random.PRNGKey(6), (B, N, 4))

    sa_sg = PointNetSetAbstraction(S, 0.4, 8, (8, 16), ball_impl="sg",
                                   gather_bwd="matmul_fwd")
    sa_cp = PointNetSetAbstraction(S, 0.4, 8, (8, 16), ball_impl="pallas",
                                   gather_bwd="matmul_fwd")
    v = sa_sg.init(jax.random.PRNGKey(7), xyz, pts, train=True,
                   fps_key=jax.random.PRNGKey(8))
    v2 = sa_cp.init(jax.random.PRNGKey(7), xyz, pts, train=True,
                    fps_key=jax.random.PRNGKey(8))
    assert jax.tree.structure(v) == jax.tree.structure(v2)

    def run(mod, p):
        (nx, np_), st = mod.apply(v, xyz, p, True,
                                  jax.random.PRNGKey(8),
                                  mutable=["batch_stats"])
        return nx, np_, st

    nx1, o1, st1 = run(sa_sg, pts)
    nx2, o2, st2 = run(sa_cp, pts)
    np.testing.assert_allclose(np.asarray(nx1), np.asarray(nx2))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               atol=2e-5, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(st1), jax.tree.leaves(st2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-5)

    def loss(mod, p):
        (_, out), _ = mod.apply(v, xyz, p, True, jax.random.PRNGKey(8),
                                mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    g1 = jax.grad(lambda p: loss(sa_sg, p))(pts)
    g2 = jax.grad(lambda p: loss(sa_cp, p))(pts)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=2e-4, rtol=1e-4)


def test_sg_declines_to_composed_on_odd_shapes():
    """S % 8 != 0 or xyz-only stages fall back to the composed path
    (module still produces correct output, no kernel call)."""
    from lsdm_tpu.models.pointnet2 import PointNetSetAbstraction

    B, N = 2, 24
    xyz = jax.random.uniform(jax.random.PRNGKey(9), (B, N, 3))
    pts = jax.random.normal(jax.random.PRNGKey(10), (B, N, 4))
    sa = PointNetSetAbstraction(12, 0.4, 8, (8,), ball_impl="sg")
    sa_t = PointNetSetAbstraction(12, 0.4, 8, (8,), ball_impl="topk")
    v = sa.init(jax.random.PRNGKey(11), xyz, pts, train=False,
                fps_key=jax.random.PRNGKey(12))
    (_, o1) = sa.apply(v, xyz, pts, False, jax.random.PRNGKey(12))
    (_, o2) = sa_t.apply(v, xyz, pts, False, jax.random.PRNGKey(12))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               atol=2e-5, rtol=1e-5)
