"""Alternate backbone tests: DGCNN, STGCN, and SDM wiring of both."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from lsdm_tpu.config import SDMConfig
from lsdm_tpu.models.dgcnn import DGCNN, edge_features
from lsdm_tpu.models.stgcn import STGCN, virtualroom_adjacency
from lsdm_tpu.models.sdm import SceneDiffusionModel


def test_edge_features_semantics(rng):
    x = jnp.asarray(rng.randn(2, 16, 3).astype(np.float32))
    e = edge_features(x, 4)
    assert e.shape == (2, 16, 4, 6)
    # nearest neighbour of each point is itself -> first slot: (0, x_i)
    np.testing.assert_allclose(np.asarray(e[:, :, 0, :3]), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(e[:, :, 0, 3:]), np.asarray(x), atol=1e-6)


def test_dgcnn_shapes(rng):
    m = DGCNN(emb_dims=32, k=4, output_channels=16 * 3)
    x = jnp.asarray(rng.randn(2, 16, 3).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert out.shape == (2, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_virtualroom_adjacency_properties():
    A = virtualroom_adjacency(64, max_hop=5)
    assert A.shape == (11, 64, 64)
    # partitions are disjoint: summed over K gives the normalized adjacency,
    # column sums of which are 1 for reachable columns
    total = A.sum(0)
    cols = total.sum(0)
    np.testing.assert_allclose(cols[cols > 0], 1.0, atol=1e-6)
    # nodes beyond the skeleton (>=53) are self-loop only
    assert total[60, 61] == 0 and total[60, 60] > 0


def test_stgcn_shapes(rng):
    m = STGCN(joint_num=64, out_channels=64 * 3)
    x = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert out.shape == (2, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_sdm_with_alternate_backbones(rng):
    cfg = SDMConfig(
        clip_dim=32, latent_dim=16, cat_emb=8, n_head=4, vert_dims=24,
        pcd_points=32, pcd_backbone_type="DGCNN", human_backbone_type="P2R",
    )
    B, O, N = 1, 9, 32
    model = SceneDiffusionModel(cfg)
    x = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    mask = jnp.zeros((B, O)).at[:, 1:3].set(1.0)
    t = jnp.zeros((B,), jnp.int32)
    objs = jnp.asarray(rng.randn(B, O, N, 3).astype(np.float32))
    cats = jax.nn.one_hot(jnp.zeros((B, O), jnp.int32), 13)
    text = jnp.asarray(rng.randn(B, cfg.clip_dim).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, mask, t, objs, cats, text)
    out = model.apply(variables, x, mask, t, objs, cats, text)
    assert out.x0.shape == (B, N, 3)
    assert out.cat.shape == (B, 1, 13)
    assert np.isfinite(np.asarray(out.x0)).all()


@pytest.mark.slow
def test_pointnet2_bn_dtype_bf16_close(rng):
    """bn_dtype=bfloat16 keeps params/stats fp32 and stays numerically close
    to the fp32-BN path (it only changes compute/materialization width)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lsdm_tpu.models.pointnet2 import PointNet2Backbone

    xyz = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
    kw = dict(out_dim=3, sa_npoints=(64, 16, 4, 2), sa_nsample=16)
    ref = PointNet2Backbone(**kw)
    alt = PointNet2Backbone(bn_dtype=jnp.bfloat16, **kw)
    variables = ref.init(jax.random.PRNGKey(0), xyz)
    # identical param tree (bn_dtype must not change structure or dtypes)
    chex_tree = jax.tree.map(lambda a: (a.shape, a.dtype), variables)
    chex_tree2 = jax.tree.map(
        lambda a: (a.shape, a.dtype), alt.init(jax.random.PRNGKey(0), xyz))
    assert jax.tree.all(
        jax.tree.map(lambda a, b: a == b, chex_tree, chex_tree2))
    out_ref = ref.apply(variables, xyz)
    out_alt = alt.apply(variables, xyz)
    assert out_alt.dtype == out_ref.dtype
    np.testing.assert_allclose(
        np.asarray(out_ref), np.asarray(out_alt), atol=0.05)
