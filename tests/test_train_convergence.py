"""End-to-end training sanity: a tiny SDM overfits one fixed batch."""

import jax

import pytest

pytestmark = pytest.mark.slow
import jax.numpy as jnp
import numpy as np

from lsdm_tpu.config import SDMConfig
from lsdm_tpu.diffusion import make_schedule
from lsdm_tpu.models.sdm import SceneDiffusionModel
from lsdm_tpu.train.state import create_train_state, make_optimizer
from lsdm_tpu.train.trainer import make_train_step

TINY = SDMConfig(clip_dim=32, latent_dim=16, cat_emb=8, n_head=4, vert_dims=24,
                 pcd_points=32)


def test_overfits_single_batch():
    B, O, N = 2, 9, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    mask = jnp.zeros((B, O)).at[:, 1:4].set(1.0)
    objs = jax.random.normal(ks[1], (B, O, N, 3)) * 0.3
    cats = jax.nn.one_hot(jax.random.randint(ks[2], (B, O), 0, 13), 13)
    text = jax.random.normal(ks[3], (B, TINY.clip_dim))
    target = jax.random.normal(ks[0], (B, N, 3)) * 0.2 + 0.3
    target_cat = jax.nn.one_hot(jnp.array([2, 5]), 13)

    model = SceneDiffusionModel(TINY)
    schedule = make_schedule("cosine", 16)
    tx = make_optimizer(lr=3e-3)
    variables = model.init(ks[4], target, mask, jnp.zeros((B,), jnp.int32),
                           objs, cats, text)
    state = create_train_state(variables, tx)
    step = make_train_step(model, schedule, tx)

    losses = []
    for i in range(60):
        state, metrics = step(state, mask, objs, cats, target, target_cat,
                              text, jax.random.fold_in(jax.random.PRNGKey(1), i))
        losses.append(float(metrics["loss"]))
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert np.isfinite(losses).all()
    assert last < 0.5 * first, f"no convergence: {first:.4f} -> {last:.4f}"
    # the category head should be learning too
    assert float(metrics["cat_loss"]) < 0.1 * np.log(13) + 0.05
