"""SceneDiffusionModel integration tests (tiny config, CPU).

Kept deliberately coarse — each jitted apply costs ~1 min of XLA CPU compile
time, so assertions are batched per compile.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lsdm_tpu.config import SDMConfig
from lsdm_tpu.diffusion import make_schedule, training_losses, p_sample_loop
from lsdm_tpu.models.sdm import SceneDiffusionModel

TINY = SDMConfig(
    clip_dim=32,
    latent_dim=16,
    cat_emb=8,
    n_head=4,
    vert_dims=24,
    pcd_points=32,
    max_cats=13,
    translation_params=12,
    pcd_dim=3,
)
B, O, N = 2, 9, 32


def make_inputs(key):
    ks = jax.random.split(key, 4)
    x = jax.random.normal(ks[0], (B, N, 3))
    mask = jnp.zeros((B, O)).at[:, 1:4].set(1.0)  # human slot 0 stays 0
    t = jnp.array([3, 7], jnp.int32)
    objs = jax.random.normal(ks[1], (B, O, N, 3))
    cats = jax.nn.one_hot(jax.random.randint(ks[2], (B, O), 0, 13), 13)
    text = jax.random.normal(ks[3], (B, TINY.clip_dim))
    return x, mask, t, objs, cats, text


@pytest.fixture(scope="module")
def model_and_params():
    model = SceneDiffusionModel(TINY)
    variables = model.init(jax.random.PRNGKey(1), *make_inputs(jax.random.PRNGKey(0)))
    return model, variables


def test_forward_contract(model_and_params):
    """Shapes, softmax normalization, determinism, GELU output bound."""
    model, variables = model_and_params
    inputs = make_inputs(jax.random.PRNGKey(2))
    apply = jax.jit(lambda *a: model.apply(variables, *a))
    out = apply(*inputs)
    assert out.x0.shape == (B, N, 3)
    assert out.cat.shape == (B, 1, 13)
    assert out.guiding.shape == (B, N, 3)
    np.testing.assert_allclose(np.asarray(out.cat.sum(-1)), 1.0, rtol=1e-5)
    assert np.isfinite(np.asarray(out.x0)).all()
    # determinism (same compiled fn, same inputs)
    out2 = apply(*inputs)
    np.testing.assert_array_equal(np.asarray(out.x0), np.asarray(out2.x0))
    # reference quirk: final GELU bounds outputs below at ~-0.17
    assert float(out.x0.min()) > -0.2


@pytest.mark.slow  # 26 s: end-to-end grad compile of the full model
def test_loss_and_gradients(model_and_params):
    """Chamfer+CE loss is finite and differentiable end-to-end."""
    model, variables = model_and_params
    sched = make_schedule("cosine", 10)
    x, mask, t, objs, cats, text = make_inputs(jax.random.PRNGKey(5))
    target_cat = jax.nn.one_hot(jnp.array([2, 5]), 13)
    noise = jax.random.normal(jax.random.PRNGKey(6), x.shape)

    def loss_fn(params):
        def model_fn(x_t, tt):
            return model.apply(
                {**variables, "params": params}, x_t, mask, tt, objs, cats, text
            )

        terms = training_losses(sched, model_fn, x, t, target_cat, noise)
        return terms["loss"], terms

    (loss, terms), grads = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(
        variables["params"]
    )
    assert np.isfinite(float(loss))
    assert float(terms["cat_loss"]) > 0
    flat = jax.tree.leaves(jax.tree.map(lambda g: float(jnp.abs(g).sum()), grads))
    assert all(np.isfinite(f) for f in flat)
    nonzero = sum(f > 0 for f in flat)
    assert nonzero / len(flat) > 0.7


def test_sampling_with_sdm(model_and_params):
    model, variables = model_and_params
    sched = make_schedule("cosine", 3)
    x, mask, t, objs, cats, text = make_inputs(jax.random.PRNGKey(9))

    def model_fn(x_t, tt):
        return model.apply(variables, x_t, mask, tt, objs, cats, text)

    sample, last = jax.jit(
        lambda key: p_sample_loop(sched, model_fn, (B, N, 3), key, clip_denoised=False)
    )(jax.random.PRNGKey(10))
    assert sample.shape == (B, N, 3)
    assert np.isfinite(np.asarray(sample)).all()
    assert last.cat.shape == (B, 1, 13)
    assert last.guiding.shape == (B, N, 3)


def test_batchnorm_stats_update_in_train_mode(model_and_params):
    model, variables = model_and_params
    x, mask, t, objs, cats, text = make_inputs(jax.random.PRNGKey(11))
    out, mutated = model.apply(
        variables, x, mask, t, objs, cats, text, True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(12)},
    )
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
    )
    assert changed


def test_split_conditioning_equals_full(model_and_params):
    """encode_conditioning + denoise_from_cond == __call__ exactly (the fast
    sampling path reuses conditioning across steps)."""
    model, variables = model_and_params
    x, mask, t, objs, cats, text = make_inputs(jax.random.PRNGKey(20))
    full = model.apply(variables, x, mask, t, objs, cats, text)
    cond = model.apply(variables, mask, objs, cats, text,
                       method=model.encode_conditioning)
    split = model.apply(variables, cond, x, t, method=model.denoise_from_cond)
    np.testing.assert_array_equal(np.asarray(full.x0), np.asarray(split.x0))
    np.testing.assert_array_equal(np.asarray(full.cat), np.asarray(split.cat))
    np.testing.assert_array_equal(np.asarray(full.guiding),
                                  np.asarray(split.guiding))


@pytest.mark.slow  # 21 s: compiles BOTH the fast and the naive sampler
def test_sample_sdm_matches_naive_sampler(model_and_params):
    """The fast sampler (cond once + scanned tail) equals scanning the full
    model bit-for-bit (same key)."""
    from lsdm_tpu.models.sampling import sample_sdm

    model, variables = model_and_params
    sched = make_schedule("cosine", 4)
    x, mask, t, objs, cats, text = make_inputs(jax.random.PRNGKey(21))

    def model_fn(x_t, tt):
        return model.apply(variables, x_t, mask, tt, objs, cats, text)

    naive, naive_last = jax.jit(
        lambda k: p_sample_loop(sched, model_fn, (B, N, 3), k, clip_denoised=False)
    )(jax.random.PRNGKey(22))
    fast, fast_last = jax.jit(
        lambda k: sample_sdm(model, variables, sched, mask, objs, cats, text, k,
                             clip_denoised=False)
    )(jax.random.PRNGKey(22))
    np.testing.assert_allclose(np.asarray(naive), np.asarray(fast), atol=1e-5)
    np.testing.assert_allclose(np.asarray(naive_last.cat),
                               np.asarray(fast_last.cat), atol=1e-6)


@pytest.mark.slow  # interpret-mode kernels inside the full encode
def test_encode_conditioning_fused_matches_composed():
    """SDMConfig(ball_impl="fused") eval encode (fused SA/FP/FPS stages +
    rank-1 pcd_attention kernel, ops/attn_pallas.py) == the composed
    encode on the same params."""
    import dataclasses

    cfg_f = dataclasses.replace(TINY, ball_impl="fused")
    m_ref = SceneDiffusionModel(TINY)
    m_f = SceneDiffusionModel(cfg_f)
    x, mask, t, objs, cats, text = make_inputs(jax.random.PRNGKey(0))
    v = m_ref.init(jax.random.PRNGKey(1), x, mask, t, objs, cats, text)

    ref = m_ref.apply(v, mask, objs, cats, text,
                      method=SceneDiffusionModel.encode_conditioning)
    out = m_f.apply(v, mask, objs, cats, text,
                    method=SceneDiffusionModel.encode_conditioning)
    np.testing.assert_allclose(np.asarray(out.cond_pcd),
                               np.asarray(ref.cond_pcd),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.enc_text),
                               np.asarray(ref.enc_text), atol=1e-6)
