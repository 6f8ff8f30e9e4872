"""Respaced (DDIM-style) sampling through the fast SDM path."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from lsdm_tpu.config import SDMConfig
from lsdm_tpu.diffusion import make_schedule, spaced_schedule
from lsdm_tpu.models.sampling import sample_sdm
from lsdm_tpu.models.sdm import SceneDiffusionModel

TINY = SDMConfig(clip_dim=32, latent_dim=16, cat_emb=8, n_head=4, vert_dims=24,
                 pcd_points=32)
B, O, N = 1, 9, 32


@pytest.mark.slow
def test_sample_sdm_with_respacing():
    """ddim-respaced schedule + timestep_map conditioning: 5 steps standing
    in for a 20-step process, model sees original-scale timesteps."""
    model = SceneDiffusionModel(TINY)
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    mask = jnp.zeros((B, O)).at[:, 1:3].set(1.0)
    objs = jax.random.normal(ks[1], (B, O, N, 3))
    cats = jax.nn.one_hot(jnp.zeros((B, O), jnp.int32), 13)
    text = jax.random.normal(ks[3], (B, TINY.clip_dim))
    x = jax.random.normal(ks[0], (B, N, 3))
    variables = model.init(ks[4], x, mask, jnp.zeros((B,), jnp.int32), objs,
                           cats, text)

    sched = spaced_schedule("cosine", 20, "ddim5")
    assert sched.num_timesteps == 5
    assert int(sched.timestep_map.max()) >= 15  # maps into the original scale

    sample, last = sample_sdm(
        model, variables, sched, mask, objs, cats, text, jax.random.PRNGKey(7),
        clip_denoised=False, use_ddim=True, timestep_map=sched.timestep_map,
    )
    assert sample.shape == (B, N, 3)
    assert np.isfinite(np.asarray(sample)).all()
    assert last.cat.shape == (B, 1, 13)


@pytest.mark.slow
def test_cond_chunk_bit_equality():
    """Chunked conditioning encode (memory cap, models/sampling.py) matches
    the unchunked path: same math per scene; only XLA's batch tiling (and
    hence fp accumulation order) differs."""
    model = SceneDiffusionModel(TINY)
    B4 = 4
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    mask = jnp.zeros((B4, O)).at[:, 1:3].set(1.0)
    objs = jax.random.normal(ks[1], (B4, O, N, 3))
    cats = jax.nn.one_hot(jnp.zeros((B4, O), jnp.int32), 13)
    text = jax.random.normal(ks[3], (B4, TINY.clip_dim))
    x = jax.random.normal(ks[0], (B4, N, 3))
    variables = model.init(ks[4], x, mask, jnp.zeros((B4,), jnp.int32), objs,
                           cats, text)
    sched = make_schedule("cosine", 8)
    a, la = sample_sdm(model, variables, sched, mask, objs, cats, text,
                       jax.random.PRNGKey(9), clip_denoised=False)
    b, lb = sample_sdm(model, variables, sched, mask, objs, cats, text,
                       jax.random.PRNGKey(9), clip_denoised=False,
                       cond_chunk=2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)
    np.testing.assert_allclose(np.asarray(la.cat), np.asarray(lb.cat),
                               atol=5e-3)


@pytest.mark.slow  # ~58 s: two full sampling compiles at the tiny config
def test_precomputed_emb_table_bit_equality():
    """The timestep-embedding-table fast path (models/sampling.py) must be
    numerically identical (to float-noise ulps) to the per-step recompute
    path: same ops on the same values, just hoisted out of the scan."""
    model = SceneDiffusionModel(TINY)
    ks = jax.random.split(jax.random.PRNGKey(2), 5)
    mask = jnp.zeros((B, O)).at[:, 1:3].set(1.0)
    objs = jax.random.normal(ks[1], (B, O, N, 3))
    cats = jax.nn.one_hot(jnp.zeros((B, O), jnp.int32), 13)
    text = jax.random.normal(ks[3], (B, TINY.clip_dim))
    x = jax.random.normal(ks[0], (B, N, 3))
    variables = model.init(ks[4], x, mask, jnp.zeros((B,), jnp.int32), objs,
                           cats, text)
    sched = make_schedule("cosine", 16)
    a, la = sample_sdm(model, variables, sched, mask, objs, cats, text,
                       jax.random.PRNGKey(9), clip_denoised=False,
                       precompute_emb=False)
    b, lb = sample_sdm(model, variables, sched, mask, objs, cats, text,
                       jax.random.PRNGKey(9), clip_denoised=False,
                       precompute_emb=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(la.cat), np.asarray(lb.cat))
    np.testing.assert_allclose(np.asarray(la.guiding), np.asarray(lb.guiding),
                               atol=1e-6)
    # respaced DDIM fast path too
    rs = spaced_schedule("cosine", 16, "ddim4")
    c, _ = sample_sdm(model, variables, rs, mask, objs, cats, text,
                      jax.random.PRNGKey(9), clip_denoised=False,
                      use_ddim=True, timestep_map=rs.timestep_map,
                      precompute_emb=False)
    d, _ = sample_sdm(model, variables, rs, mask, objs, cats, text,
                      jax.random.PRNGKey(9), clip_denoised=False,
                      use_ddim=True, timestep_map=rs.timestep_map,
                      precompute_emb=True)
    np.testing.assert_allclose(np.asarray(c), np.asarray(d), rtol=1e-6,
                               atol=1e-6)


def test_resolve_fast_path_cpu_semantics():
    """Round-4 default promotion (PERF.md): on a CPU backend 'auto' keeps
    the composed path (fused kernels would hit the Pallas interpreter);
    explicit choices pass through; 'none' forces the composed scan.  The
    TPU side of the resolution ('auto' -> fused+chain) is exercised by
    the driver bench and pinned by the on-chip equivalence protocol
    (tools/onchip_equiv.py)."""
    from lsdm_tpu.models.sampling import resolve_fast_path

    assert jax.default_backend() == "cpu"  # conftest pins cpu
    assert resolve_fast_path("auto", "auto") == ("auto", None)
    assert resolve_fast_path("auto", None) == ("auto", None)
    assert resolve_fast_path("fused", "chain") == ("fused", "chain")
    assert resolve_fast_path("topk", "none") == ("topk", None)
    assert resolve_fast_path("fused", "step") == ("fused", "step")


def test_resolve_train_ball_impl_cpu_semantics():
    """Round-4 train-default promotion (PERF.md "Training default"): on a
    CPU backend 'auto' stays 'auto' (the model resolves it to the TopK
    custom call; the Pallas kernel would run in interpret mode), and
    explicit choices always pass through.  The TPU side ('auto' ->
    'pallas', 13.36 steps/s) is measured in .bench_logs/bt_pallas_bq."""
    from lsdm_tpu.models.sampling import resolve_train_ball_impl

    assert jax.default_backend() == "cpu"  # conftest pins cpu
    assert resolve_train_ball_impl("auto") == "auto"
    assert resolve_train_ball_impl("topk") == "topk"
    assert resolve_train_ball_impl("pallas") == "pallas"
    assert resolve_train_ball_impl("topk2c") == "topk2c"
