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


def test_training_losses_chamfer_impl_equivalence(rng):
    """chamfer_impl='pallas' produces the same loss/grads as 'xla' in the
    actual training-loss path (128-point clouds, interpret mode)."""
    import jax.numpy as jnp

    from lsdm_tpu.diffusion import make_schedule
    from lsdm_tpu.diffusion.gaussian import DenoiserOutput, training_losses

    schedule = make_schedule("cosine", 10)
    B, N, C = 2, 128, 5
    x_start = jnp.asarray(rng.randn(B, N, 3), jnp.float32)
    noise = jnp.asarray(rng.randn(B, N, 3), jnp.float32)
    t = jnp.array([1, 7])
    target_cat = jax.nn.one_hot(jnp.array([2, 4]), C)
    w0 = jnp.asarray(rng.randn(3, 3) * 0.1, jnp.float32)

    def loss_with(impl, w):
        def model_fn(x_t, tt):
            return DenoiserOutput(
                x0=x_t @ w, cat=jax.nn.softmax(jnp.ones((B, 1, C))))
        return training_losses(schedule, model_fn, x_start, t, target_cat,
                               noise, chamfer_impl=impl)["loss"]

    l_xla, g_xla = jax.value_and_grad(lambda w: loss_with("xla", w))(w0)
    l_pl, g_pl = jax.value_and_grad(lambda w: loss_with("pallas", w))(w0)
    assert abs(float(l_xla) - float(l_pl)) < 1e-5
    import numpy as np

    np.testing.assert_allclose(np.asarray(g_xla), np.asarray(g_pl),
                               atol=1e-5)


import pytest


@pytest.mark.slow  # ~100 s: two 8-step interpret-mode sampling loops
def test_fused_denoise_step_matches_sample_sdm():
    """The fused-kernel sampling path (ops/denoise_pallas.py, interpret
    mode) reproduces sample_sdm: same draws (mirrored key protocol), same
    trajectory to float-fusion tolerance, and the post-loop DenoiserOutput
    agrees with the in-loop one."""
    import jax
    import jax.numpy as jnp

    from lsdm_tpu.config import SDMConfig
    from lsdm_tpu.diffusion import make_schedule
    from lsdm_tpu.models.sampling import sample_sdm
    from lsdm_tpu.models.sdm import SceneDiffusionModel

    cfg = SDMConfig(clip_dim=32, latent_dim=16, cat_emb=8, n_head=4,
                    vert_dims=24, pcd_points=32, max_cats=13)
    B, O, N = 2, 9, cfg.pcd_points
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (B, N, 3))
    mask = jnp.zeros((B, O)).at[:, 1:4].set(1.0)
    objs = jax.random.normal(ks[1], (B, O, N, 3))
    cats = jax.nn.one_hot(jax.random.randint(ks[2], (B, O), 0, 13), 13)
    text = jax.random.normal(ks[3], (B, cfg.clip_dim))
    model = SceneDiffusionModel(cfg)
    variables = model.init(jax.random.PRNGKey(1), x, mask,
                           jnp.zeros((B,), jnp.int32), objs, cats, text)
    schedule = make_schedule("cosine", 8)

    key = jax.random.PRNGKey(42)

    def compare(fused_step=True, **kw):
        s_ref, out_ref = sample_sdm(model, variables, schedule, mask, objs,
                                    cats, text, key, **kw)
        s_fus, out_fus = sample_sdm(model, variables, schedule, mask, objs,
                                    cats, text, key, fused_step=fused_step,
                                    fused_interpret=True, **kw)
        np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_fus),
                                   atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out_ref.x0),
                                   np.asarray(out_fus.x0), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out_ref.guiding),
                                   np.asarray(out_fus.guiding), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out_ref.cat),
                                   np.asarray(out_fus.cat), atol=2e-5)

    compare(clip_denoised=False)
    compare(clip_denoised=True)
    compare(clip_denoised=False, use_ddim=True)  # same kernel, DDIM coefs
    compare(clip_denoised=False, fused_step="chain")  # whole-loop kernel

    # respaced: the e2 table must index MODEL timesteps via timestep_map
    from lsdm_tpu.diffusion import spaced_schedule
    rs = spaced_schedule("cosine", 16, "ddim4")
    s_ref, _ = sample_sdm(model, variables, rs, mask, objs, cats,
                          text, key, clip_denoised=False,
                          timestep_map=rs.timestep_map)
    s_fus, _ = sample_sdm(model, variables, rs, mask, objs, cats,
                          text, key, clip_denoised=False,
                          timestep_map=rs.timestep_map,
                          fused_step=True, fused_interpret=True)
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_fus),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.slow
def test_fused_denoise_step_bf16_matches_composed_bf16():
    """With SDMConfig.dtype=bfloat16 the fused kernel runs its dots in
    bf16 (f32 accum) — bf16-grade agreement with the composed bf16 tail."""
    import jax
    import jax.numpy as jnp

    from lsdm_tpu.config import SDMConfig
    from lsdm_tpu.diffusion import make_schedule
    from lsdm_tpu.models.sampling import sample_sdm
    from lsdm_tpu.models.sdm import SceneDiffusionModel

    cfg = SDMConfig(clip_dim=32, latent_dim=16, cat_emb=8, n_head=4,
                    vert_dims=24, pcd_points=32, max_cats=13,
                    dtype="bfloat16")
    B, O, N = 2, 9, cfg.pcd_points
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (B, N, 3))
    mask = jnp.zeros((B, O)).at[:, 1:4].set(1.0)
    objs = jax.random.normal(ks[1], (B, O, N, 3))
    cats = jax.nn.one_hot(jax.random.randint(ks[2], (B, O), 0, 13), 13)
    text = jax.random.normal(ks[3], (B, cfg.clip_dim))
    model = SceneDiffusionModel(cfg)
    variables = model.init(jax.random.PRNGKey(1), x, mask,
                           jnp.zeros((B,), jnp.int32), objs, cats, text)
    schedule = make_schedule("cosine", 8)
    key = jax.random.PRNGKey(42)
    s_ref, _ = sample_sdm(model, variables, schedule, mask, objs, cats,
                          text, key, clip_denoised=False)
    s_fus, _ = sample_sdm(model, variables, schedule, mask, objs, cats,
                          text, key, clip_denoised=False,
                          fused_step=True, fused_interpret=True)
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_fus),
                               atol=5e-2)


def test_rank1_mha_train_matches_composed(rng):
    """Fused train attention (custom flash-VJP): forward AND all three
    input gradients match the composed head_dim=1 formulation."""
    from lsdm_tpu.ops.attention import multihead_attention
    from lsdm_tpu.ops.attn_pallas import rank1_mha_train

    B, L, S, H = 3, 64, 64, 12
    q = jnp.asarray(rng.randn(B, L, H).astype(np.float32))
    k = jnp.asarray(rng.randn(B, S, H).astype(np.float32))
    v = jnp.asarray(rng.randn(B, S, H).astype(np.float32))
    g = jnp.asarray(rng.randn(B, L, H).astype(np.float32))

    def composed(q, k, v):
        return multihead_attention(q, k, v, H)[0]

    def fused(q, k, v):
        return rank1_mha_train(q, k, v, jnp.float32, True)  # interpret

    with jax.default_matmul_precision("highest"):
        np.testing.assert_allclose(
            np.asarray(fused(q, k, v)), np.asarray(composed(q, k, v)),
            atol=2e-6)
        g1 = jax.grad(lambda *a: jnp.sum(composed(*a) * g), (0, 1, 2))(q, k, v)
        g2 = jax.grad(lambda *a: jnp.sum(fused(*a) * g), (0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g1, g2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-6,
                                   err_msg=f"d{name}")


def test_fused_train_attention_module_grads(rng):
    """TorchMultiheadAttention(fused_train=True) matches the composed
    module — output and parameter gradients — at the pcd_attention
    geometry (embed 12 == heads 12, kdim = vdim = 3)."""
    from lsdm_tpu.ops.attention import TorchMultiheadAttention

    B, L, H = 2, 32, 12
    mha = TorchMultiheadAttention(embed_dim=H, num_heads=H, kdim=3, vdim=3)
    q = jnp.asarray(rng.randn(B, L, H).astype(np.float32))
    xyz = jnp.asarray(rng.randn(B, L, 3).astype(np.float32))
    variables = mha.init(jax.random.PRNGKey(0), q, xyz, xyz)

    def loss(params, fused_train):
        out, _ = mha.apply({"params": params}, q, xyz, xyz,
                           fused_train=fused_train)
        return jnp.sum(out ** 2)

    with jax.default_matmul_precision("highest"):
        l1, grads1 = jax.value_and_grad(loss)(variables["params"], False)
        l2, grads2 = jax.value_and_grad(loss)(variables["params"], True)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    flat1 = jax.tree.flatten_with_path(grads1)[0]
    flat2 = jax.tree.flatten_with_path(grads2)[0]
    for (p1, a), (p2, b) in zip(flat1, flat2):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5,
                                   rtol=1e-4, err_msg=str(p1))


@pytest.mark.slow
def test_train_step_attn_impl_equivalence(rng):
    """A full SDM train-graph value_and_grad with attn_impl='pallas'
    (fused rank-1 attention + flash VJP, interpret mode) matches
    attn_impl='xla' — loss and parameter-gradient norms."""
    import dataclasses

    from lsdm_tpu.config import SDMConfig
    from lsdm_tpu.diffusion import make_schedule, training_losses
    from lsdm_tpu.models.sdm import SceneDiffusionModel

    TINY = SDMConfig(clip_dim=32, latent_dim=16, cat_emb=8, n_head=4,
                     vert_dims=24, pcd_points=32)
    B, O, N = 2, 9, 32
    mask = jnp.zeros((B, O)).at[:, 1:4].set(1.0)
    objs = jnp.asarray(rng.randn(B, O, N, 3).astype(np.float32)) * 0.3
    cats = jax.nn.one_hot(jnp.asarray(rng.randint(0, 13, (B, O))), 13)
    text = jnp.asarray(rng.randn(B, TINY.clip_dim).astype(np.float32))
    target = jnp.asarray(rng.randn(B, N, 3).astype(np.float32)) * 0.2
    target_cat = jax.nn.one_hot(jnp.array([2, 5]), 13)
    noise = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    t = jnp.array([3, 11])
    schedule = make_schedule("cosine", 16)

    results = {}
    for impl in ("xla", "pallas"):
        model = SceneDiffusionModel(dataclasses.replace(TINY, attn_impl=impl))
        variables = model.init(jax.random.PRNGKey(0), target, mask,
                               jnp.zeros((B,), jnp.int32), objs, cats, text)

        def loss_fn(params):
            def model_fn(x_t, tt):
                out, _ = model.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    x_t, mask, tt, objs, cats, text, True,
                    mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(1)},
                )
                return out

            return training_losses(schedule, model_fn, target, t,
                                   target_cat, noise)["loss"]

        with jax.default_matmul_precision("highest"):
            loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        results[impl] = (float(loss), jax.tree.map(np.asarray, grads))

    np.testing.assert_allclose(results["pallas"][0], results["xla"][0],
                               rtol=1e-5)
    flat_x = jax.tree.flatten_with_path(results["xla"][1])[0]
    flat_p = jax.tree.flatten_with_path(results["pallas"][1])[0]
    for (p1, a), (p2, b) in zip(flat_x, flat_p):
        assert p1 == p2
        scale = max(float(np.abs(a).max()), 1e-3)
        np.testing.assert_allclose(b, a, atol=1e-4 * scale, rtol=1e-3,
                                   err_msg=str(p1))


def test_rank1_mha_train_multitile_accumulation(rng):
    """L=512 runs the backward as two 256-row query tiles that ACCUMULATE
    dk/dv into a revisited block — pins the @pl.when init + accumulate
    semantics the single-tile shapes above never reach."""
    from lsdm_tpu.ops.attention import multihead_attention
    from lsdm_tpu.ops.attn_pallas import rank1_mha_train

    B, L, S, H = 2, 512, 512, 12
    q = jnp.asarray(rng.randn(B, L, H).astype(np.float32))
    k = jnp.asarray(rng.randn(B, S, H).astype(np.float32))
    v = jnp.asarray(rng.randn(B, S, H).astype(np.float32))
    g = jnp.asarray(rng.randn(B, L, H).astype(np.float32))

    with jax.default_matmul_precision("highest"):
        g1 = jax.grad(
            lambda *a: jnp.sum(multihead_attention(*a, H)[0] * g), (0, 1, 2)
        )(q, k, v)
        g2 = jax.grad(
            lambda *a: jnp.sum(rank1_mha_train(*a, jnp.float32, True) * g),
            (0, 1, 2),
        )(q, k, v)
    for name, a, b in zip("qkv", g1, g2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5,
                                   err_msg=f"d{name}")
