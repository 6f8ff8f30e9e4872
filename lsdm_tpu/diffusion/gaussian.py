"""Pure-function DDPM math (q/p distributions, losses).

Functional re-design of reference ``diffusion/gaussian_diffusion.py``.
Every function takes the precomputed :class:`~lsdm_tpu.diffusion.schedule.Schedule`
and is safe to call inside ``jit`` / ``lax.scan`` / ``vmap``.

The denoiser is abstracted as ``model_fn(x_t, t) -> DenoiserOutput`` with
conditioning closed over by the caller; ``DenoiserOutput.x0`` corresponds to
the reference model's second return value (START_X prediction,
``model/sdm.py:218``), ``.cat`` to ``model.saved_cat`` and ``.guiding`` to
``model.saved_guiding_points``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from lsdm_tpu.diffusion.schedule import Schedule, extract
from lsdm_tpu.ops.pointcloud import chamfer_distance


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenoiserOutput:
    """What one denoiser forward produces (reference returns (out_cat, x)
    and stashes guiding points on ``self``; we return all three)."""

    x0: jax.Array  # (B, N, 3) predicted x_start
    cat: jax.Array  # (B, 1, max_cats) softmax category distribution
    guiding: Optional[jax.Array] = None  # (B, N, 3) guiding points


DenoiseFn = Callable[[jax.Array, jax.Array], DenoiserOutput]

# Model mean / variance types as string enums (reference enums at
# gaussian_diffusion.py:69-99).  LSDM always uses start_x + fixed_small.
MEAN_START_X = "start_x"
MEAN_EPSILON = "epsilon"
VAR_FIXED_SMALL = "fixed_small"
VAR_FIXED_LARGE = "fixed_large"


def q_mean_variance(schedule: Schedule, x_start: jax.Array, t: jax.Array):
    """Distribution q(x_t | x_0) (reference ``gaussian_diffusion.py:221-236``)."""
    nd = x_start.ndim
    mean = extract(schedule.sqrt_alphas_cumprod, t, nd) * x_start
    variance = extract(1.0 - schedule.alphas_cumprod, t, nd)
    log_variance = extract(schedule.log_one_minus_alphas_cumprod, t, nd)
    return mean, variance, log_variance


def q_sample(
    schedule: Schedule, x_start: jax.Array, t: jax.Array, noise: jax.Array
) -> jax.Array:
    """Sample from q(x_t | x_0) (reference ``gaussian_diffusion.py:238-256``)."""
    nd = x_start.ndim
    return (
        extract(schedule.sqrt_alphas_cumprod, t, nd) * x_start
        + extract(schedule.sqrt_one_minus_alphas_cumprod, t, nd) * noise
    )


def q_posterior_mean_variance(
    schedule: Schedule, x_start: jax.Array, x_t: jax.Array, t: jax.Array
):
    """q(x_{t-1} | x_t, x_0) (reference ``gaussian_diffusion.py:258-280``)."""
    nd = x_t.ndim
    posterior_mean = (
        extract(schedule.posterior_mean_coef1, t, nd) * x_start
        + extract(schedule.posterior_mean_coef2, t, nd) * x_t
    )
    posterior_variance = extract(schedule.posterior_variance, t, nd)
    posterior_log_variance = extract(schedule.posterior_log_variance_clipped, t, nd)
    return posterior_mean, posterior_variance, posterior_log_variance


def predict_xstart_from_eps(schedule: Schedule, x_t, t, eps):
    """(reference ``gaussian_diffusion.py:395-400``)"""
    nd = x_t.ndim
    return (
        extract(schedule.sqrt_recip_alphas_cumprod, t, nd) * x_t
        - extract(schedule.sqrt_recipm1_alphas_cumprod, t, nd) * eps
    )


def predict_eps_from_xstart(schedule: Schedule, x_t, t, pred_xstart):
    """(reference ``gaussian_diffusion.py:411-416``)"""
    nd = x_t.ndim
    return (
        extract(schedule.sqrt_recip_alphas_cumprod, t, nd) * x_t - pred_xstart
    ) / extract(schedule.sqrt_recipm1_alphas_cumprod, t, nd)


def p_mean_variance(
    schedule: Schedule,
    model_fn: DenoiseFn,
    x: jax.Array,
    t: jax.Array,
    clip_denoised: bool = True,
    mean_type: str = MEAN_START_X,
    var_type: str = VAR_FIXED_SMALL,
):
    """p(x_{t-1} | x_t) mean/variance + x0 prediction
    (reference ``gaussian_diffusion.py:282-393``, fixed-sigma branches only —
    LSDM never learns sigma, ``util/model_util.py:133``).

    Returns ``(mean, variance, log_variance, pred_xstart, model_out)``.
    """
    model_out = model_fn(x, t)
    nd = x.ndim
    if var_type == VAR_FIXED_SMALL:
        variance = extract(schedule.posterior_variance, t, nd)
        log_variance = extract(schedule.posterior_log_variance_clipped, t, nd)
    elif var_type == VAR_FIXED_LARGE:
        variance = extract(schedule.fixed_large_variance, t, nd)
        log_variance = extract(schedule.fixed_large_log_variance, t, nd)
    else:
        raise NotImplementedError(var_type)

    if mean_type == MEAN_START_X:
        pred_xstart = model_out.x0
    elif mean_type == MEAN_EPSILON:
        pred_xstart = predict_xstart_from_eps(schedule, x, t, model_out.x0)
    else:
        raise NotImplementedError(mean_type)
    if clip_denoised:
        pred_xstart = jnp.clip(pred_xstart, -1.0, 1.0)

    mean, _, _ = q_posterior_mean_variance(schedule, pred_xstart, x, t)
    return mean, variance, log_variance, pred_xstart, model_out


def training_losses(
    schedule: Schedule,
    model_fn: DenoiseFn,
    x_start: jax.Array,
    t: jax.Array,
    target_cat: jax.Array,
    noise: jax.Array,
    lambda_cat: float = 0.1,
    mean_type: str = MEAN_START_X,
    chamfer_impl: str = "xla",
):
    """LSDM training loss (reference ``gaussian_diffusion.py:1256-1342``):

      loss = chamfer(model_output, x_start) + lambda_cat * CE(out_cat, argmax target_cat)

    Reference quirk replicated on purpose: ``predict_cat`` ends in a Softmax
    (``model/sdm.py:75``) and the CE loss then applies log_softmax *again*
    (``gaussian_diffusion.py:158,1299``) — i.e. CE over probabilities used as
    logits.  Trained checkpoints bake this in, so we keep it.

    ``chamfer_impl``: "xla" (default) or "pallas" — the Pallas TPU kernel
    (`ops/chamfer_pallas.py`) streams the NxM distance matrix through VMEM
    instead of materializing it, with an index-gather backward pass
    (mathematically identical loss/gradients).

    Returns a dict with ``loss``, ``mse`` (chamfer) and ``cat_loss`` terms.
    """
    x_t = q_sample(schedule, x_start, t, noise)
    model_out = model_fn(x_t, t)

    out_cat = model_out.cat.squeeze(1)  # (B, max_cats) post-softmax probs
    target_idx = jnp.argmax(target_cat, axis=1)
    log_probs = jax.nn.log_softmax(out_cat, axis=-1)
    cat_loss = -jnp.take_along_axis(log_probs, target_idx[:, None], axis=1).mean()
    cat_loss = lambda_cat * cat_loss

    if mean_type == MEAN_START_X:
        target = x_start
    elif mean_type == MEAN_EPSILON:
        target = noise
    else:
        raise NotImplementedError(mean_type)

    # pytorch3d chamfer semantics: both directions summed, mean over points
    # and batch (reference gaussian_diffusion.py:1334).
    if chamfer_impl == "pallas" and x_start.shape[1] % 128 == 0:
        from lsdm_tpu.ops.chamfer_pallas import chamfer_distance_pallas

        mse = chamfer_distance_pallas(
            model_out.x0.astype(jnp.float32), target.astype(jnp.float32),
            jax.default_backend() != "tpu")  # interpret off-TPU
    else:  # xla impl; also the fallback for non-128-multiple clouds
        mse = chamfer_distance(
            model_out.x0.astype(jnp.float32), target.astype(jnp.float32))
    return {"loss": mse + cat_loss, "mse": mse, "cat_loss": cat_loss}


def condition_mean(
    cond_fn: Callable,
    mean: jax.Array,
    variance: jax.Array,
    x: jax.Array,
    t: jax.Array,
) -> jax.Array:
    """Classifier-guidance mean shift (reference ``condition_mean``,
    ``gaussian_diffusion.py:423-436``): mean + variance * grad(log p(y|x))."""
    gradient = cond_fn(x, t)
    return mean + variance * gradient.astype(jnp.float32)


def condition_score(
    cond_fn: Callable,
    schedule: Schedule,
    pred_xstart: jax.Array,
    x: jax.Array,
    t: jax.Array,
) -> jax.Array:
    """Classifier-guidance score conditioning for DDIM (reference
    ``condition_score``, ``gaussian_diffusion.py:461-480``): shift the
    implied epsilon by sqrt(1 - abar) * grad, re-derive x0."""
    alpha_bar = extract(schedule.alphas_cumprod, t, x.ndim)
    eps = predict_eps_from_xstart(schedule, x, t, pred_xstart)
    eps = eps - jnp.sqrt(1 - alpha_bar) * cond_fn(x, t)
    return predict_xstart_from_eps(schedule, x, t, eps)


def calc_bpd_loop(
    schedule: Schedule,
    model_fn: DenoiseFn,
    x_start: jax.Array,
    key: jax.Array,
    clip_denoised: bool = True,
):
    """Total variational bound in bits-per-dim over all timesteps
    (reference ``calc_bpd_loop``, ``gaussian_diffusion.py:1527-1583``) as a
    single scan.  Returns dict with total_bpd, prior_bpd, per-step vb/mse."""
    B = x_start.shape[0]
    T = schedule.num_timesteps

    def body(carry, ti):
        k = jax.random.fold_in(key, ti)
        t = jnp.full((B,), ti, jnp.int32)
        noise = jax.random.normal(k, x_start.shape)
        x_t = q_sample(schedule, x_start, t, noise)
        vb, pred_xstart = vb_terms_bpd(
            schedule, model_fn, x_start, x_t, t, clip_denoised=clip_denoised
        )
        mse = jnp.mean((pred_xstart - x_start).reshape(B, -1) ** 2, axis=1)
        return carry, (vb, mse)

    _, (vb, mse) = jax.lax.scan(body, None, jnp.arange(T))
    # prior: KL(q(x_T | x_0) || N(0, I))
    t_last = jnp.full((B,), T - 1, jnp.int32)
    mean, _, log_var = q_mean_variance(schedule, x_start, t_last)
    prior = normal_kl(mean, log_var, jnp.zeros_like(mean), jnp.zeros_like(log_var))
    prior_bpd = prior.reshape(B, -1).mean(axis=1) / jnp.log(2.0)
    total_bpd = vb.sum(axis=0) + prior_bpd
    return {
        "total_bpd": total_bpd,
        "prior_bpd": prior_bpd,
        "vb": jnp.transpose(vb),  # (B, T)
        "mse": jnp.transpose(mse),
    }


def normal_kl(mean1, logvar1, mean2, logvar2):
    """Gaussian KL (reference ``diffusion/losses.py:12-39``)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    """(reference ``diffusion/losses.py:42-47``)"""
    return 0.5 * (
        1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * jnp.power(x, 3)))
    )


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a discretized Gaussian
    (reference ``diffusion/losses.py:50-77``)."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    log_probs = jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(
            x > 0.999,
            log_one_minus_cdf_min,
            jnp.log(jnp.clip(cdf_delta, min=1e-12)),
        ),
    )
    return log_probs


def vb_terms_bpd(
    schedule: Schedule,
    model_fn: DenoiseFn,
    x_start: jax.Array,
    x_t: jax.Array,
    t: jax.Array,
    clip_denoised: bool = False,
):
    """Variational-bound term in bits-per-dim
    (reference ``gaussian_diffusion.py:1221-1254``)."""
    true_mean, _, true_log_var = q_posterior_mean_variance(schedule, x_start, x_t, t)
    mean, _, log_var, pred_xstart, _ = p_mean_variance(
        schedule, model_fn, x_t, t, clip_denoised=clip_denoised
    )
    kl = normal_kl(true_mean, true_log_var, mean, log_var)
    kl = kl.reshape(kl.shape[0], -1).mean(axis=1) / jnp.log(2.0)

    decoder_nll = -discretized_gaussian_log_likelihood(
        x_start, means=mean, log_scales=0.5 * log_var
    )
    decoder_nll = decoder_nll.reshape(decoder_nll.shape[0], -1).mean(axis=1) / jnp.log(2.0)

    output = jnp.where(t == 0, decoder_nll, kl)
    return output, pred_xstart
