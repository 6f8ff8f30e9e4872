"""Scanned samplers: DDPM ancestral, DDIM, PLMS.

The reference drives every sampler from Python, launching one device graph
per timestep (``diffusion/gaussian_diffusion.py:736-759`` — the hot loop the
TPU rebuild targets).  Here each sampler is a single ``lax.scan`` compiled
once: 1000 steps execute back-to-back on device with zero host round-trips.
Noise is derived per step with ``jax.random.fold_in`` on a threaded key, so
sampling is deterministic given the key.

All samplers share the ``model_fn(x_t, t) -> DenoiserOutput`` contract with
conditioning closed over (see :mod:`lsdm_tpu.diffusion.gaussian`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from lsdm_tpu.diffusion.gaussian import (
    DenoiseFn,
    DenoiserOutput,
    p_mean_variance,
    predict_eps_from_xstart,
    predict_xstart_from_eps,
    q_sample,
)
from lsdm_tpu.diffusion.schedule import Schedule, extract


def _nonzero_mask(t: jax.Array, ndim: int) -> jax.Array:
    """(t != 0) broadcast like reference ``gaussian_diffusion.py:550-552``."""
    m = (t != 0).astype(jnp.float32)
    return m.reshape(m.shape + (1,) * (ndim - 1))


def p_sample_step(
    schedule: Schedule,
    model_fn: DenoiseFn,
    x: jax.Array,
    t: jax.Array,
    key: jax.Array,
    clip_denoised: bool = True,
    const_noise: bool = False,
    cond_fn=None,
    noise: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, DenoiserOutput]:
    """One ancestral DDPM step (reference ``p_sample``,
    ``gaussian_diffusion.py:501-561``). Returns (sample, pred_xstart, out).

    ``cond_fn(x, t) -> grad`` enables classifier guidance (reference
    ``condition_mean`` hook, ``gaussian_diffusion.py:553-556``).

    ``noise`` overrides the per-step gaussian draw (the loops' noise-table
    mode pre-generates all T draws outside the scan); when given, ``key``
    is unused.
    """
    mean, variance, log_variance, pred_xstart, model_out = p_mean_variance(
        schedule, model_fn, x, t, clip_denoised=clip_denoised
    )
    if cond_fn is not None:
        from lsdm_tpu.diffusion.gaussian import condition_mean

        mean = condition_mean(cond_fn, mean, variance, x, t)
    if noise is None:
        noise = jax.random.normal(key, x.shape, dtype=x.dtype)
    if const_noise:
        noise = jnp.broadcast_to(noise[:1], noise.shape)
    sample = mean + _nonzero_mask(t, x.ndim) * jnp.exp(0.5 * log_variance) * noise
    return sample, pred_xstart, model_out


def _abstract_zeros(model_fn, x, t):
    """A zeros pytree shaped like ``model_fn(x, t)`` (no device compute;
    used to seed the last-output carry slot of the sampling scans)."""
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                        jax.eval_shape(model_fn, x, t))


def p_sample_loop(
    schedule: Schedule,
    model_fn: DenoiseFn,
    shape: Tuple[int, ...],
    key: jax.Array,
    noise: Optional[jax.Array] = None,
    clip_denoised: bool = True,
    const_noise: bool = False,
    skip_timesteps: int = 0,
    init_image: Optional[jax.Array] = None,
    unroll: int = 1,
    noise_table: bool = False,
) -> Tuple[jax.Array, DenoiserOutput]:
    """Full DDPM sampling as one ``lax.scan``
    (replaces reference ``p_sample_loop(_progressive)``,
    ``gaussian_diffusion.py:611-759``).

    Returns ``(sample, last_model_out)`` — the last model output carries the
    category prediction and guiding points that the reference reads off
    ``model.saved_cat`` / ``model.saved_guiding_points``
    (``run/test_sdm.py:200-202``).

    ``noise_table=True`` pre-generates all per-step gaussian draws outside
    the scan (one vmapped threefry over the SAME ``fold_in`` keys the
    in-loop path uses — bit-identical draws; end samples agree to XLA
    FMA-fusion tolerance ~1e-8) and feeds them through the scan's xs,
    removing the RNG ops from the per-iteration body.  Costs a
    transient (T, *shape) fp32 table (12 MB at the flagship config).
    """
    T = schedule.num_timesteps
    key, init_key = jax.random.split(key)
    img = jax.random.normal(init_key, shape, jnp.float32) if noise is None else noise

    start_t = T - skip_timesteps
    if skip_timesteps:
        if init_image is None:
            init_image = jnp.zeros(shape, jnp.float32)
        my_t = jnp.full((shape[0],), start_t - 1, jnp.int32)
        img = q_sample(schedule, init_image, my_t, img)

    steps = jnp.arange(start_t)
    if noise_table:
        noise_xs = jax.vmap(
            lambda i: jax.random.normal(jax.random.fold_in(key, i), shape,
                                        jnp.float32))(steps)
        xs = (steps, noise_xs)
    else:
        xs = (steps, None)

    def body(carry, step_xs):
        i, step_noise = step_xs
        x, k, _ = carry
        t = jnp.full((shape[0],), start_t - 1 - i, jnp.int32)
        step_key = None if noise_table else jax.random.fold_in(k, i)
        sample, pred_xstart, model_out = p_sample_step(
            schedule, model_fn, x, t, step_key,
            clip_denoised=clip_denoised, const_noise=const_noise,
            noise=step_noise,
        )
        return (sample, k, model_out), None

    # Thread the last model output through the CARRY — stacking per-step
    # outputs and indexing [-1] costs T x |output| HBM writes and O(T·B·N)
    # memory (OOMs at batch 32 on one chip).
    out0 = _abstract_zeros(model_fn, img,
                           jnp.full((shape[0],), start_t - 1, jnp.int32))
    (final, _, last_out), _ = jax.lax.scan(body, (img, key, out0), xs,
                                           unroll=unroll)
    return final, last_out


def ddim_sample_step(
    schedule: Schedule,
    model_fn: DenoiseFn,
    x: jax.Array,
    t: jax.Array,
    key: jax.Array,
    clip_denoised: bool = True,
    eta: float = 0.0,
    noise: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, DenoiserOutput]:
    """One DDIM step (reference ``ddim_sample``,
    ``gaussian_diffusion.py:761-811``)."""
    _, _, _, pred_xstart, model_out = p_mean_variance(
        schedule, model_fn, x, t, clip_denoised=clip_denoised
    )
    eps = predict_eps_from_xstart(schedule, x, t, pred_xstart)
    nd = x.ndim
    alpha_bar = extract(schedule.alphas_cumprod, t, nd)
    alpha_bar_prev = extract(schedule.alphas_cumprod_prev, t, nd)
    sigma = (
        eta
        * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
        * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
    )
    if noise is None:
        noise = jax.random.normal(key, x.shape, dtype=x.dtype)
    mean_pred = (
        pred_xstart * jnp.sqrt(alpha_bar_prev)
        + jnp.sqrt(1 - alpha_bar_prev - sigma**2) * eps
    )
    sample = mean_pred + _nonzero_mask(t, nd) * sigma * noise
    return sample, pred_xstart, model_out


def ddim_sample_loop(
    schedule: Schedule,
    model_fn: DenoiseFn,
    shape: Tuple[int, ...],
    key: jax.Array,
    noise: Optional[jax.Array] = None,
    clip_denoised: bool = True,
    eta: float = 0.0,
    unroll: int = 1,
    noise_table: bool = False,
) -> Tuple[jax.Array, DenoiserOutput]:
    """DDIM sampling as one scan (reference ``ddim_sample_loop``,
    ``gaussian_diffusion.py:908-1022``).

    ``noise_table`` as in :func:`p_sample_loop` (bit-identical draws,
    RNG hoisted out of the per-iteration body)."""
    T = schedule.num_timesteps
    key, init_key = jax.random.split(key)
    img = jax.random.normal(init_key, shape, jnp.float32) if noise is None else noise

    steps = jnp.arange(T)
    if noise_table:
        noise_xs = jax.vmap(
            lambda i: jax.random.normal(jax.random.fold_in(key, i), shape,
                                        jnp.float32))(steps)
        xs = (steps, noise_xs)
    else:
        xs = (steps, None)

    def body(carry, step_xs):
        i, step_noise = step_xs
        x, k, _ = carry
        t = jnp.full((shape[0],), T - 1 - i, jnp.int32)
        step_key = None if noise_table else jax.random.fold_in(k, i)
        sample, pred_xstart, model_out = ddim_sample_step(
            schedule, model_fn, x, t, step_key, clip_denoised=clip_denoised,
            eta=eta, noise=step_noise,
        )
        return (sample, k, model_out), None

    out0 = _abstract_zeros(model_fn, img, jnp.full((shape[0],), T - 1, jnp.int32))
    (final, _, last_out), _ = jax.lax.scan(body, (img, key, out0), xs,
                                           unroll=unroll)
    return final, last_out


def plms_sample_loop(
    schedule: Schedule,
    model_fn: DenoiseFn,
    shape: Tuple[int, ...],
    key: jax.Array,
    noise: Optional[jax.Array] = None,
    clip_denoised: bool = True,
    order: int = 2,
) -> Tuple[jax.Array, DenoiserOutput]:
    """PLMS (Adams-Bashforth order 1-4) sampling as one scan
    (reference ``plms_sample(_loop)``, ``gaussian_diffusion.py:1024-1219``).

    The reference keeps a Python list of old epsilons; here the history is a
    fixed ``(order, *shape)`` ring buffer threaded through the scan carry,
    with ``lax.switch`` over the Adams-Bashforth coefficient sets — fully
    static shapes.
    """
    if not 1 <= order <= 4:
        raise ValueError("order must be in [1, 4]")
    T = schedule.num_timesteps
    key, init_key = jax.random.split(key)
    img = jax.random.normal(init_key, shape, jnp.float32) if noise is None else noise

    def model_eps(x, t):
        _, _, _, pred_xstart, model_out = p_mean_variance(
            schedule, model_fn, x, t, clip_denoised=clip_denoised
        )
        eps = predict_eps_from_xstart(schedule, x, t, pred_xstart)
        return eps, pred_xstart, model_out

    def eps_prime_fn(hist, n_valid, eps):
        """Adams-Bashforth blend over the newest ``min(order, n_valid+1)``
        epsilons. hist[0] = newest *previous* eps."""
        cur = jnp.minimum(n_valid + 1, order)

        def o1(_):
            return eps

        def o2(_):
            return (3 * eps - hist[0]) / 2

        def o3(_):
            return (23 * eps - 16 * hist[0] + 5 * hist[1]) / 12

        def o4(_):
            return (55 * eps - 59 * hist[0] + 37 * hist[1] - 9 * hist[2]) / 24

        fns = [o1, o2, o3, o4][:order]
        return jax.lax.switch(jnp.clip(cur - 1, 0, order - 1), fns, None)

    def body(carry, i):
        x, hist, n_valid, k, _ = carry
        t = jnp.full((shape[0],), T - 1 - i, jnp.int32)
        eps, pred_xstart, model_out = model_eps(x, t)
        nd = x.ndim
        alpha_bar_prev = extract(schedule.alphas_cumprod_prev, t, nd)

        def improved_euler(_):
            # First step with order > 1: pseudo improved Euler
            # (reference gaussian_diffusion.py:1074-1081).
            mean_pred0 = pred_xstart * jnp.sqrt(alpha_bar_prev) + jnp.sqrt(
                1 - alpha_bar_prev
            ) * eps
            eps2, _, _ = model_eps(mean_pred0, jnp.maximum(t - 1, 0))
            eps_p = (eps + eps2) / 2
            pred_p = predict_xstart_from_eps(schedule, x, t, eps_p)
            return pred_p * jnp.sqrt(alpha_bar_prev) + jnp.sqrt(1 - alpha_bar_prev) * eps_p

        def multistep(_):
            eps_p = eps_prime_fn(hist, n_valid, eps)
            pred_p = predict_xstart_from_eps(schedule, x, t, eps_p)
            return pred_p * jnp.sqrt(alpha_bar_prev) + jnp.sqrt(1 - alpha_bar_prev) * eps_p

        if order > 1:
            mean_pred = jax.lax.cond(n_valid == 0, improved_euler, multistep, None)
        else:
            mean_pred = multistep(None)

        nzm = _nonzero_mask(t, nd)
        sample = mean_pred * nzm + pred_xstart * (1 - nzm)
        new_hist = jnp.concatenate([eps[None], hist[:-1]], axis=0)
        return (sample, new_hist, jnp.minimum(n_valid + 1, order), k,
                model_out), None

    hist0 = jnp.zeros((max(order - 1, 1),) + tuple(shape), jnp.float32)
    out0 = _abstract_zeros(model_fn, img, jnp.full((shape[0],), T - 1, jnp.int32))
    (final, _, _, _, last_out), _ = jax.lax.scan(
        body, (img, hist0, jnp.int32(0), key, out0), jnp.arange(T)
    )
    return final, last_out
