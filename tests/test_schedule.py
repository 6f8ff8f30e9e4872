"""Diffusion schedule unit tests: coefficients vs independent closed-form
numpy derivations (the reference math at gaussian_diffusion.py:165-204,
re-derived here from the DDPM paper formulas, not imported)."""

import math

import numpy as np

from lsdm_tpu.diffusion import (
    Schedule,
    get_named_beta_schedule,
    make_schedule,
    space_timesteps,
    spaced_schedule,
)


def _closed_form(betas):
    betas = np.asarray(betas, np.float64)
    alphas = 1 - betas
    abar = np.cumprod(alphas)
    abar_prev = np.append(1.0, abar[:-1])
    post_var = betas * (1 - abar_prev) / (1 - abar)
    return alphas, abar, abar_prev, post_var


def test_linear_schedule_endpoints():
    betas = get_named_beta_schedule("linear", 1000)
    assert math.isclose(betas[0], 1e-4)
    assert math.isclose(betas[-1], 0.02)
    assert betas.dtype == np.float64


def test_cosine_schedule_bounds():
    betas = get_named_beta_schedule("cosine", 1000)
    assert (betas > 0).all() and (betas <= 0.999).all()
    # alpha_bar at t=0 should be close to 1 (cos^2 near 0)
    abar = np.cumprod(1 - betas)
    assert abar[0] > 0.99
    assert abar[-1] < 1e-3


def test_schedule_coefficients_match_closed_form():
    for name in ("linear", "cosine"):
        sched = make_schedule(name, 100)
        betas = get_named_beta_schedule(name, 100)
        alphas, abar, abar_prev, post_var = _closed_form(betas)
        np.testing.assert_allclose(sched.alphas_cumprod, abar, rtol=1e-6)
        np.testing.assert_allclose(
            sched.sqrt_alphas_cumprod, np.sqrt(abar), rtol=1e-6
        )
        np.testing.assert_allclose(
            sched.sqrt_one_minus_alphas_cumprod, np.sqrt(1 - abar), rtol=1e-6
        )
        np.testing.assert_allclose(
            sched.sqrt_recip_alphas_cumprod, np.sqrt(1 / abar), rtol=1e-5
        )
        np.testing.assert_allclose(sched.posterior_variance, post_var, rtol=1e-6)
        np.testing.assert_allclose(
            sched.posterior_mean_coef1,
            betas * np.sqrt(abar_prev) / (1 - abar),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            sched.posterior_mean_coef2,
            (1 - abar_prev) * np.sqrt(alphas) / (1 - abar),
            rtol=1e-6,
        )
        # log of posterior variance is clipped at index 0
        np.testing.assert_allclose(
            sched.posterior_log_variance_clipped[0],
            np.log(post_var[1]),
            rtol=1e-6,
        )


def test_space_timesteps_ddim():
    steps = space_timesteps(1000, "ddim50")
    assert len(steps) == 50
    assert 0 in steps
    steps = space_timesteps(1000, [1000])
    assert len(steps) == 1000


def test_spaced_schedule_identity():
    full = make_schedule("cosine", 100)
    spaced = spaced_schedule("cosine", 100, [100])
    np.testing.assert_allclose(spaced.betas, full.betas, rtol=1e-6)
    np.testing.assert_array_equal(spaced.timestep_map, np.arange(100))


def test_spaced_schedule_subset_alphas_match():
    """Respaced alpha_bar at kept steps equals the original alpha_bar there."""
    full = make_schedule("cosine", 100)
    spaced = spaced_schedule("cosine", 100, "ddim10")
    kept = np.asarray(spaced.timestep_map)
    np.testing.assert_allclose(
        np.asarray(spaced.alphas_cumprod),
        np.asarray(full.alphas_cumprod)[kept],
        rtol=1e-5,
    )
