"""Beta schedules and the precomputed diffusion coefficient table.

The reference computes all alpha-bar-derived vectors eagerly in
``GaussianDiffusion.__init__`` (``diffusion/gaussian_diffusion.py:165-204``)
in float64 numpy.  We do the same on the host, then freeze them into a
:class:`Schedule` pytree of ``(T,)`` device arrays so a jit'd ``lax.scan``
can gather per-step coefficients with one dynamic index — no Python loop,
no host sync per step.

Timestep respacing (reference ``diffusion/respace.py``) becomes *just a
different coefficient table*: :func:`spaced_schedule` recomputes betas over
the kept subset, which also fixes the reference quirk where
``_WrappedModel`` forgot to remap ``ts`` (``respace.py:125-130``) — here the
model always sees the schedule's own timestep indices by construction.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence, Set, Union

import jax
import jax.numpy as jnp
import numpy as np


def get_named_beta_schedule(
    schedule_name: str, num_diffusion_timesteps: int, scale_betas: float = 1.0
) -> np.ndarray:
    """Named beta schedule, float64 (reference ``gaussian_diffusion.py:22-46``)."""
    if schedule_name == "linear":
        scale = scale_betas * 1000 / num_diffusion_timesteps
        return np.linspace(
            scale * 0.0001, scale * 0.02, num_diffusion_timesteps, dtype=np.float64
        )
    if schedule_name == "cosine":
        return betas_for_alpha_bar(
            num_diffusion_timesteps,
            lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2,
        )
    raise NotImplementedError(f"unknown beta schedule: {schedule_name}")


def betas_for_alpha_bar(
    num_diffusion_timesteps: int, alpha_bar, max_beta: float = 0.999
) -> np.ndarray:
    """Discretize a continuous alpha-bar function into betas
    (reference ``gaussian_diffusion.py:49-66``)."""
    t = np.arange(num_diffusion_timesteps, dtype=np.float64)
    t1 = t / num_diffusion_timesteps
    t2 = (t + 1) / num_diffusion_timesteps
    ab1 = np.array([alpha_bar(x) for x in t1])
    ab2 = np.array([alpha_bar(x) for x in t2])
    return np.minimum(1.0 - ab2 / ab1, max_beta)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Schedule:
    """All per-timestep diffusion coefficients, shape ``(T,)`` each.

    Field names match the reference's attribute names
    (``gaussian_diffusion.py:165-204``) for auditability.
    """

    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    alphas_cumprod_next: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    log_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array
    # FIXED_LARGE variance table (posterior_variance[1] prepended to betas[1:],
    # reference gaussian_diffusion.py:340-343).
    fixed_large_variance: jax.Array
    fixed_large_log_variance: jax.Array
    # Original-process timestep each (respaced) index maps to; identity when
    # there is no respacing.  Used when the model conditions on raw t
    # (reference respace.py timestep_map).
    timestep_map: jax.Array

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def _schedule_from_betas(betas: np.ndarray, timestep_map: np.ndarray) -> Schedule:
    betas = np.asarray(betas, dtype=np.float64)
    assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    posterior_log_variance_clipped = np.log(
        np.append(posterior_variance[1], posterior_variance[1:])
    )
    fixed_large_variance = np.append(posterior_variance[1], betas[1:])

    def f32(x):
        return jnp.asarray(x, dtype=jnp.float32)

    return Schedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        alphas_cumprod_next=f32(alphas_cumprod_next),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(posterior_log_variance_clipped),
        posterior_mean_coef1=f32(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        fixed_large_variance=f32(fixed_large_variance),
        fixed_large_log_variance=f32(np.log(fixed_large_variance)),
        timestep_map=jnp.asarray(timestep_map, dtype=jnp.int32),
    )


def make_schedule(
    schedule_name: str = "cosine",
    num_timesteps: int = 1000,
    scale_betas: float = 1.0,
) -> Schedule:
    """Full (un-respaced) schedule."""
    betas = get_named_beta_schedule(schedule_name, num_timesteps, scale_betas)
    return _schedule_from_betas(betas, np.arange(num_timesteps))


def space_timesteps(
    num_timesteps: int, section_counts: Union[str, Sequence[int]]
) -> Set[int]:
    """Select a subset of original timesteps (reference ``respace.py:8-61``).

    Supports ``"ddimN"`` strings (fixed stride covering ``[0, T)``) and
    comma-separated per-section counts.
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired_count = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired_count:
                    return set(range(0, num_timesteps, i))
            raise ValueError(
                f"cannot create exactly {desired_count} steps with an integer stride"
            )
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(f"cannot divide section of {size} steps into {section_count}")
        if section_count <= 1:
            frac_stride = 1
        else:
            frac_stride = (size - 1) / (section_count - 1)
        cur_idx = 0.0
        taken_steps = []
        for _ in range(section_count):
            taken_steps.append(start_idx + round(cur_idx))
            cur_idx += frac_stride
        all_steps += taken_steps
        start_idx += size
    return set(all_steps)


def spaced_schedule(
    schedule_name: str = "cosine",
    num_timesteps: int = 1000,
    respacing: Union[str, Sequence[int], None] = None,
    scale_betas: float = 1.0,
) -> Schedule:
    """Schedule restricted to a kept-timestep subset.

    Recomputes betas over the subset exactly like reference
    ``SpacedDiffusion.__init__`` (``respace.py:64-92``):
    ``new_beta = 1 - abar_t / abar_{last_kept}``.
    """
    if not respacing:
        respacing = [num_timesteps]
    base_betas = get_named_beta_schedule(schedule_name, num_timesteps, scale_betas)
    alphas_cumprod = np.cumprod(1.0 - base_betas)
    use_timesteps = space_timesteps(num_timesteps, respacing)
    last_alpha_cumprod = 1.0
    new_betas, timestep_map = [], []
    for i, alpha_cumprod in enumerate(alphas_cumprod):
        if i in use_timesteps:
            new_betas.append(1 - alpha_cumprod / last_alpha_cumprod)
            last_alpha_cumprod = alpha_cumprod
            timestep_map.append(i)
    return _schedule_from_betas(np.array(new_betas), np.array(timestep_map))


def extract(coefs: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather per-batch coefficients and broadcast to an ``ndim``-rank tensor.

    TPU-native replacement for ``_extract_into_tensor``
    (reference ``gaussian_diffusion.py:1585``).
    """
    out = coefs[t].astype(jnp.float32)
    return out.reshape(out.shape + (1,) * (ndim - 1))
