"""TPU-native diffusion engine.

Replaces the reference's class-based ``GaussianDiffusion``
(``diffusion/gaussian_diffusion.py``) with pure functions over a
precomputed :class:`Schedule` coefficient table, so every sampler is a
single jit'd ``lax.scan`` instead of 1000 host-driven steps.
"""

from lsdm_tpu.diffusion.schedule import (
    Schedule,
    get_named_beta_schedule,
    betas_for_alpha_bar,
    make_schedule,
    space_timesteps,
    spaced_schedule,
)
from lsdm_tpu.diffusion.gaussian import (
    q_sample,
    q_mean_variance,
    q_posterior_mean_variance,
    p_mean_variance,
    predict_xstart_from_eps,
    predict_eps_from_xstart,
    training_losses,
)
from lsdm_tpu.diffusion.sampler import (
    p_sample_loop,
    ddim_sample_loop,
    plms_sample_loop,
)
from lsdm_tpu.diffusion.resample import (
    UniformSampler,
    LossSecondMomentResampler,
    create_named_schedule_sampler,
)
