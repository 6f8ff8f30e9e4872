"""Fast SDM sampling: conditioning encoded once, scanned denoising tail.

The reference's sampler calls the FULL model (backbones + attentions) at
every one of its 1000 steps (``gaussian_diffusion.py:736-759``) even though
only the timestep embedding and the in/out MLPs depend on (x_t, t).  This
helper runs :meth:`SceneDiffusionModel.encode_conditioning` once per sample
and scans :meth:`denoise_from_cond` — mathematically identical output,
~100x less work per step.
"""

from __future__ import annotations

from typing import Optional

import jax

from lsdm_tpu.diffusion.sampler import ddim_sample_loop, p_sample_loop
from lsdm_tpu.models.sdm import SceneDiffusionModel


def sample_sdm(
    model: SceneDiffusionModel,
    variables,
    schedule,
    mask: jax.Array,
    given_objs: jax.Array,
    given_cats: jax.Array,
    text_emb: jax.Array,
    key: jax.Array,
    clip_denoised: bool = False,
    use_ddim: bool = False,
    timestep_map: Optional[jax.Array] = None,
    cond_chunk: Optional[int] = None,
):
    """Returns (sample (B, N, 3), last DenoiserOutput).  Jit-safe.

    ``cond_chunk``: encode the conditioning in sequential batch chunks of
    this size (``lax.map``).  The PointNet++ grouped activations peak at
    ~470 MB/scene ((B*O, N, K, C) buffers), which exhausts one chip's HBM
    near batch 32 fp32; conditioning is one-time per sample and amortizes
    over the T-step scan, so chunking costs almost no wall time.
    """
    B = given_objs.shape[0]
    N = given_objs.shape[2]

    def enc(m, o, c, t):
        return model.apply(variables, m, o, c, t,
                           method=model.encode_conditioning)

    if cond_chunk and B > cond_chunk and B % cond_chunk == 0:
        parts = jax.tree.map(
            lambda a: a.reshape((B // cond_chunk, cond_chunk) + a.shape[1:]),
            (mask, given_objs, given_cats, text_emb),
        )
        cond = jax.lax.map(lambda args: enc(*args), parts)
        cond = jax.tree.map(
            lambda a: a.reshape((B,) + a.shape[2:]), cond)
    else:
        cond = enc(mask, given_objs, given_cats, text_emb)

    def model_fn(x_t, tt):
        t_model = timestep_map[tt] if timestep_map is not None else tt
        return model.apply(variables, cond, x_t, t_model,
                           method=model.denoise_from_cond)

    loop = ddim_sample_loop if use_ddim else p_sample_loop
    return loop(schedule, model_fn, (B, N, 3), key, clip_denoised=clip_denoised)
