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
import jax.numpy as jnp

from lsdm_tpu.diffusion.sampler import ddim_sample_loop, p_sample_loop
from lsdm_tpu.models.sdm import DenoiserOutput, SceneDiffusionModel


def resolve_fast_path(ball_impl: str = "auto", fused_step=None):
    """Resolve the eval-time fast-path defaults (round 4 promotion).

    On a real TPU backend, ``"auto"`` resolves to the measured-best eval
    program: the fully-fused conditioning encode (``ball_impl="fused"`` —
    SA/FP stage kernels, FPS, rank-1 attention) plus the whole-loop chain
    denoise kernel (``fused_step="chain"``) — 41.3 ms / 24,223 steps/s vs
    50-57 ms composed at the flagship batch-1 config, with the on-chip
    composed-vs-fused equivalence recorded in PERF.md round 4.  On CPU the
    composed path is kept: the fused kernels would run in the Pallas
    interpreter, orders of magnitude slower.  Training and sharded-object
    contexts fall back to composed formulations inside the model
    (``models/sdm.py``) regardless of these values, so callers may resolve
    unconditionally for eval entry points.

    ``fused_step`` accepts ``None``/"auto" (resolve), "none" (force the
    composed scan), or an explicit mode ("step"/"chain", passed through).
    """
    import jax

    on_tpu = jax.default_backend() == "tpu"
    if ball_impl == "auto" and on_tpu:
        ball_impl = "fused"
    if fused_step in (None, "auto"):
        fused_step = "chain" if on_tpu else None
    elif fused_step == "none":
        fused_step = None
    return ball_impl, fused_step


def resolve_train_ball_impl(ball_impl: str = "auto") -> str:
    """Resolve the train-time ball-query default (round 4 promotion).

    On a real TPU backend ``"auto"`` resolves to ``"pallas"`` — the fused
    ball-query kernel measured fastest inside the differentiated train
    step (13.36 steps/s vs 12.68 topk2c vs 11.58 topk at the flagship
    batch-6 bf16 config; PERF.md "Training default (round 4)").  The
    integer selection indices are non-differentiable in every
    formulation, so the VJP-less kernel is train-legal behind
    stop_gradient, with gradients pinned equal to the topk formulation's
    (``tests/test_pointcloud_ops.py``).  ``query_ball_point`` itself
    falls back to hierarchical/TopK formulations where the kernel's
    tiling declines (S % 8), and sharded-object contexts override to
    partition-clean formulations inside the model regardless.  On CPU
    ``"auto"`` is returned unchanged: the model resolves it to the TopK
    custom call (the Pallas kernel would run in interpret mode).
    """
    import jax

    if ball_impl == "auto" and jax.default_backend() == "tpu":
        return "pallas"
    return ball_impl


def resolve_train_attn_impl(attn_impl: str = "auto") -> str:
    """Resolve the train-time pcd_attention formulation (round 5).

    On a real TPU backend ``"auto"`` resolves to ``"pallas"``: the fused
    rank-1 kernel with the flash-style custom VJP
    (``ops/attn_pallas.py:rank1_mha_train``) — neither direction
    materializes the (B*objs, 12, N, N) logits/weights planes the
    composed formulation writes to HBM.  On CPU ``"auto"`` resolves to
    ``"xla"`` (the kernel would run in the Pallas interpreter).  The
    model itself falls back to composed under a sharded object axis
    (no SPMD rule) and for shapes the kernel declines (L % 8).
    """
    import jax

    if attn_impl == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return attn_impl


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
    precompute_emb: Optional[bool] = None,
    unroll: int = 1,
    noise_table: bool = False,
    fused_step: bool = False,
    fused_interpret: bool = False,
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

    # --- timestep-embedding table (opt-in): the fused (timestep, text)
    # embedding chain and the guiding points are x_t-INDEPENDENT
    # (sdm.py:timestep_cond_emb/guiding_from_emb), so the per-step body can
    # shrink to add-cond + in/out point MLPs with a (T, B, N, D) table.
    # Measured on the tunneled v5e this is a WASH at batch 1 (57.5 ms vs
    # 56.3 ms per scene): the per-step floor is fixed per-iteration scan
    # overhead, not the hoisted FLOPs — and the table program costs a long
    # fresh XLA compile.  Kept opt-in for targets where per-step compute
    # dominates (PERF.md round-2 notes).
    T = schedule.num_timesteps
    ts_model = (timestep_map if timestep_map is not None
                else jnp.arange(T, dtype=jnp.int32))
    if precompute_emb is None:
        precompute_emb = False

    if fused_step:
        mode = fused_step if isinstance(fused_step, str) else "step"
        return _sample_fused(
            model, variables, schedule, cond, B, N, key,
            clip_denoised=clip_denoised, ts_model=ts_model, unroll=unroll,
            use_ddim=use_ddim, mode=mode, interpret=fused_interpret)

    loop = ddim_sample_loop if use_ddim else p_sample_loop

    if precompute_emb:
        # Chunked build: one fully-vmapped (T, ...) program makes XLA hold
        # dozens of (T, 2D, N) element-wise temps live at once (47 GB at
        # T=1000 full size, measured); lax.map over 50-step chunks bounds
        # the transient to chunk-sized buffers.
        chunk = 50
        padded = -(-T // chunk) * chunk
        ts_pad = jnp.concatenate(
            [ts_model, jnp.zeros((padded - T,), ts_model.dtype)])

        def build(chunk_ts):
            return jax.vmap(
                lambda tt: model.apply(variables, cond, jnp.full((B,), tt),
                                       method=model.timestep_cond_emb)
            )(chunk_ts)

        emb_table = jax.lax.map(build, ts_pad.reshape(-1, chunk))
        emb_table = emb_table.reshape((padded,) + emb_table.shape[2:])[:T]
        # only the FINAL step's guiding/cat are consumed (sampler returns
        # last_out); t=0 is always the last step of every loop here
        guiding = model.apply(variables, cond, emb_table[0],
                              method=model.guiding_from_emb)

        def model_fn(x_t, tt):
            x0 = model.apply(variables, cond, emb_table[tt[0]], x_t,
                             method=model.denoise_with_emb)
            return DenoiserOutput(x0=x0, cat=cond.out_cat, guiding=guiding)

        return loop(schedule, model_fn, (B, N, 3), key,
                    clip_denoised=clip_denoised, unroll=unroll,
                    noise_table=noise_table)

    def model_fn(x_t, tt):
        t_model = timestep_map[tt] if timestep_map is not None else tt
        return model.apply(variables, cond, x_t, t_model,
                           method=model.denoise_from_cond)

    return loop(schedule, model_fn, (B, N, 3), key,
                clip_denoised=clip_denoised, unroll=unroll,
                noise_table=noise_table)


def _sample_fused(model, variables, schedule, cond, B, N, key,
                  clip_denoised, ts_model, unroll, use_ddim=False,
                  eta: float = 0.0, mode: str = "step", interpret=False):
    """Sampling with the whole per-step tail as ONE Pallas kernel
    (``ops/denoise_pallas.py``) — the opt-in fast path for the latency-
    bound batch-1 scan body (PERF.md round 3).

    Both the DDPM ancestral step and the DDIM step are affine in
    (x0, x_t, noise) with per-step scalar coefficients, so ONE kernel
    serves both loops; only the (T, 3) coefficient table differs:

      DDPM: c1 = posterior_mean_coef1, c2 = posterior_mean_coef2,
            c3 = (t != 0) * exp(0.5 * posterior_log_variance)
      DDIM: with q = sqrt(1 - abar_prev - sigma^2),
            c1 = sqrt(abar_prev) - q / rm1,  c2 = q * r / rm1,
            c3 = (t != 0) * sigma          (r, rm1: the eps-from-x0 coefs)

    Same draws as the scanned loops (key split + per-step ``fold_in``
    mirrored exactly); outputs agree to kernel-fusion float tolerance, not
    bitwise.  The (cat, guiding, x0) DenoiserOutput is recomputed once
    post-loop at the final step's input through the standard composed path.
    """
    from lsdm_tpu.ops.denoise_pallas import (
        extract_step_params, fused_denoise_chain, fused_denoise_step)

    if not interpret and jax.default_backend() == "cpu":
        interpret = True  # compiled Pallas needs a TPU; CPU == interpreter

    p = extract_step_params(variables["params"])
    T = schedule.num_timesteps
    key, init_key = jax.random.split(key)
    img = jax.random.normal(init_key, (B, N, 3), jnp.float32)

    steps = jnp.arange(T)
    t_seq = T - 1 - steps  # spaced-schedule index per loop iteration
    nzm = (t_seq != 0).astype(jnp.float32)
    if use_ddim:
        ab = schedule.alphas_cumprod[t_seq]
        abp = schedule.alphas_cumprod_prev[t_seq]
        r = schedule.sqrt_recip_alphas_cumprod[t_seq]
        rm1 = schedule.sqrt_recipm1_alphas_cumprod[t_seq]
        sigma = (eta * jnp.sqrt((1 - abp) / (1 - ab))
                 * jnp.sqrt(1 - ab / abp))
        q = jnp.sqrt(1 - abp - sigma**2)
        coef_tab = jnp.stack(
            [jnp.sqrt(abp) - q / rm1, q * r / rm1, nzm * sigma], axis=-1
        ).astype(jnp.float32)  # (T, 3)
    else:
        coef_tab = jnp.stack(
            [
                schedule.posterior_mean_coef1[t_seq],
                schedule.posterior_mean_coef2[t_seq],
                jnp.exp(0.5 * schedule.posterior_log_variance_clipped[t_seq])
                * nzm,
            ],
            axis=-1,
        ).astype(jnp.float32)  # (T, 3)
    # model-timestep embedding rows for each loop iteration (handles
    # respacing via ts_model = timestep_map)
    tm_seq = ts_model[t_seq]
    e2_tab = jax.vmap(
        lambda tt: model.apply(variables, cond, jnp.full((B,), tt),
                               method=model.step_emb2))(tm_seq)  # (T, B, 2D)
    noise_tab = jax.vmap(
        lambda i: jax.random.normal(jax.random.fold_in(key, i), (B, N, 3),
                                    jnp.float32))(steps)

    # mirror the composed tail's compute dtype (SDMConfig.dtype): bf16
    # halves the kernel's MXU pass count at the usual bf16-grade numerics
    compute_dtype = jnp.dtype(model.cfg.dtype)

    if mode == "chain":
        # the WHOLE loop as one kernel launch (grid=(B, T), carried sample
        # resident in VMEM) — no per-step scan bookkeeping at all
        final, last_in = fused_denoise_chain(
            img, jnp.swapaxes(noise_tab, 0, 1), cond.cond_pcd,
            jnp.swapaxes(e2_tab, 0, 1), coef_tab, p,
            clip_denoised=clip_denoised, interpret=interpret,
            compute_dtype=compute_dtype)
    else:
        def body(carry, xs):
            x, _ = carry
            e2, nz, cf = xs
            new = fused_denoise_step(x, nz, cond.cond_pcd, e2, cf, p,
                                     clip_denoised=clip_denoised,
                                     interpret=interpret,
                                     compute_dtype=compute_dtype)
            return (new, x), None

        (final, last_in), _ = jax.lax.scan(
            body, (img, img), (e2_tab, noise_tab, coef_tab), unroll=unroll)

    last_out = model.apply(
        variables, cond, last_in, jnp.full((B,), tm_seq[-1]),
        method=model.denoise_from_cond)
    return final, last_out
