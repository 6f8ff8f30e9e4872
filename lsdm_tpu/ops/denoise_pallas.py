"""Fused DDPM denoise step — the whole per-iteration tail as ONE Pallas
kernel.

Motivation (PERF.md round 3): the batch-1 sampling scan's per-step marginal
(~20 us) is a chain of ~14 small matmuls + ~20 elementwise ops with strict
data dependencies — latency-bound, not FLOP-bound (the tail is only
~0.5 GFLOP/step; hoisting the t-only FLOPs out of the body measured a wash).
Fusing the chain into one kernel keeps every activation in VMEM and pays a
single dispatch per step instead of ~30.

The kernel computes, for one scene per grid program (reference graph
``model/sdm.py:141-142,164-167,204-212`` — see
:class:`~lsdm_tpu.models.sdm.SceneDiffusionModel`):

  upsampling MLP (gelu x3) -> combine_extraction (gelu)       [t-dependent]
  input_process (sigmoid x4) -> output_process (gelu x2)      [x-dependent]
  posterior step: coef1 * x0 + coef2 * x_t + stdnz * noise

All matmuls run in the TRANSPOSED orientation so the reference's two
permute ops disappear: for y = f(x) @ W.T row-major, the kernel computes
y^T = W @ f(x)^T — torch (out, in) weight layout left-multiplies directly.

The timestep embedding MLP (two (1, D) matmuls) and the concat with the
text embedding are x-independent and tiny; they are precomputed per step
OUTSIDE the scan as an (T, B, 2D) table
(:meth:`SceneDiffusionModel.step_emb2`) and fed through the scan xs.

This is the opt-in fast sampling path (``sample_sdm(fused_step=True)``);
numerics match the composed XLA path to fusion tolerance (the kernel
reorders float ops), not bitwise.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf (max abs error 1.5e-7).

    Mosaic has no lowering for the erf/erfc primitive (checked via
    ``jax.export`` for the tpu platform), so the exact-GELU parity path
    uses this approximation in-kernel; its error is two orders below the
    fused path's 2e-5 equivalence tolerance."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x):
    # torch nn.GELU() parity: the exact erf formulation (models/common.py),
    # with erf itself approximated (see _erf)
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _sigmoid(x):
    return jax.nn.sigmoid(x)


class DenoiseStepParams(NamedTuple):
    """Weights of the per-step tail, pre-transposed for the kernel.

    Names follow the flax param tree (torch (out, in) layout at rest);
    ``*_t`` members are ``weight.T`` (in, out) so the kernel right-
    multiplies activations without transposing them.
    """

    w_up0: jax.Array   # (128, 1)   upsampling_layer/0 weight (out, in=1)
    b_up0: jax.Array   # (128, 1)
    w_up2: jax.Array   # (512, 128)
    b_up2: jax.Array   # (512, 1)
    w_up4: jax.Array   # (N, 512)
    b_up4: jax.Array   # (N, 1)
    wc_t: jax.Array    # (2D, D)    combine_extraction/0
    bc: jax.Array      # (1, D)
    wp0_t: jax.Array   # (3, D/2)   input_process/pose_embedding/0
    bp0: jax.Array     # (1, D/2)
    wp2_t: jax.Array   # (D/2, D)
    bp2: jax.Array     # (1, D)
    wx0_t: jax.Array   # (2D, 1.5D) input_process/combination_extraction/0
    bx0: jax.Array     # (1, 1.5D)
    wx2_t: jax.Array   # (1.5D, D)
    bx2: jax.Array     # (1, D)
    wo0_t: jax.Array   # (D, D/2)   output_process/pose_final/0
    bo0: jax.Array     # (1, D/2)
    wo2_t: jax.Array   # (D/2, 3)
    bo2: jax.Array     # (1, 3)


def extract_step_params(params) -> DenoiseStepParams:
    """Pull the per-step tail weights out of a SceneDiffusionModel param
    tree (``variables["params"]``) and pre-transpose for the kernel."""
    def wb(mod, name):
        leaf = params[mod][name]
        return leaf["weight"], leaf["bias"]

    w_up0, b_up0 = wb("upsampling_layer", "0")
    w_up2, b_up2 = wb("upsampling_layer", "2")
    w_up4, b_up4 = wb("upsampling_layer", "4")
    wc, bc = wb("combine_extraction", "0")
    pose = params["input_process"]["pose_embedding"]
    comb = params["input_process"]["combination_extraction"]
    out = params["output_process"]["pose_final"]
    return DenoiseStepParams(
        w_up0=w_up0, b_up0=b_up0[:, None],
        w_up2=w_up2, b_up2=b_up2[:, None],
        w_up4=w_up4, b_up4=b_up4[:, None],
        wc_t=wc.T, bc=bc[None, :],
        wp0_t=pose["0"]["weight"].T, bp0=pose["0"]["bias"][None, :],
        wp2_t=pose["2"]["weight"].T, bp2=pose["2"]["bias"][None, :],
        wx0_t=comb["0"]["weight"].T, bx0=comb["0"]["bias"][None, :],
        wx2_t=comb["2"]["weight"].T, bx2=comb["2"]["bias"][None, :],
        wo0_t=out["0"]["weight"].T, bo0=out["0"]["bias"][None, :],
        wo2_t=out["2"]["weight"].T, bo2=out["2"]["bias"][None, :],
    )


def _kernel(coef_ref, x_ref, noise_ref, cpcd_ref, e2_ref,
            w_up0, b_up0, w_up2, b_up2, w_up4, b_up4, wc_t, bc,
            wp0_t, bp0, wp2_t, bp2, wx0_t, bx0, wx2_t, bx2,
            wo0_t, bo0, wo2_t, bo2,
            out_ref, *, clip_denoised: bool, compute_dtype):
    f32 = jnp.float32

    def dot(a, b):
        # compute_dtype=bf16 halves the MXU pass count (mirrors the
        # composed tail under SDMConfig.dtype=bfloat16); accumulation
        # stays f32 either way
        return jnp.dot(a.astype(compute_dtype), b.astype(compute_dtype),
                       preferred_element_type=f32)

    # ---- t-dependent embedding tail (transposed orientation) ----------
    e2 = e2_ref[0]                              # (1, 2D)
    # upsampling layer 0 has in_features=1: W (128, 1) -> outer product
    u0 = _gelu(w_up0[:] * e2 + b_up0[:])        # (128, 2D)
    u2 = _gelu(dot(w_up2[:], u0) + b_up2[:])    # (512, 2D)
    u4 = _gelu(dot(w_up4[:], u2) + b_up4[:])    # (N, 2D)
    emb = _gelu(dot(u4, wc_t[:]) + bc[:])       # (N, D)

    # ---- x-dependent in/out processes ----------------------------------
    x_t = x_ref[0]                              # (N, 3)
    x = x_t + cpcd_ref[0]
    p = _sigmoid(dot(x, wp0_t[:]) + bp0[:])     # (N, D/2)
    p = _sigmoid(dot(p, wp2_t[:]) + bp2[:])     # (N, D)
    cc = jnp.concatenate([p, emb], axis=-1)     # (N, 2D)
    h = _sigmoid(dot(cc, wx0_t[:]) + bx0[:])    # (N, 1.5D)
    h = _sigmoid(dot(h, wx2_t[:]) + bx2[:])     # (N, D)
    h = _gelu(dot(h, wo0_t[:]) + bo0[:])        # (N, D/2)
    x0 = _gelu(dot(h, wo2_t[:]) + bo2[:])       # (N, 3)
    if clip_denoised:
        x0 = jnp.clip(x0, -1.0, 1.0)

    # ---- posterior sample ----------------------------------------------
    coef1 = coef_ref[0, 0]
    coef2 = coef_ref[0, 1]
    stdnz = coef_ref[0, 2]
    out_ref[0] = coef1 * x0 + coef2 * x_t + stdnz * noise_ref[0]


@partial(jax.jit,
         static_argnames=("clip_denoised", "interpret", "compute_dtype"))
def fused_denoise_step(
    x: jax.Array,        # (B, N, 3) current sample
    noise: jax.Array,    # (B, N, 3) this step's gaussian draw
    cond_pcd: jax.Array, # (B, N, 3)
    e2: jax.Array,       # (B, 2D) concat(timestep emb, text emb) for this t
    coefs: jax.Array,    # (3,) [posterior coef1, coef2, nonzero*std]
    p: DenoiseStepParams,
    clip_denoised: bool = False,
    interpret: bool = False,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """One DDPM ancestral step for every scene in the batch, one fused
    kernel launch per scene (grid over B)."""
    B, N, _ = x.shape
    D2 = e2.shape[-1]

    def wspec(arr):  # weights: every grid program reads the same block
        return pl.BlockSpec(arr.shape, lambda b: (0,) * arr.ndim)

    scene = pl.BlockSpec((1, N, 3), lambda b: (b, 0, 0))
    # (B, 1, 2D) with a (1, 1, 2D) block: Mosaic requires the last two
    # block dims to divide (8, 128) or equal the array dims; a (1, 2D)
    # block of a (B, 2D) array violates that for B > 1
    row = pl.BlockSpec((1, 1, D2), lambda b: (b, 0, 0))

    in_specs = [
        pl.BlockSpec((1, 3), lambda b: (0, 0), memory_space=pltpu.SMEM),
        scene, scene, scene, row,
    ] + [wspec(w) for w in p]

    out = pl.pallas_call(
        partial(_kernel, clip_denoised=clip_denoised,
                compute_dtype=jnp.dtype(compute_dtype)),
        out_shape=jax.ShapeDtypeStruct((B, N, 3), jnp.float32),
        grid=(B,),
        in_specs=in_specs,
        out_specs=scene,
        interpret=interpret,
    )(coefs.reshape(1, 3).astype(jnp.float32),
      x.astype(jnp.float32), noise.astype(jnp.float32),
      cond_pcd.astype(jnp.float32),
      e2.astype(jnp.float32).reshape(B, 1, D2),
      *[w.astype(jnp.float32) for w in p])
    return out


def _chain_kernel(coef_ref, x0_ref, noise_ref, cpcd_ref, e2_ref,
                  w_up0, b_up0, w_up2, b_up2, w_up4, b_up4, wc_t, bc,
                  wp0_t, bp0, wp2_t, bp2, wx0_t, bx0, wx2_t, bx2,
                  wo0_t, bo0, wo2_t, bo2,
                  out_ref, last_in_ref, *, clip_denoised: bool,
                  compute_dtype):
    """Whole-loop kernel body: one (b, t) grid step == one DDPM/DDIM step.

    The carried sample lives in ``out_ref`` — its index map is constant in
    t, so the block stays resident in VMEM across the scene's whole t
    sweep (initialized from the x0 input at t == 0, flushed to HBM when b
    advances).  ``last_in_ref`` captures the FINAL step's input x (the
    composed path recomputes the DenoiserOutput there post-kernel).
    """
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    f32 = jnp.float32

    def dot(a, b):
        return jnp.dot(a.astype(compute_dtype), b.astype(compute_dtype),
                       preferred_element_type=f32)

    @pl.when(t == 0)
    def _():
        out_ref[0] = x0_ref[0]

    x_t = out_ref[0]                            # (N, 3) current sample

    @pl.when(t == n_t - 1)
    def _():
        last_in_ref[0] = x_t

    e2 = e2_ref[0, 0]                           # (1, 2D)
    u0 = _gelu(w_up0[:] * e2 + b_up0[:])        # (128, 2D)
    u2 = _gelu(dot(w_up2[:], u0) + b_up2[:])    # (512, 2D)
    u4 = _gelu(dot(w_up4[:], u2) + b_up4[:])    # (N, 2D)
    emb = _gelu(dot(u4, wc_t[:]) + bc[:])       # (N, D)

    x = x_t + cpcd_ref[0]
    p = _sigmoid(dot(x, wp0_t[:]) + bp0[:])
    p = _sigmoid(dot(p, wp2_t[:]) + bp2[:])
    cc = jnp.concatenate([p, emb], axis=-1)
    h = _sigmoid(dot(cc, wx0_t[:]) + bx0[:])
    h = _sigmoid(dot(h, wx2_t[:]) + bx2[:])
    h = _gelu(dot(h, wo0_t[:]) + bo0[:])
    x0 = _gelu(dot(h, wo2_t[:]) + bo2[:])
    if clip_denoised:
        x0 = jnp.clip(x0, -1.0, 1.0)

    # whole (T, 3) table lives in SMEM (a (1, 3) block of a (T, 3) array
    # is an illegal Mosaic tiling for T > 1); index this step's row
    coef1 = coef_ref[t, 0]
    coef2 = coef_ref[t, 1]
    stdnz = coef_ref[t, 2]
    out_ref[0] = coef1 * x0 + coef2 * x_t + stdnz * noise_ref[0, 0]


@partial(jax.jit,
         static_argnames=("clip_denoised", "interpret", "compute_dtype"))
def fused_denoise_chain(
    x_init: jax.Array,    # (B, N, 3) initial noise image
    noise_tab: jax.Array, # (B, T, N, 3) per-step gaussian draws
    cond_pcd: jax.Array,  # (B, N, 3)
    e2_tab: jax.Array,    # (B, T, 2D) per-step (timestep, text) embedding
    coef_tab: jax.Array,  # (T, 3) per-step [c1, c2, nzm*std]
    p: DenoiseStepParams,
    clip_denoised: bool = False,
    interpret: bool = False,
    compute_dtype=jnp.float32,
):
    """The ENTIRE T-step sampling loop as ONE kernel launch.

    Returns ``(final_sample, last_step_input)``, both (B, N, 3).  The per
    -step version (:func:`fused_denoise_step`) still pays a kernel launch
    + scan bookkeeping per iteration; here the loop is the Pallas grid
    itself — per-step cost is pure compute plus a streamed 12 KB noise
    block.  Grid order is (b outer, t inner), both dimensions declared
    "arbitrary" (sequential) so the t recurrence is legal.
    """
    B, T, N, _ = noise_tab.shape
    D2 = e2_tab.shape[-1]

    def wspec(arr):
        return pl.BlockSpec(arr.shape, lambda b, t: (0,) * arr.ndim)

    in_specs = [
        pl.BlockSpec((T, 3), lambda b, t: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, N, 3), lambda b, t: (b, 0, 0)),       # x_init
        pl.BlockSpec((1, 1, N, 3), lambda b, t: (b, t, 0, 0)),  # noise
        pl.BlockSpec((1, N, 3), lambda b, t: (b, 0, 0)),       # cond_pcd
        pl.BlockSpec((1, 1, 1, D2), lambda b, t: (b, t, 0, 0)),  # e2
    ] + [wspec(w) for w in p]

    scene_out = pl.BlockSpec((1, N, 3), lambda b, t: (b, 0, 0))
    final, last_in = pl.pallas_call(
        partial(_chain_kernel, clip_denoised=clip_denoised,
                compute_dtype=jnp.dtype(compute_dtype)),
        out_shape=(jax.ShapeDtypeStruct((B, N, 3), jnp.float32),
                   jax.ShapeDtypeStruct((B, N, 3), jnp.float32)),
        grid=(B, T),
        in_specs=in_specs,
        out_specs=(scene_out, scene_out),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(coef_tab.astype(jnp.float32),
      x_init.astype(jnp.float32), noise_tab.astype(jnp.float32),
      cond_pcd.astype(jnp.float32),
      e2_tab.astype(jnp.float32).reshape(B, T, 1, D2),
      *[w.astype(jnp.float32) for w in p])
    return final, last_in
