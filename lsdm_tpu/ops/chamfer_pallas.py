"""Pallas TPU kernel for chamfer distance.

Computes per-point nearest-neighbour squared distances between two clouds
without materializing the (B, N, M) distance matrix in HBM: each grid
program streams 128-column tiles of the opposing cloud through VMEM,
accumulating running row minima and argmin indices.  The full matrix for
the SDM's shapes (6 x 1024 x 1024 fp32 = 25 MB) otherwise round-trips HBM
twice per direction per training step.

Differentiable via a custom VJP: chamfer gradients flow only through the
nearest-neighbour pairs, so the backward pass is two cheap gathers using
the argmin indices the forward kernel already produced.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILE_N = 128  # query rows per program
TILE_M = 128  # key columns per inner step


def _min_sqdist_kernel(x_ref, y_ref, min_ref, arg_ref):
    """Full x (N, 3) vs full y (M, 3) -> per-row (min sqdist, argmin) as
    (N // 128, 128) tiles.

    One program per cloud, full-array VMEM refs (KBs), statically unrolled
    row tiles, ``fori_loop`` column tiles, one full-block store at the end.
    This shape is deliberate — Mosaic rejects every 1-D-output variant:
    vmapped batches (squeezed block dim), (TILE,)-blocked rank-1 outputs
    (Mosaic T(128) vs XLA T(1024) layout), and dynamic rank-1 stores
    ("cannot statically prove index is a multiple of 1024").
    """
    N = x_ref.shape[0]
    M = y_ref.shape[0]
    rows_min, rows_arg = [], []
    for i in range(N // TILE_N):  # static unroll; N/128 <= 8 at our sizes
        x = x_ref[i * TILE_N:(i + 1) * TILE_N, :].astype(jnp.float32)
        x_sq = jnp.sum(x * x, axis=-1, keepdims=True)  # (TILE_N, 1)

        def col_tile(j, carry, x=x, x_sq=x_sq):
            running_min, running_arg = carry
            y = y_ref[pl.ds(j * TILE_M, TILE_M), :].astype(jnp.float32)
            y_sq = jnp.sum(y * y, axis=-1)  # (TILE_M,)
            xy = jax.lax.dot_general(
                x, y, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                # full-f32 passes: the |x|^2+|y|^2-2xy expansion cancels
                # catastrophically under default bf16 MXU passes (measured
                # 1.5e-3 rel fwd error on TPU vs HIGHEST)
                precision=jax.lax.Precision.HIGHEST,
            )  # (TILE_N, TILE_M)
            d = x_sq + y_sq[None, :] - 2.0 * xy
            tile_min = jnp.min(d, axis=1)
            tile_arg = jnp.argmin(d, axis=1).astype(jnp.int32) + j * TILE_M
            better = tile_min < running_min
            return (
                jnp.where(better, tile_min, running_min),
                jnp.where(better, tile_arg, running_arg),
            )

        init = (jnp.full((TILE_N,), jnp.inf, jnp.float32),
                jnp.zeros((TILE_N,), jnp.int32))
        mins, args = jax.lax.fori_loop(0, M // TILE_M, col_tile, init)
        rows_min.append(jnp.maximum(mins, 0.0))
        rows_arg.append(args)
    min_ref[:, :] = jnp.stack(rows_min)
    arg_ref[:, :] = jnp.stack(rows_arg)


def _directed_min_sqdist(x: jax.Array, y: jax.Array, interpret: bool):
    """(B, N, 3), (B, M, 3) -> ((B, N) min sqdist, (B, N) argmin) of x -> y."""
    B, N, _ = x.shape
    M = y.shape[1]
    assert N % TILE_N == 0 and M % TILE_M == 0, (
        f"pallas chamfer needs N, M multiples of 128; got {N}, {M}"
    )

    def one(xb, yb):
        mins, args = pl.pallas_call(
            _min_sqdist_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((N // TILE_N, TILE_N), jnp.float32),
                jax.ShapeDtypeStruct((N // TILE_N, TILE_N), jnp.int32),
            ),
            interpret=interpret,
        )(xb, yb)
        return mins.reshape(N), args.reshape(N)

    # Static per-sample loop (B is tiny); the kernel compiles once.
    per_b = [one(x[b], y[b]) for b in range(B)]
    return (jnp.stack([m for m, _ in per_b]),
            jnp.stack([a for _, a in per_b]))


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def chamfer_distance_pallas(
    x: jax.Array, y: jax.Array, interpret: bool = False
) -> jax.Array:
    """Bidirectional chamfer with pytorch3d reductions, Pallas-tiled.

    Same contract as :func:`lsdm_tpu.ops.pointcloud.chamfer_distance`
    (no masks; N, M multiples of 128).
    """
    loss, _ = _chamfer_fwd_impl(x, y, interpret)
    return loss


def _chamfer_fwd_impl(x, y, interpret):
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    min_xy, arg_xy = _directed_min_sqdist(x, y, interpret)  # (B, N)
    min_yx, arg_yx = _directed_min_sqdist(y, x, interpret)  # (B, M)
    loss = jnp.mean(jnp.mean(min_xy, axis=1) + jnp.mean(min_yx, axis=1))
    return loss, (x, y, arg_xy, arg_yx)


def _chamfer_fwd(x, y, interpret):
    return _chamfer_fwd_impl(x, y, interpret)


def _chamfer_bwd(interpret, res, g):
    x, y, arg_xy, arg_yx = res
    B, N, _ = x.shape
    M = y.shape[1]
    y_near = jnp.take_along_axis(y, arg_xy[..., None], axis=1)  # (B, N, 3)
    x_near = jnp.take_along_axis(x, arg_yx[..., None], axis=1)  # (B, M, 3)
    # d/dx mean_b mean_n |x_n - y_{m*}|^2 = 2 (x_n - y_near) / (B N)
    gx = 2.0 * (x - y_near) / (B * N)
    gy_from_xy = jnp.zeros_like(y).at[
        jnp.arange(B)[:, None], arg_xy
    ].add(-2.0 * (x - y_near) / (B * N))
    # y -> x direction
    gy = 2.0 * (y - x_near) / (B * M)
    gx_from_yx = jnp.zeros_like(x).at[
        jnp.arange(B)[:, None], arg_yx
    ].add(-2.0 * (y - x_near) / (B * M))
    return g * (gx + gx_from_yx), g * (gy + gy_from_xy)


chamfer_distance_pallas.defvjp(_chamfer_fwd, _chamfer_bwd)
