"""Tracing / profiling helpers (SURVEY.md §5.1: the reference has only
wall-clock ``@profile`` decorators in its logger; here we expose the real
JAX profiler plus scan-amortized device timing).

Note on this repo's TPU transport (axon tunnel): per-dispatch latency is
~28 ms, so naive ``block_until_ready`` timings of sub-ms kernels measure
the tunnel, not the device.  ``scan_bench`` amortizes by iterating the
function inside one compiled ``lax.scan`` dispatch.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with TensorBoard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def scan_bench(
    step_fn: Callable,
    x0,
    reps: int = 50,
    warmup: int = 1,
    trials: int = 3,
) -> float:
    """Per-iteration device time of ``step_fn`` (shape-preserving x -> x),
    measured as one scan of ``reps`` iterations per dispatch.  Returns
    seconds/iteration.

    Synchronization: ``block_until_ready`` does not reliably block on the
    axon transport (PERF.md), so the jitted program reduces its output to a
    scalar and the timed region fetches it to the host — a forced transfer
    is the only dependable fence.  The ~one-dispatch overhead this adds is
    amortized over ``reps`` (use reps >= 20 on the tunneled TPU)."""

    @jax.jit
    def run(x):
        def body(c, _):
            return step_fn(c), None

        out, _ = jax.lax.scan(body, x, None, length=reps)
        return out, jnp.sum(
            jax.tree_util.tree_reduce(
                lambda a, l: a + jnp.sum(l).astype(jnp.float32),
                out, jnp.float32(0.0)))

    for _ in range(warmup):
        float(run(x0)[1])  # host fetch = real fence
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(run(x0)[1])
        best = min(best, time.perf_counter() - t0)
    return best / reps


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
