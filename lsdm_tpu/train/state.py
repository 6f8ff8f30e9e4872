"""Train state: parameters + optimizer + BatchNorm statistics + EMA.

Replaces the reference's ``MixedPrecisionTrainer`` master-param machinery
(``diffusion/fp16_util.py:148-236``) with the TPU-idiomatic scheme: fp32
parameters and optimizer state, bf16 *compute* inside the model (set via
``SDMConfig.dtype``).  No loss scaling is needed — bf16 has fp32's exponent
range, so the overflow-backoff logic the reference carries for fp16
(``fp16_util.py:189-208``) has no TPU counterpart by design.
"""

from __future__ import annotations

from typing import Any, Optional

import flax
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Optional[Any] = None


def create_train_state(
    variables: dict,
    tx: optax.GradientTransformation,
    ema: bool = False,
) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if ema else None,
    )


def update_ema(ema_params, params, rate: float = 0.9999):
    """EMA update (reference ``diffusion/nn.py:56-64``), as a pure pytree map."""
    return jax.tree.map(lambda e, p: e * rate + p * (1 - rate), ema_params, params)


def make_optimizer(
    lr: float = 1e-3,
    weight_decay: float = 0.01,
    lr_anneal_steps: int = 0,
    skip_nonfinite: bool = False,
):
    """AdamW matching the reference trainer (``run/train_sdm.py:42-44``),
    with optional linear LR annealing (the generic TrainLoop's ``_anneal_lr``
    in reference ``run/training_loop.py``).

    ``skip_nonfinite`` wraps the update in ``optax.apply_if_finite`` — the
    runtime fault handling that replaces the reference's fp16
    overflow-backoff (``fp16_util.py:193-208``) and its
    ``set_detect_anomaly`` NaN tripwire (``run/train_sdm.py:47``): non-finite
    gradient steps are skipped instead of corrupting the state.
    """
    if lr_anneal_steps:
        schedule = optax.linear_schedule(lr, 0.0, lr_anneal_steps)
    else:
        schedule = lr
    tx = optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                     weight_decay=weight_decay)
    if skip_nonfinite:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    return tx
