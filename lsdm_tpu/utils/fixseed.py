"""Seed fixing (reference ``util/fixseed.py``) — numpy + a root JAX key."""

from __future__ import annotations

import random

import jax
import numpy as np


def fixseed(seed: int) -> jax.Array:
    """Seed host RNGs and return the root JAX PRNG key for threading."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
