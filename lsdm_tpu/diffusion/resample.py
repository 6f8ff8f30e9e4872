"""Timestep schedule samplers (reference ``diffusion/resample.py``).

``UniformSampler`` is what LSDM training actually uses
(``run/train_sdm.py:32``).  ``LossSecondMomentResampler`` is the
importance-sampling variant; the reference syncs per-rank losses with
``dist.all_gather`` (``resample.py:83-104``) — here the same sync is done
with ``jax.experimental.multihost_utils.process_allgather`` when running
multi-process, and is a no-op on one process.
"""

from __future__ import annotations

import numpy as np
import jax


def create_named_schedule_sampler(name: str, num_timesteps: int):
    """(reference ``resample.py:8-21``)"""
    if name == "uniform":
        return UniformSampler(num_timesteps)
    if name == "loss-second-moment":
        return LossSecondMomentResampler(num_timesteps)
    raise NotImplementedError(f"unknown schedule sampler: {name}")


class ScheduleSampler:
    """Importance-sampled timestep distribution (reference ``resample.py:24-59``)."""

    def weights(self) -> np.ndarray:
        raise NotImplementedError

    def sample(self, batch_size: int, key: jax.Array):
        """Importance-sample timesteps. Returns (t, weights) device arrays."""
        w = self.weights()
        p = w / np.sum(w)
        logits = np.log(p)
        t = jax.random.categorical(key, jax.numpy.asarray(logits), shape=(batch_size,))
        weights_np = 1.0 / (len(p) * p)
        weights = jax.numpy.asarray(weights_np, dtype=jax.numpy.float32)[t]
        return t, weights


class UniformSampler(ScheduleSampler):
    def __init__(self, num_timesteps: int):
        self.num_timesteps = num_timesteps
        self._weights = np.ones([num_timesteps], dtype=np.float64)

    def weights(self) -> np.ndarray:
        return self._weights


class LossAwareSampler(ScheduleSampler):
    def update_with_local_losses(self, local_ts, local_losses):
        """Gather losses across processes then update
        (reference ``resample.py:71-104``)."""
        ts = np.asarray(jax.device_get(local_ts))
        losses = np.asarray(jax.device_get(local_losses))
        if jax.process_count() > 1:  # pragma: no cover - multi-host only
            from jax.experimental import multihost_utils

            ts = np.concatenate(multihost_utils.process_allgather(ts, tiled=False))
            losses = np.concatenate(
                multihost_utils.process_allgather(losses, tiled=False)
            )
        self.update_with_all_losses(ts.tolist(), losses.tolist())

    def update_with_all_losses(self, ts, losses):
        raise NotImplementedError


class LossSecondMomentResampler(LossAwareSampler):
    """(reference ``resample.py:124-154``)"""

    def __init__(self, num_timesteps: int, history_per_term: int = 10,
                 uniform_prob: float = 0.001):
        self.num_timesteps = num_timesteps
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob
        self._loss_history = np.zeros(
            [num_timesteps, history_per_term], dtype=np.float64
        )
        self._loss_counts = np.zeros([num_timesteps], dtype=np.int64)

    def weights(self) -> np.ndarray:
        if not self._warmed_up():
            return np.ones([self.num_timesteps], dtype=np.float64)
        weights = np.sqrt(np.mean(self._loss_history**2, axis=-1))
        weights /= np.sum(weights)
        weights *= 1 - self.uniform_prob
        weights += self.uniform_prob / len(weights)
        return weights

    def update_with_all_losses(self, ts, losses):
        for t, loss in zip(ts, losses):
            if self._loss_counts[t] == self.history_per_term:
                self._loss_history[t, :-1] = self._loss_history[t, 1:]
                self._loss_history[t, -1] = loss
            else:
                self._loss_history[t, self._loss_counts[t]] = loss
                self._loss_counts[t] += 1

    def _warmed_up(self) -> bool:
        return bool((self._loss_counts == self.history_per_term).all())
