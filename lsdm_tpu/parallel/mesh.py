"""Device mesh + sharding helpers.

TPU-native replacement for the reference's (inert) ``torch.distributed``
layer (``util/dist_util.py``, ``diffusion/resample.py:83-104`` — see
SURVEY.md §2.10):

  * ``jax.distributed.initialize`` for multi-host;
  * ``Mesh(("data", "model"))`` over ICI;
  * batch arrays sharded on ``data`` (dp); the flattened (B*max_objs) cloud
    axis of the PointNet++ backbone sharded over ``("data", "model")`` (an
    sp/tp-style split of the dominant compute);
  * parameters replicated (the SDM is ~10M params — far below the threshold
    where tensor-sharding weights pays);
  * loss means / gradient reductions become XLA-inserted ``psum``s.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed():
    """Multi-host bring-up (no-op single-process)."""
    if jax.process_count() > 1:  # pragma: no cover - multi-host only
        jax.distributed.initialize()


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Build a 2-D device mesh.  Default: all devices on the data axis."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices), 1)
    assert int(np.prod(shape)) == len(devices), (
        f"mesh shape {shape} != device count {len(devices)}"
    )
    return Mesh(devices.reshape(shape), axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard dim 0 (batch) on the data axis."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def stacked_batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard dim 1 (batch under a leading steps-per-dispatch chunk axis)
    on the data axis — the chunked trainer's input layout."""
    return NamedSharding(mesh, P(None, "data", *([None] * (ndim - 2))))


def obj_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for the flattened (B*max_objs, N, 3) cloud axis: split over
    BOTH mesh axes — the backbone is embarrassingly parallel over clouds."""
    return NamedSharding(mesh, P(("data", "model"), None, None))


def shard_count(sharding: NamedSharding) -> int:
    """Number of shards a NamedSharding splits its axis 0 into."""
    axes = sharding.spec[0]
    if axes is None:
        return 1
    if isinstance(axes, str):
        axes = (axes,)
    return int(np.prod([sharding.mesh.shape[a] for a in axes]))


def cloud_shard_map(fn, sharding: NamedSharding, out_ndim: int, *arrays):
    """Run a per-cloud op (batch axis 0, no cross-cloud interaction) under
    ``jax.shard_map`` over the sharded axis: each device computes its
    local shard with ZERO collectives.  This is how the Pallas kernels —
    which have no GSPMD partitioning rule — stay usable under a sharded
    object axis (round 5): shard_map hands each device plain per-shard
    arrays, so the kernel (and, via shard_map's autodiff, any custom
    VJP) runs exactly as on one chip.  Caller checks divisibility
    (``arrays[0].shape[0] % shard_count(sharding) == 0``)."""
    ax = sharding.spec[0]
    in_specs = tuple(P(ax, *([None] * (a.ndim - 1))) for a in arrays)
    out_spec = P(ax, *([None] * (out_ndim - 1)))
    return jax.shard_map(fn, mesh=sharding.mesh, in_specs=in_specs,
                         out_specs=out_spec, check_vma=False)(*arrays)


def shard_batch(mesh: Mesh, tree):
    """Device-put a pytree of host arrays with batch sharding."""
    return jax.tree.map(
        lambda a: jax.device_put(a, batch_sharding(mesh, np.ndim(a))), tree
    )
