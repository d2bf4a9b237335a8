"""Device mesh + shard_map helpers.

The reference's distribution model is pure data parallelism over NCCL ranks
(SURVEY.md §2.8). Here: a 1-D `data` mesh axis over ICI, one process driving
all chips, and (optionally) a leading `dcn` axis for multi-slice DP. State is
replicated; batches are sharded on `data`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.4.35 exposes shard_map at top level
    _shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

DATA_AXIS = "data"


def make_mesh(num_devices: int = 0, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` local devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_map_fn(fn, mesh: Mesh, in_specs, out_specs, check_rep: bool = False):
    """shard_map with version-robust replication-check disabling (we rely on
    explicit psum/pmean for replicated outputs)."""
    try:
        return _shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                          check_vma=check_rep)
    except TypeError:  # older kwarg name
        return _shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                          check_rep=check_rep)


__all__ = ["make_mesh", "shard_map_fn", "Mesh", "P", "DATA_AXIS"]
