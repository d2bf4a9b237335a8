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
DCN_AXIS = "dcn"
# temporal/spatial sequence parallelism — the axis names live with their
# collectives
from coclr_tpu.ops.seqpar import SP_AXIS, SPH_AXIS, SPAxes


def make_mesh(num_devices: int = 0, devices: Optional[Sequence] = None,
              dcn_size: int = 1, sp_size: int = 1,
              sph_size: int = 1) -> Mesh:
    """Data-parallel mesh over the first `num_devices` local devices.

    dcn_size > 1 adds a leading `dcn` axis for multi-slice DP: a 2-D
    (dcn, data) mesh where within-slice collectives ride ICI and only the
    hierarchical reduction crosses DCN (XLA decomposes multi-axis psum /
    all_gather that way). Collectives span both axes so semantics equal a
    flat `data` axis of the same total size (SURVEY.md §2.9: the reference
    has no multi-node analogue beyond flat NCCL DDP).

    sp_size > 1 adds a TRAILING `sp` axis (innermost = ICI-nearest
    neighbors, where the per-temporal-conv halo exchanges live) for
    temporal sequence parallelism: clips are sharded along T, batch along
    `data`. sph_size > 1 adds an `sph` axis AFTER `sp` (innermost of all)
    sharding the clip height axis the same way (round 4). The reference
    has no analogue (SURVEY §2.8/§5.7); see coclr_tpu/ops/seqpar.py.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    devices = np.asarray(devices)
    dcn_size = dcn_size or 1
    sp_size = sp_size or 1
    sph_size = sph_size or 1
    assert devices.size % (dcn_size * sp_size * sph_size) == 0, (
        f"{devices.size} devices not divisible by dcn_size*sp_size*sph_size="
        f"{dcn_size}*{sp_size}*{sph_size}")
    shape, names = [], []
    if dcn_size > 1:
        shape.append(dcn_size)
        names.append(DCN_AXIS)
    shape.append(-1)
    names.append(DATA_AXIS)
    if sp_size > 1:
        shape.append(sp_size)
        names.append(SP_AXIS)
    if sph_size > 1:
        shape.append(sph_size)
        names.append(SPH_AXIS)
    if len(names) == 1:
        return Mesh(devices, (DATA_AXIS,))
    return Mesh(devices.reshape(tuple(shape)), tuple(names))


def mesh_axes(mesh: Optional[Mesh]):
    """The axis-name argument for BATCH collectives over `mesh` (queue
    all_gather, grad pmean scope in DDP terms): None (no mesh), a single
    name (1-D), or a tuple (multi-slice). The `sp`/`sph` axes are excluded
    — they shard time/height, not the batch; sp_axis_of() exposes them."""
    if mesh is None:
        return None
    names = tuple(n for n in mesh.axis_names
                  if n not in (SP_AXIS, SPH_AXIS))
    return names if len(names) > 1 else names[0]


def sp_axis_of(mesh: Optional[Mesh]):
    """The sequence-parallel axes of `mesh`: None (no sp axes), the bare
    temporal axis name (temporal-only — the round-3 signature every
    existing caller/test relies on), or an SPAxes when `sph` is present."""
    if mesh is None:
        return None
    has_t = SP_AXIS in mesh.axis_names
    has_h = SPH_AXIS in mesh.axis_names
    if has_h:
        return SPAxes(t=SP_AXIS if has_t else None, h=SPH_AXIS)
    return SP_AXIS if has_t else None


def shard_map_fn(fn, mesh: Mesh, in_specs, out_specs, check_rep: bool = False):
    """shard_map with version-robust replication-check disabling (we rely on
    explicit psum/pmean for replicated outputs)."""
    try:
        return _shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                          check_vma=check_rep)
    except TypeError:  # older kwarg name
        return _shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                          check_rep=check_rep)


def lazy_shard_jit(fn, mesh, make_specs, batch_pos: int, donate_argnums=()):
    """jit(shard_map(fn)) built lazily per batch-dict STRUCTURE: sp meshes
    need per-leaf specs that mirror the batch pytree, which step builders
    never see up front (loaders yield different key sets per dataset mode).
    `make_specs(batch) -> (in_specs, out_specs)`; cache key = sorted
    (key, ndim) signature of the dict at argument position `batch_pos`.
    Shared by parallel/train_step.py and evalsuite/steps.py."""
    built = {}

    def _get(args):
        batch = args[batch_pos]
        sig = tuple(sorted((k, batch[k].ndim) for k in batch))
        if sig not in built:
            in_specs, out_specs = make_specs(batch)
            built[sig] = jax.jit(
                shard_map_fn(fn, mesh, in_specs=in_specs,
                             out_specs=out_specs),
                donate_argnums=donate_argnums)
        return built[sig]

    def call(*args):
        return _get(args)(*args)

    call.lower = lambda *args: _get(args).lower(*args)  # AOT introspection
    return call


__all__ = ["make_mesh", "mesh_axes", "sp_axis_of", "shard_map_fn",
           "lazy_shard_jit", "Mesh", "P", "DATA_AXIS", "DCN_AXIS", "SP_AXIS",
           "SPH_AXIS", "SPAxes"]
