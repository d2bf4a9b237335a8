"""Multi-host execution: one JAX process per TPU host.

The reference's multi-node story is torch.distributed NCCL with one rank per
GPU (`/root/reference/main_nce.py:138-151`: env:// init, rank-0-only
printing via a builtins override). The TPU-native equivalent is JAX's
multi-process runtime: one Python process per HOST, each seeing only its
local chips, joined through the JAX coordination service
(`jax.distributed.initialize`); collectives then span all processes over
ICI/DCN exactly as they do single-host, because the mesh is built over
`jax.devices()` (global).

What changes relative to single-host (wired in train/pretrain.py):

- the mesh is built over devices sorted (process-major), so each host's
  chips own a CONTIGUOUS block of the `data` axis;
- each host's Loader loads only its block of every global batch
  (`Loader(process_shard=(rank, world))` — same seeded order on all hosts);
- batch upload assembles global `jax.Array`s from the host-local rows
  (`jax.make_array_from_process_local_data`, see make_upload);
- replicated state is uploaded with a replicated sharding (identical host
  values, as all hosts seed identically and restore the same checkpoint);
- logging, TensorBoard, and checkpoint writes happen on the primary host
  only (state is replicated, so host 0's copy is the whole checkpoint) —
  non-primary stdout is suppressed exactly like the reference's
  `setup_for_distributed` builtins-print override (main_nce.py:148-151).

Initialization modes (additive CLI knobs, both pretrain CLIs):

- `--multihost`: `jax.distributed.initialize()` with no arguments — on TPU
  pods the coordinator/process-id are auto-detected from the TPU metadata.
- `--coordinator host:port --num_processes N --process_id I`: explicit
  rendezvous, for CPU/GPU clusters and for the 2-process CPU equivalence
  test (tests/test_multihost.py, Gloo collectives).
"""

from __future__ import annotations

import builtins

import jax

_initialized = False


def maybe_initialize(cfg) -> None:
    """Idempotently start the JAX distributed runtime per `cfg`.

    Must run before the first device query (jax.devices() fixes the
    backend). No-op when neither `multihost` nor `coordinator` is set.
    """
    global _initialized
    if _initialized:
        return
    # tolerate an embedder having already started the runtime (e.g. the
    # test worker initializes before importing coclr_tpu, because this
    # package's import chain touches the backend) — jax.distributed
    # raises on double-init. No public "is initialized" predicate exists.
    from jax._src import distributed as _dist
    if getattr(_dist.global_state, "client", None) is not None:
        _initialized = True
        return
    multihost = getattr(cfg, "multihost", False)
    coordinator = getattr(cfg, "coordinator", "")
    if coordinator:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(getattr(cfg, "num_processes", 0)),
            process_id=int(getattr(cfg, "process_id", -1)))
        _initialized = True
    elif multihost:
        jax.distributed.initialize()  # TPU pod: auto-detected
        _initialized = True
    if _initialized:
        print(f"=> multihost: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.local_device_count()} local / "
              f"{jax.device_count()} global device(s)", flush=True)


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    return jax.process_index() == 0


def global_devices_process_major():
    """All devices ordered so each process's local devices form one
    contiguous run (sorted by (process_index, device id)). Meshes for
    multi-host DP are built over THIS order so the `data` axis decomposes
    into per-host blocks — the layout Loader(process_shard=...) and
    make_upload's process-local assembly assume."""
    return sorted(jax.devices(), key=lambda d: (d.process_index, d.id))


def suppress_nonprimary_print() -> None:
    """Reference `setup_for_distributed` (main_nce.py:148-151): replace
    builtins.print on non-primary hosts; `force=True` punches through."""
    if is_primary():
        return
    _orig = builtins.print

    def print_rank0(*args, **kwargs):
        if kwargs.pop("force", False):
            _orig(*args, **kwargs)

    builtins.print = print_rank0


__all__ = ["maybe_initialize", "process_count", "process_index",
           "is_primary", "global_devices_process_major",
           "suppress_nonprimary_print"]
