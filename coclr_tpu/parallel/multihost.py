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


def _distributed_is_initialized() -> bool:
    if hasattr(jax.distributed, "is_initialized"):  # public since 0.4.34
        return bool(jax.distributed.is_initialized())
    from jax._src import distributed as _dist  # pre-0.4.34 fallback

    return getattr(_dist.global_state, "client", None) is not None


def initialize_from_args(args) -> None:
    """CLI-entry hook: start the distributed runtime from parsed argparse
    flags BEFORE any backend-touching import.

    jax.distributed.initialize() must run before the first JAX backend
    touch (device query, array creation); the training stack's import
    chain is kept backend-clean, but CLI mains call this defensively right
    after parse_args, before importing coclr_tpu.train.* — the import-
    order crash this prevents was ADVICE-r3's high finding. `args` only
    needs .multihost/.coordinator/.num_processes/.process_id attributes
    (the two pretrain CLIs define them; the eval classifier is single-
    process by design, mirroring the reference's nn.DataParallel eval —
    SURVEY §2.8 — and neither defines the flags nor calls this hook)."""
    maybe_initialize(args)


def maybe_initialize(cfg) -> None:
    """Idempotently start the JAX distributed runtime per `cfg`.

    Must run before the first device query (jax.devices() fixes the
    backend). No-op when neither `multihost` nor `coordinator` is set.
    """
    global _initialized
    if _initialized:
        return
    # tolerate an embedder having already started the runtime (e.g. the
    # CLI mains early-initialize before importing the training stack) —
    # jax.distributed raises on double-init. jax >= 0.4.34 has the public
    # predicate; fall back to the private state only on older versions.
    if _distributed_is_initialized():
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


def broadcast_from_primary(tree):
    """Replace every host's copy of a host-local pytree with process 0's.

    Used on the restored/initial training state before upload: each host
    independently loads --resume (checkpoints are written primary-only), so
    on a non-shared filesystem non-primary hosts would silently fall back
    to from-scratch init while host 0 resumes — and the replicated-upload
    path (make_upload's put_repl) assumes host-identical bytes without
    verification. The reference avoids this class of bug because DDP
    broadcasts rank-0 parameters at wrap time (torch DDP semantics);
    this is the JAX equivalent (ADVICE-r3 medium finding).

    No-op single-process. Arrays are broadcast via multihost_utils
    (psum-based, one-time cost at startup); non-array leaves (ints,
    floats, None) ride along by being packed as arrays where possible.
    """
    if jax.process_count() == 1:
        return tree
    import numpy as np
    from jax.experimental import multihost_utils

    leaves, treedef = jax.tree.flatten(tree)
    arrs = [np.asarray(jax.device_get(x)) for x in leaves]
    out = multihost_utils.broadcast_one_to_all(arrs)
    # preserve python scalar-ness for leaves that came in as int/float
    restored = []
    for orig, got in zip(leaves, out):
        if isinstance(orig, (int, np.integer)):
            restored.append(type(orig)(got) if isinstance(orig, int)
                            else got)
        elif isinstance(orig, float):
            restored.append(float(got))
        else:
            restored.append(got)
    return jax.tree.unflatten(treedef, restored)


def agree_flag(flag: bool) -> bool:
    """Cross-host OR of a local boolean (one tiny allgather).

    Preemption agreement: a SIGTERM delivered to only a subset of hosts
    must not make that subset stop issuing collectives while the rest
    block in the next psum — a distributed hang instead of a clean exit
    (ADVICE-r3 low finding). The step loop calls this once per step under
    multihost so every host leaves the loop at the same iteration.
    Single-process: returns the flag unchanged, no device work."""
    if jax.process_count() == 1:
        return flag
    import numpy as np
    from jax.experimental import multihost_utils

    return bool(multihost_utils.process_allgather(
        np.int32(bool(flag))).max())


__all__ = ["maybe_initialize", "initialize_from_args", "process_count",
           "process_index", "is_primary", "global_devices_process_major",
           "suppress_nonprimary_print", "broadcast_from_primary",
           "agree_flag"]
