"""Pretraining driver: the main_nce.py / main_coclr.py equivalent loop.

One process drives all chips (vs one process per GPU in the reference); the
epoch loop, LR stepping, meters, tensorboard channels, checkpoint rotation and
experiment-dir naming follow main_nce.py:96-353 / main_coclr.py:98-435.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from coclr_tpu.config import PretrainConfig
from coclr_tpu.data import datasets as D
from coclr_tpu.data.loader import Loader
from coclr_tpu.models import moco
from coclr_tpu.models.encoder import ProjectionEncoder
from coclr_tpu.ops.augment import make_pretrain_preprocess
from coclr_tpu.parallel import make_mesh, make_pretrain_step
from coclr_tpu.parallel.mesh import DATA_AXIS, mesh_axes
from coclr_tpu.train import init_surgery
from coclr_tpu.train.lr import get_lr
from coclr_tpu.utils import profiling
from coclr_tpu.utils.checkpoint import (checkpoint_exists, load_checkpoint,
                                        save_checkpoint)
from coclr_tpu.utils.logging import Logger, PlotterThread
from coclr_tpu.utils.meters import AverageMeter, ProgressMeter


def set_path(cfg: PretrainConfig, coclr: bool = False):
    """Experiment-dir naming contract (main_nce.py:426-442,
    main_coclr.py:509-525)."""
    if cfg.resume:
        exp_path = os.path.dirname(os.path.dirname(cfg.resume))
    elif cfg.test:
        exp_path = os.path.dirname(os.path.dirname(cfg.test))
    elif coclr:
        exp_path = (
            "log-{p}/{np}{model}-top{topk}{rev}_k{k}_{ds}-{dim}_{net}_"
            "bs{bs}_lr{lr}_seq{nseq}_len{len}_ds{dsr}").format(
                p=cfg.prefix, np=cfg.name_prefix, model=cfg.model,
                topk=cfg.topk, rev="-R" if cfg.reverse else "", k=cfg.moco_k,
                ds=cfg.dataset, dim=cfg.img_dim, net=cfg.net,
                bs=cfg.batch_size, lr=cfg.lr, nseq=cfg.num_seq,
                len=cfg.seq_len, dsr=cfg.ds)
    else:
        pt = ("_pt=%s" % str(cfg.pretrain).replace("/", "-")
              if cfg.pretrain else "")
        exp_path = (
            "log-{p}/{np}{model}_k{k}_{ds}-{dim}_{net}_"
            "bs{bs}_lr{lr}_seq{nseq}_len{len}_ds{dsr}{pt}").format(
                p=cfg.prefix, np=cfg.name_prefix, model=cfg.model,
                k=cfg.moco_k, ds=cfg.dataset, dim=cfg.img_dim, net=cfg.net,
                bs=cfg.batch_size, lr=cfg.lr, nseq=cfg.num_seq,
                len=cfg.seq_len, dsr=cfg.ds, pt=pt)
    img_path = os.path.join(exp_path, "img")
    model_path = os.path.join(exp_path, "model")
    os.makedirs(img_path, exist_ok=True)
    os.makedirs(model_path, exist_ok=True)
    return img_path, model_path, exp_path


def build_dataset(cfg: PretrainConfig, root: Optional[str] = None,
                  db_path: Optional[str] = None,
                  db_path_flow: Optional[str] = None):
    """cfg.dataset -> dataset object (main_nce.py:394-411,
    main_coclr.py:478-494)."""
    kw = dict(mode="train", num_frames=cfg.seq_len, ds=cfg.ds,
              return_label=True, img_dim=cfg.img_dim, seed=cfg.seed)
    if root:
        kw["root"] = root
    name = cfg.dataset
    dr = cfg.data_root
    if name == "ucf101-2clip":
        return D.UCF101LMDB_2CLIP(data_root=dr, db_path=db_path, **kw)
    if name == "ucf101-f-2clip":
        return D.UCF101Flow_LMDB_2CLIP(data_root=dr, db_path=db_path, **kw)
    if name == "k400-2clip":
        return D.K400_LMDB_2CLIP(data_root=dr, db_path=db_path, **kw)
    if name == "k400-f-2clip":
        return D.K400_Flow_LMDB_2CLIP(data_root=dr, db_path=db_path, **kw)
    if name == "ucf101-2stream-2clip":
        return D.UCF101_2STREAM_LMDB_2CLIP(
            data_root=dr, db_path_rgb=db_path, db_path_flow=db_path_flow,
            return_source=True, **kw)
    if name == "k400-2stream-2clip":
        return D.K400_2STREAM_LMDB_2CLIP(
            data_root=dr, db_path_rgb=db_path, db_path_flow=db_path_flow,
            return_source=True, **kw)
    raise ValueError(f"unknown dataset {cfg.dataset!r}")


def _device_count(cfg: PretrainConfig) -> int:
    n = len(jax.devices())
    return min(n, cfg.num_devices) if cfg.num_devices else n


def make_upload(mesh, sp_t_dim: int = 2):
    """(put_batch, put_repl) for `mesh`. Under sequence parallelism clip
    leaves (ndim >= 3) are uploaded T-SHARDED over `sp` (T at `sp_t_dim`:
    2 for pretrain's [B, 2, T, ...], 1 for the classifier's [B, T, ...]),
    so host->device traffic and device input memory scale 1/sp and the
    T-sharded preprocess/step consume them without a reshard.

    Multi-host (jax.process_count() > 1): each host's loader yields only
    its contiguous block of the global batch (Loader process_shard), and
    put_batch assembles the global jax.Array from those host-local rows
    (`jax.make_array_from_process_local_data`) — valid because the mesh is
    built process-major (multihost.global_devices_process_major), so the
    rows this host owns on the data axis ARE its loader block. put_repl
    uploads identical host values replicated (state is replicated; every
    host inits/restores the same bytes)."""
    if mesh is None:
        # single device: batches are pytrees (dict of arrays), map per leaf
        return (lambda tree: jax.tree.map(jnp.asarray, tree)), \
               (lambda tree: tree)
    from coclr_tpu.ops.seqpar import sp_axes as _sp_axes
    from coclr_tpu.parallel.mesh import sp_axis_of

    axes = mesh_axes(mesh)
    sp_t = _sp_axes(sp_axis_of(mesh)).t
    data_sh = NamedSharding(mesh, P(axes))
    repl_sh = NamedSharding(mesh, P())
    nproc = jax.process_count()

    # clips upload T-sharded over the temporal sp axis; H stays REPLICATED
    # even under spatial sp (`sph`) because the on-device aug chain
    # (crop/resize/blur) is not H-local — the step's H-sharded in_specs
    # then slice each member's chunk at the pre->step jit boundary for
    # free (replicated -> sharded is a local slice, no collective).
    if sp_t is not None:
        clip_sh = NamedSharding(
            mesh, P(axes, *((None,) * (sp_t_dim - 1)), sp_t))
    else:
        clip_sh = data_sh
    sp = sp_t if sp_t is not None else sp_axis_of(mesh)

    if nproc > 1:
        def _assemble(a, sh):
            a = np.asarray(a)
            gshape = (a.shape[0] * nproc,) + a.shape[1:]
            return jax.make_array_from_process_local_data(sh, a, gshape)

        def put_batch(x):
            return jax.tree.map(
                lambda a: _assemble(
                    a, clip_sh if np.ndim(a) >= 3 else data_sh), x)

        def put_repl(tree):
            return jax.tree.map(
                lambda a: jax.make_array_from_process_local_data(
                    repl_sh, np.asarray(jax.device_get(a))), tree)
    elif sp is not None:
        def put_batch(x):
            return jax.tree.map(
                lambda a: jax.device_put(
                    a, clip_sh if a.ndim >= 3 else data_sh), x)

        def put_repl(tree):
            return jax.device_put(tree, repl_sh)
    else:
        def put_batch(x):
            return jax.device_put(x, data_sh)

        def put_repl(tree):
            return jax.device_put(tree, repl_sh)

    return put_batch, put_repl


class _NullSink:
    """No-op Logger/PlotterThread stand-in for non-primary hosts."""

    def log(self, *a, **k):
        pass

    def add_data(self, *a, **k):
        pass

    def close(self):
        pass


class _PreemptionGuard:
    """SIGTERM/SIGINT -> finish the in-flight step, checkpoint, exit clean.

    The reference has no preemption handling (SURVEY §5.3: recovery is
    manual --resume from epoch-boundary checkpoints, so a preempted run
    loses the whole partial epoch AND must be relaunched by hand). TPU
    pods are preemptible in production, so this is a first-class additive
    subsystem here: on the first signal a flag is set and the step loop
    saves `preempt.ckpt` (full resume state, epoch wound back so --resume
    re-runs the interrupted epoch) before exiting with code 0. A second
    signal falls through to the previous handler (hard kill available).
    Installed only when running in the main thread (signal API limit).

    Multihost: the flag is agreed per step via multihost.agree_flag (a
    signal on any host exits ALL hosts at the same iteration), and only
    process 0's filesystem receives preempt.ckpt — resume must point at
    host 0's model dir (or a shared filesystem)."""

    def __init__(self):
        self.flagged = False
        self._prev = {}

    def __enter__(self):
        import signal
        import threading
        if threading.current_thread() is not threading.main_thread():
            return self
        for sig in (signal.SIGTERM, signal.SIGINT):
            self._prev[sig] = signal.signal(sig, self._handle)
        return self

    def _handle(self, sig, frame):
        import signal
        if self.flagged:  # second signal: restore + re-raise = hard stop
            signal.signal(sig, self._prev.get(sig, signal.SIG_DFL))
            raise KeyboardInterrupt
        self.flagged = True
        print(f"=> caught signal {sig}: will checkpoint and exit after "
              "the in-flight step", flush=True)

    def __exit__(self, *exc):
        import signal
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
        return False


def run_pretrain(cfg: PretrainConfig, dataset=None, max_steps: int = 0,
                 loader=None):
    """Train per cfg. `dataset`/`max_steps` are injectable for tests/bench."""
    from coclr_tpu.parallel import multihost
    from coclr_tpu.utils import (enable_compilation_cache,
                                 pin_malloc_mmap_threshold)

    multihost.maybe_initialize(cfg)  # before the first device query
    enable_compilation_cache()
    pin_malloc_mmap_threshold()  # the 129 GB drive-OOM fix (see docstring)
    nproc = jax.process_count()
    mesh_devices = None
    if nproc > 1:
        multihost.suppress_nonprimary_print()
        assert not cfg.num_devices, (
            "--num_devices is a single-host knob; under multihost every "
            "process contributes all its local devices")
        assert cfg.dcn_size == 1, (
            "multihost + --dcn_size both split the global mesh across "
            "hosts; use one (multihost already rides DCN between hosts)")
        # process-major order: each host's chips form one contiguous block
        # of the data axis, matching its Loader(process_shard) block
        mesh_devices = multihost.global_devices_process_major()
        _spg = (cfg.sp_size or 1) * (getattr(cfg, "sph_size", 1) or 1)
        assert jax.local_device_count() % _spg == 0, (
            f"sp_size*sph_size {_spg} must divide the "
            f"{jax.local_device_count()} local devices: an sp group cannot "
            "span hosts (halo exchanges would ride DCN every conv)")
    is_coclr = cfg.model == "coclr"
    n_dev = _device_count(cfg)
    # `or 1` so sp_size 0 means disabled, like the sibling num_devices knob
    sp_size = (cfg.sp_size or 1) if n_dev > 1 else 1
    sph_size = (getattr(cfg, "sph_size", 1) or 1) if n_dev > 1 else 1
    mesh = make_mesh(cfg.num_devices, devices=mesh_devices,
                     dcn_size=cfg.dcn_size, sp_size=sp_size,
                     sph_size=sph_size) if n_dev > 1 else None
    # under sequence parallelism the batch is sharded over the data shards
    # only; each sp group of sp_size*sph_size devices holds one batch
    # shard's clips split along T and/or H (coclr_tpu/ops/seqpar.py)
    global_batch = cfg.batch_size * (n_dev // (sp_size * sph_size))
    assert cfg.moco_k % global_batch == 0, \
        f"moco_k={cfg.moco_k} must be divisible by global batch {global_batch}"

    print(f"=> creating {cfg.model} model with '{cfg.net}' backbone "
          f"on {n_dev} device(s)"
          + (f" (sequence-parallel x{sp_size})" if sp_size > 1 else "")
          + (f" (spatial-sequence-parallel x{sph_size})"
             if sph_size > 1 else ""))
    from coclr_tpu.parallel.mesh import sp_axis_of
    encoder = ProjectionEncoder(network=cfg.net, dim=cfg.moco_dim,
                                dtype=cfg.dtype, sp_axis=sp_axis_of(mesh))
    rng = jax.random.PRNGKey(cfg.seed)
    sample = jnp.zeros((1, cfg.seq_len, cfg.img_dim, cfg.img_dim, 3),
                       jnp.float32)
    state = moco.init_moco_state(rng, encoder, cfg.model, sample,
                                 dim=cfg.moco_dim, K=cfg.moco_k)
    preprocess = make_pretrain_preprocess(cfg)
    step_fn, tx = make_pretrain_step(encoder, cfg, mesh, preprocess)
    opt_state = jax.jit(tx.init)(state.params_q)

    img_path, model_path, exp_path = set_path(cfg, coclr=is_coclr)
    start_epoch, iteration, best_acc = cfg.start_epoch, 1, 0.0

    # Multihost: only process 0 reads checkpoints (they are written
    # primary-only, so on a non-shared filesystem other hosts would
    # silently init from scratch while host 0 resumes — replicated state
    # would diverge; ADVICE-r3 medium). Non-primaries keep the scratch
    # init and receive host 0's bytes via broadcast below.
    primary = multihost.is_primary()
    if not primary:
        pass  # state stays at the (identical-seed) scratch init
    elif cfg.resume and checkpoint_exists(cfg.resume):
        ckpt = load_checkpoint(cfg.resume, state_template=state,
                               opt_template=opt_state)
        state, opt_state = ckpt["state"], ckpt["opt_state"]
        start_epoch = ckpt["epoch"] + 1
        iteration = ckpt.get("iteration", 1)
        best_acc = ckpt.get("best_acc", 0.0)
        print(f"=> resumed '{cfg.resume}' (epoch {ckpt['epoch']})")
    elif is_coclr and isinstance(cfg.pretrain, (tuple, list)) \
            and list(cfg.pretrain) != ["random", "random"]:
        state = init_surgery.coclr_surgery(state, tuple(cfg.pretrain))
    elif cfg.pretrain and not is_coclr:
        state = init_surgery.init_pretrain_weights(state, cfg.pretrain)
    else:
        print("=> train from scratch")
    if nproc > 1:
        state, opt_state, meta = multihost.broadcast_from_primary(
            (state, opt_state,
             (start_epoch, iteration, float(best_acc))))
        start_epoch, iteration, best_acc = (
            int(meta[0]), int(meta[1]), float(meta[2]))

    if dataset is None:
        dataset = build_dataset(cfg)
    if loader is None:
        loader = Loader(dataset, batch_size=global_batch,
                        num_workers=cfg.workers, seed=cfg.seed,
                        worker_mode=cfg.worker_mode,
                        process_shard=((jax.process_index(), nproc)
                                       if nproc > 1 else None))

    if primary:
        plotter = PlotterThread(os.path.join(img_path, "train"))
        logger = Logger(img_path)
    else:  # reference: rank-0-only logging (main_nce.py:148-151,263-267)
        plotter = _NullSink()
        logger = _NullSink()
    put_batch, put_repl = make_upload(mesh)
    state, opt_state = put_repl((state, opt_state))
    run_key = jax.random.PRNGKey(cfg.seed + 1)

    train_acc = 0.0
    preempted = False
    guard = _PreemptionGuard()
    guard.__enter__()
    for epoch in range(start_epoch, cfg.epochs):
        if preempted:
            break
        loader.set_epoch(epoch)
        lr = get_lr(cfg, epoch)

        names = ["Time", "Data", "Loss", "acc@1", "acc@5"]
        if cfg.model in ("coclr", "ubernce"):
            # reference meter set (main_coclr.py:348-359); its
            # 'Sampling-Acc@k' meter is declared but never updated — a dead
            # always-zero column we deliberately do not replicate
            names += ["Self-acc@1", "Self-acc@5"]
        meters = {name: AverageMeter(name) for name in names}
        progress = ProgressMeter(len(loader), list(meters.values()),
                                 prefix=f"Epoch:[{epoch}]")
        tic = time.time()
        end = time.time()
        pending = None  # (metrics_arrays, batch_size) from previous step

        def drain(pending):
            if pending is None:
                return
            m, bs = pending
            meters["Loss"].update(float(m["loss"]), bs)
            meters["acc@1"].update(float(m["top1"]), bs)
            meters["acc@5"].update(float(m["top5"]), bs)
            if "top1_self" in m and "Self-acc@1" in meters:
                meters["Self-acc@1"].update(float(m["top1_self"]), bs)
                meters["Self-acc@5"].update(float(m["top5_self"]), bs)

        # --profile_steps N: capture an XLA device trace of N steady-state
        # steps of epoch 0 into <exp>/trace (view in TensorBoard/Perfetto).
        # Starts at step 10 (past compile/warmup) when the epoch is long
        # enough, else as late as fits.
        prof_at = -1
        if cfg.profile_steps and epoch == start_epoch:
            prof_at = max(0, min(10, len(loader) - cfg.profile_steps))
        prof_ctx = None

        steps_this_epoch = 0
        for idx, batch in enumerate(loader):
            meters["Data"].update(time.time() - end)
            if idx == prof_at:
                prof_ctx = profiling.device_trace(
                    os.path.join(exp_path, "trace"))
                prof_ctx.__enter__()
            batch = put_batch(batch)
            with profiling.step_annotation("train", iteration):
                state, opt_state, metrics = step_fn(
                    state, opt_state, batch,
                    jax.random.fold_in(run_key, iteration), jnp.float32(lr))
            if prof_ctx is not None and idx == prof_at + cfg.profile_steps - 1:
                jax.block_until_ready(metrics["loss"])
                prof_ctx.__exit__(None, None, None)
                prof_ctx = None
                print(f"=> device trace ({cfg.profile_steps} steps) written "
                      f"to {os.path.join(exp_path, 'trace')}")
            drain(pending)  # read step i-1's metrics while step i runs
            pending = (metrics, global_batch)
            meters["Time"].update(time.time() - end)
            end = time.time()
            if idx % cfg.print_freq == 0:
                drain(pending)
                pending = None
                progress.display(idx)
                plotter.add_data("local/loss", meters["Loss"].local_avg,
                                 iteration)
                plotter.add_data("local/top1", meters["acc@1"].local_avg,
                                 iteration)
            iteration += 1
            steps_this_epoch += 1
            # Under multihost the guard flag must be AGREED across hosts:
            # a SIGTERM on a subset of hosts would otherwise stop that
            # subset's collectives while the rest block in the next psum —
            # a distributed hang, not a clean preemption (ADVICE-r3 low).
            # agree_flag is a tiny per-step allgather, multihost-only.
            if multihost.agree_flag(guard.flagged):
                guard.flagged = True  # exit uniformly even if not signaled
                drain(pending)
                pending = None
                ck = os.path.join(model_path, "preempt.ckpt")
                # epoch wound back one: --resume restarts THIS epoch (the
                # partial epoch's updates are kept in `state`; re-running
                # its data is the same epoch-granularity semantics as the
                # reference's boundary-only checkpoints, minus the lost work)
                if primary:  # state is replicated: host 0 holds it all
                    save_checkpoint(
                        {"epoch": epoch - 1, "state": jax.device_get(state),
                         "opt_state": jax.device_get(opt_state),
                         "best_acc": best_acc, "iteration": iteration},
                        is_best=False, gap=0, filename=ck, keep_all=True,
                        fmt=cfg.ckpt_format)
                print(f"=> preemption checkpoint written: {ck} "
                      f"(resume with --resume {ck})", flush=True)
                preempted = True
                break
            if max_steps and steps_this_epoch >= max_steps:
                break
        if prof_ctx is not None:  # epoch ended inside the trace window
            prof_ctx.__exit__(None, None, None)
        drain(pending)
        if preempted:  # partial epoch: no boundary logging/checkpoint
            break

        from coclr_tpu.utils import malloc_trim
        malloc_trim()  # return any residual arena slack to the OS
        print(f"Epoch: [{epoch}][{steps_this_epoch}] T-epoch:"
              f"{time.time() - tic:.2f}")
        logger.log(f"epoch {epoch} loss {meters['Loss'].avg:.4f} "
                   f"top1 {meters['acc@1'].avg:.4f}")
        plotter.add_data("global/loss", meters["Loss"].avg, epoch)
        plotter.add_data("global/top1", meters["acc@1"].avg, epoch)
        train_acc = meters["acc@1"].avg

        if (epoch % cfg.save_freq == 0) or (epoch == cfg.epochs - 1):
            is_best = train_acc > best_acc
            best_acc = max(train_acc, best_acc)
            if not primary:  # replicated state: host 0's copy is the ckpt
                continue
            save_checkpoint(
                {"epoch": epoch, "state": jax.device_get(state),
                 "opt_state": jax.device_get(opt_state),
                 "best_acc": best_acc, "iteration": iteration},
                is_best=is_best, gap=cfg.save_freq,
                filename=os.path.join(model_path, f"epoch{epoch}.ckpt"),
                keep_all="k400" in cfg.dataset, fmt=cfg.ckpt_format)

    guard.__exit__()
    if preempted:
        print(f"Training preempted at ep {epoch}; resume from "
              f"{os.path.join(model_path, 'preempt.ckpt')}")
    else:
        print(f"Training from ep {start_epoch} to ep {cfg.epochs} finished")
    plotter.close()
    return state, opt_state, {"best_acc": best_acc, "exp_path": exp_path,
                              "train_acc": train_acc, "preempted": preempted}
