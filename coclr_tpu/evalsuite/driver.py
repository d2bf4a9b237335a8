"""Classifier finetune / linear-probe driver (eval/main_classifier.py:80-422).

Single process drives all chips with pjit-style data parallelism, replacing
the reference's single-process nn.DataParallel scatter/gather.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from coclr_tpu.config import EvalConfig
from coclr_tpu.data import datasets as D
from coclr_tpu.data.loader import Loader
from coclr_tpu.models.classifier import LinearClassifier
from coclr_tpu.evalsuite.steps import ClassifierState, make_classifier_steps
from coclr_tpu.parallel import make_mesh
from coclr_tpu.train.lr import step_schedule
from coclr_tpu.train.pretrain import make_upload
from coclr_tpu.utils import torch_interop
from coclr_tpu.utils.checkpoint import (checkpoint_exists, load_checkpoint,
                                        neq_load, save_checkpoint)
from coclr_tpu.utils.logging import Logger, PlotterThread
from coclr_tpu.utils.meters import AverageMeter, ProgressMeter

NUM_CLASS = {"ucf101": 101, "hmdb51": 51, "k400": 400,
             "ucf101-f": 101, "hmdb51-f": 51, "k400-f": 400}


def set_path(cfg: EvalConfig):
    """eval/main_classifier.py:795-813 naming contract."""
    if cfg.resume:
        exp_path = os.path.dirname(os.path.dirname(cfg.resume))
    elif cfg.test:
        exp_path = os.path.dirname(os.path.dirname(cfg.test))
    else:
        pt = "_pt=%s" % cfg.pretrain.replace("/", "-") if cfg.pretrain else ""
        opt = "_SGD" if cfg.optim == "sgd" else "_Adam"
        exp_path = (
            "log-eval-{p}/{ds}-{dim}_sp{sp}_{model}_{net}{opt}_bs{bs}_lr{lr}"
            "_dp{dp}_wd{wd}_seq{nseq}_len{len}_ds{dsr}_train-{tw}{pt}").format(
                p=cfg.prefix, ds=cfg.dataset, dim=cfg.img_dim,
                sp=cfg.which_split, model=cfg.model, net=cfg.net, opt=opt,
                bs=cfg.batch_size, lr=cfg.lr, dp=cfg.dropout, wd=cfg.wd,
                nseq=1, len=cfg.seq_len, dsr=cfg.ds, tw=cfg.train_what, pt=pt)
    img_path = os.path.join(exp_path, "img")
    model_path = os.path.join(exp_path, "model")
    os.makedirs(img_path, exist_ok=True)
    os.makedirs(model_path, exist_ok=True)
    return img_path, model_path, exp_path


def build_model(cfg: EvalConfig, sp_axis: Optional[str] = None
                ) -> LinearClassifier:
    """train_what policy (eval/main_classifier.py:101-109)."""
    if cfg.train_what == "last":
        final_bn, final_norm, use_dropout = True, True, False
    else:
        final_bn, final_norm, use_dropout = False, False, True
    return LinearClassifier(
        num_class=NUM_CLASS[cfg.dataset], network=cfg.net,
        dropout=cfg.dropout, use_dropout=use_dropout,
        use_l2_norm=final_norm, use_final_bn=final_bn, dtype=cfg.dtype,
        sp_axis=sp_axis)


def build_eval_dataset(cfg: EvalConfig, mode: str, root: Optional[str] = None,
                       db_path: Optional[str] = None, window: bool = False,
                       policy=None):
    kw = dict(mode=mode, num_frames=cfg.seq_len, ds=cfg.ds,
              which_split=cfg.which_split, return_label=True,
              img_dim=cfg.img_dim, seed=cfg.seed, window=window,
              policy=policy,
              max_windows=getattr(cfg, "max_windows", 0))
    if root:
        kw["root"] = root
    name = cfg.dataset
    dr = cfg.data_root
    if name == "ucf101":
        return D.UCF101LMDB(data_root=dr, db_path=db_path, **kw)
    if name == "ucf101-f":
        return D.UCF101Flow_LMDB(data_root=dr, db_path=db_path, **kw)
    if name == "hmdb51":
        return D.HMDB51LMDB(data_root=dr, db_path=db_path, **kw)
    if name == "hmdb51-f":
        return D.HMDB51Flow_LMDB(data_root=dr, db_path=db_path, **kw)
    raise ValueError(f"unknown eval dataset {name!r}")


def init_classifier_state(cfg: EvalConfig, model) -> ClassifierState:
    sample = jnp.zeros((1, cfg.seq_len, cfg.img_dim, cfg.img_dim, 3),
                       jnp.float32)

    # single compiled init program (eager per-op dispatch is prohibitively
    # slow on the axon TPU backend)
    @jax.jit
    def init_fn(key):
        return model.init({"params": key, "dropout": jax.random.PRNGKey(1)},
                          sample, train=False)

    variables = init_fn(jax.random.PRNGKey(cfg.seed))
    return ClassifierState(params=variables["params"],
                           batch_stats=variables.get("batch_stats", {}),
                           step=jnp.zeros((), jnp.int32))


def load_pretrained_backbone(state: ClassifierState, path: str
                             ) -> ClassifierState:
    """--pretrain: encoder_q.0.* -> backbone.* (eval/main_classifier.py:
    246-262), tolerant load; accepts native or torch checkpoints."""
    if not checkpoint_exists(path):
        print(f"[Warning] no checkpoint found at '{path}'")
        return state
    if path.endswith((".pth", ".pth.tar", ".pt")):
        ckpt = torch_interop.load_torch_checkpoint(path)
        sd = {k[len("encoder_q.0."):]: v for k, v in ckpt["state_dict"].items()
              if k.startswith("encoder_q.0.")}
        bb = torch_interop.flax_from_torch_backbone(sd)
    else:
        ckpt = load_checkpoint(path)
        st = ckpt["state"]
        bb = {"params": st["params_q"]["backbone"],
              "batch_stats": st["stats_q"]["backbone"]}
    params = dict(state.params)
    stats = dict(state.batch_stats)
    params["backbone"] = neq_load(params["backbone"], bb["params"],
                                  verbose=False)
    stats["backbone"] = neq_load(stats["backbone"], bb["batch_stats"],
                                 verbose=False)
    print(f"=> loaded pretrained backbone from '{path}'")
    return state.replace(params=params, batch_stats=stats)


def run_classifier_train(cfg: EvalConfig, train_dataset=None,
                         val_dataset=None, max_steps: int = 0):
    from coclr_tpu.utils import (enable_compilation_cache,
                                 pin_malloc_mmap_threshold)

    enable_compilation_cache()
    pin_malloc_mmap_threshold()  # host-RSS creep fix (utils docstring)
    n_dev = len(jax.devices())
    if cfg.num_devices:
        n_dev = min(n_dev, cfg.num_devices)
    # `or 1` so sp_size 0 means disabled, like the sibling num_devices knob
    sp_size = (cfg.sp_size or 1) if n_dev > 1 else 1
    sph_size = (getattr(cfg, "sph_size", 1) or 1) if n_dev > 1 else 1
    mesh = make_mesh(cfg.num_devices, sp_size=sp_size,
                     sph_size=sph_size) if n_dev > 1 else None
    # under sequence parallelism the batch shards over the data axis only;
    # each sp group of sp_size*sph_size devices splits one batch shard
    # along T and/or H
    n_data = n_dev // (sp_size * sph_size)
    global_batch = cfg.batch_size * n_data

    from coclr_tpu.parallel.mesh import sp_axis_of
    model = build_model(cfg, sp_axis=sp_axis_of(mesh))
    state = init_classifier_state(cfg, model)
    train_step, eval_step, tx = make_classifier_steps(model, cfg, mesh)
    opt_state = jax.jit(tx.init)(state.params)

    img_path, model_path, exp_path = set_path(cfg)
    start_epoch, iteration, best_acc = cfg.start_epoch, 1, 0.0

    if cfg.resume and checkpoint_exists(cfg.resume):
        ckpt = load_checkpoint(cfg.resume, state_template=state,
                               opt_template=opt_state)
        state, opt_state = ckpt["state"], ckpt["opt_state"]
        start_epoch = ckpt["epoch"] + 1
        iteration = ckpt.get("iteration", 1)
        best_acc = ckpt.get("best_acc", 0.0)
        print(f"=> resumed '{cfg.resume}'")
    elif cfg.pretrain:
        state = load_pretrained_backbone(state, cfg.pretrain)
    else:
        print("=> train from scratch")

    if train_dataset is None:
        train_dataset = build_eval_dataset(cfg, "train")
    if val_dataset is None:
        val_dataset = build_eval_dataset(cfg, "val")
    train_loader = Loader(train_dataset, global_batch,
                          num_workers=cfg.workers, seed=cfg.seed,
                          worker_mode=cfg.worker_mode)
    val_loader = Loader(val_dataset, global_batch, shuffle=False,
                        num_workers=cfg.workers, drop_last=False,
                        seed=cfg.seed, worker_mode=cfg.worker_mode)

    plotter = PlotterThread(os.path.join(img_path, "train"))
    logger = Logger(img_path)
    # classifier batches are [B, T, S, S, 3] after the window squeeze: T is
    # dim 1 for the sp-sharded upload (pretrain's default is dim 2)
    put_batch, put_repl = make_upload(mesh, sp_t_dim=1)
    state, opt_state = put_repl((state, opt_state))
    run_key = jax.random.PRNGKey(cfg.seed + 7)

    def _squeeze(batch):
        # dataset yields [B, 1, T, S, S, 3] (single window); model wants
        # [B, T, S, S, 3] (main_classifier.py:341 squeeze)
        b = dict(batch)
        b["seq"] = batch["seq"][:, 0]
        b.pop("index", None)
        return b

    for epoch in range(start_epoch, cfg.epochs):
        lr = step_schedule(cfg.lr, epoch, cfg.schedule)
        train_loader.set_epoch(epoch)
        meters = {n: AverageMeter(n) for n in ("Loss", "acc@1", "acc@5")}
        for idx, batch in enumerate(train_loader):
            batch = put_batch(_squeeze(batch))
            state, opt_state, m = train_step(
                state, opt_state, batch, jax.random.fold_in(run_key, iteration),
                jnp.float32(lr))
            meters["Loss"].update(float(m["loss"]), global_batch)
            meters["acc@1"].update(float(m["top1"]), global_batch)
            meters["acc@5"].update(float(m["top5"]), global_batch)
            iteration += 1
            if max_steps and idx + 1 >= max_steps:
                break
        print(f"train epoch {epoch}: loss {meters['Loss'].avg:.4f} "
              f"top1 {meters['acc@1'].avg:.4f}")
        logger.log(f"train epoch {epoch} loss {meters['Loss'].avg:.4f} "
                   f"top1 {meters['acc@1'].avg:.4f}")
        plotter.add_data("global/loss", meters["Loss"].avg, epoch)
        plotter.add_data("global/top1", meters["acc@1"].avg, epoch)

        # validate
        vmeters = {n: AverageMeter(n) for n in ("Loss", "acc@1", "acc@5")}
        for vidx, batch in enumerate(val_loader):
            bsz = batch["seq"].shape[0]
            if bsz % n_data != 0:  # pad final partial batch (data shards)
                pad = n_data - bsz % n_data
                batch = {k: np.concatenate([v] + [v[-1:]] * pad)
                         for k, v in batch.items()}
                # mask padding rows out of the metric means (eval_step
                # averages over valid rows only)
                batch["valid"] = np.concatenate(
                    [np.ones(bsz, np.float32), np.zeros(pad, np.float32)])
            batch = put_batch(_squeeze(batch))
            m, _, _ = eval_step(state, batch)
            vmeters["Loss"].update(float(m["loss"]), bsz)
            vmeters["acc@1"].update(float(m["top1"]), bsz)
            vmeters["acc@5"].update(float(m["top5"]), bsz)
            if max_steps and vidx + 1 >= max_steps:
                break
        val_acc = vmeters["acc@1"].avg
        print(f"val epoch {epoch}: loss {vmeters['Loss'].avg:.4f} "
              f"top1 {val_acc:.4f}")
        logger.log(f"val epoch {epoch} top1 {val_acc:.4f}")

        is_best = val_acc > best_acc
        best_acc = max(val_acc, best_acc)
        save_checkpoint(
            {"epoch": epoch, "state": jax.device_get(state),
             "opt_state": jax.device_get(opt_state), "best_acc": best_acc,
             "iteration": iteration},
            is_best=is_best, gap=1,
            filename=os.path.join(model_path, f"epoch{epoch}.ckpt"),
            fmt=cfg.ckpt_format)

    plotter.close()
    return state, {"best_acc": best_acc, "exp_path": exp_path}
