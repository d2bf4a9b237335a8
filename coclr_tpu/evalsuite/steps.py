"""Jitted classifier train/eval steps (finetune + linear probe).

Parity: eval/main_classifier.py:111-147 (param-group policy), :308-376 (train
loop semantics: 'last' freezes backbone AND keeps backbone BN in eval mode
while final_bn keeps training; 'ft' trains everything with backbone at lr/10)
and the on-device transform (hflip + jitter p=0.3 consistent + normalize).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import PartitionSpec as P

from coclr_tpu.ops import augment
from coclr_tpu.parallel.mesh import DATA_AXIS, shard_map_fn


@struct.dataclass
class ClassifierState:
    params: Any
    batch_stats: Any
    step: jnp.ndarray


def make_classifier_optimizer(cfg):
    """torch Adam / SGD(momentum=0.9) with L2-on-grad weight decay."""
    if cfg.optim == "adam":
        return optax.chain(optax.add_decayed_weights(cfg.wd),
                           optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    if cfg.optim == "sgd":
        return optax.chain(optax.add_decayed_weights(cfg.wd),
                           optax.trace(decay=0.9, nesterov=False))
    raise ValueError(cfg.optim)


def _group_scale(path_key: str, train_what: str) -> float:
    """eval/main_classifier.py:125-147: 'last' -> backbone frozen;
    'ft' -> backbone at lr/10; 'all' -> uniform."""
    is_backbone = path_key == "backbone"
    if train_what == "last":
        return 0.0 if is_backbone else 1.0
    if train_what == "ft":
        return 0.1 if is_backbone else 1.0
    return 1.0


def scale_updates_by_group(updates, train_what: str):
    return {k: jax.tree_util.tree_map(
        lambda u: u * _group_scale(k, train_what), v)
        for k, v in updates.items()}


def preprocess_train(batch_seq_u8, rng, dtype):
    """[B, T, S, S, 3] uint8 -> normalized float: per-sample hflip p=.5 +
    ColorJitter(0.4,0.4,0.4,0.1) @ p=.3 consistent + normalize
    (eval/main_classifier.py train transform).

    Round 4: jitter runs as the frame-flattened positional-select chain in
    the compute dtype (augment.eval_color_jitter — per-clip factors/order,
    so the consistent semantics and the sp/sph draw-sharing contract are
    unchanged). The previous per-sample vmap(scan(switch)) formulation in
    f32 executed all four jitter branches per scan step behind vmap/scan
    fusion barriers — the exact pathology DESIGN.md round 3 measured on
    the retrieval path — and held the finetune train step at 410
    clips/s/chip (bench.py --workload finetune; measured-after number in
    BASELINE.md round 4)."""
    k_jit, k_flip = jax.random.split(rng)
    x = batch_seq_u8.astype(dtype) / jnp.asarray(255.0, dtype)
    x = augment.eval_color_jitter(x, k_jit, p=0.3,
                                  strength=(0.4, 0.4, 0.4, 0.1))
    do_flip = jax.random.uniform(k_flip, (x.shape[0],)) < 0.5
    x = jnp.where(do_flip[:, None, None, None, None],
                  x[:, :, :, ::-1, :], x)
    return augment.normalize(x, dtype=dtype)


def preprocess_eval(batch_seq_u8, dtype):
    x = batch_seq_u8.astype(jnp.float32) / 255.0
    return augment.normalize(x, dtype=dtype)


def _train_step(state: ClassifierState, opt_state, batch, rng, lr,
                *, model, cfg, tx, axis_name, grad_axes=None):
    if axis_name is not None:
        # fold over the DATA axes only: sp members of one data shard hold
        # T chunks of the SAME clips, so their aug/dropout draws must match
        # for the per-sample consistent transform to stay clip-consistent
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
    rng_aug, rng_drop = jax.random.split(jax.random.fold_in(rng, 0))
    x = preprocess_train(batch["seq"], rng_aug, cfg.dtype)
    label = batch["label"]

    train_backbone = cfg.train_what != "last"

    def loss_fn(params):
        (logits, _), mut = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            x, train=True, train_backbone=train_backbone,
            mutable=["batch_stats"], rngs={"dropout": rng_drop})
        logz = jax.nn.logsumexp(logits, axis=1)
        loss = jnp.mean(logz - jnp.take_along_axis(
            logits, label[:, None], axis=1)[:, 0])
        return loss, (mut["batch_stats"], logits)

    (loss, (batch_stats, logits)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    if axis_name is not None:
        # grad_axes adds `sp` under sequence parallelism — one uniform
        # pmean is exact for backbone and head alike (ops/seqpar.py)
        grads = jax.lax.pmean(grads, grad_axes or axis_name)

    updates, opt_state = tx.update(grads, opt_state, state.params)
    updates = scale_updates_by_group(updates, cfg.train_what)
    params = optax.apply_updates(
        state.params, jax.tree_util.tree_map(lambda u: -lr * u, updates))

    from coclr_tpu.models.moco import topk_accuracy

    top1, top5 = topk_accuracy(logits, label)
    metrics = {"loss": loss, "top1": top1, "top5": top5}
    if axis_name is not None:
        metrics = jax.lax.pmean(metrics, axis_name)
    return (ClassifierState(params=params, batch_stats=batch_stats,
                            step=state.step + 1), opt_state, metrics)


def _eval_step(state: ClassifierState, batch, *, model, cfg, axis_name):
    """Metrics are exact means over VALID rows: an optional batch['valid']
    mask ([B] {0,1}) excludes duplicated padding rows (the driver pads the
    final partial val batch to a device multiple), so val numbers are
    invariant to the batch-size remainder."""
    x = preprocess_eval(batch["seq"], cfg.dtype)
    logits, feat = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        x, train=False)
    label = batch["label"]
    valid = batch.get("valid")
    if valid is None:
        valid = jnp.ones((logits.shape[0],), jnp.float32)
    else:
        valid = valid.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=1)
    per_loss = logz - jnp.take_along_axis(logits, label[:, None], axis=1)[:, 0]

    maxk = 5
    _, pred = jax.lax.top_k(logits, maxk)
    correct = pred == label[:, None]
    per_top1 = jnp.any(correct[:, :1], axis=1).astype(jnp.float32)
    per_top5 = jnp.any(correct[:, :5], axis=1).astype(jnp.float32)

    sums = {"loss": jnp.sum(per_loss * valid),
            "top1": jnp.sum(per_top1 * valid),
            "top5": jnp.sum(per_top5 * valid),
            "count": jnp.sum(valid)}
    if axis_name is not None:
        sums = jax.lax.psum(sums, axis_name)
    cnt = jnp.maximum(sums["count"], 1.0)
    metrics = {k: sums[k] / cnt for k in ("loss", "top1", "top5")}
    metrics["count"] = sums["count"]
    return metrics, logits, feat


def make_classifier_steps(model, cfg, mesh=None):
    from coclr_tpu.ops.seqpar import sp_axes
    from coclr_tpu.parallel.mesh import sp_axis_of

    tx = make_classifier_optimizer(cfg)
    axis_name = DATA_AXIS if mesh is not None else None
    sp = sp_axis_of(mesh)  # None, temporal axis name, or SPAxes
    t_ax, h_ax = sp_axes(sp)
    model_sp = getattr(model, "sp_axis", None)
    assert model_sp == sp, (
        f"model.sp_axis={model_sp!r} but the mesh's sp axis is {sp!r}: "
        "construct the classifier with sp_axis=sp_axis_of(mesh)")
    grad_axes = tuple(mesh.axis_names) if mesh is not None else None
    train = functools.partial(_train_step, model=model, cfg=cfg, tx=tx,
                              axis_name=axis_name, grad_axes=grad_axes)
    evals = functools.partial(_eval_step, model=model, cfg=cfg,
                              axis_name=axis_name)
    if mesh is not None and sp is not None:
        from coclr_tpu.parallel.mesh import lazy_shard_jit

        def batch_specs(batch):
            # clip leaves are [B, T, S, S, 3]: T is dim 1 here (the driver
            # squeezes the window dim), unlike pretrain's [B, 2, T, ...].
            # Unlike pretrain, eval batches arrive host-augmented and the
            # in-step preprocess is pixel-local (normalize), so clips can
            # be H-sharded over `sph` directly (dim 2).
            return {k: (P(DATA_AXIS, t_ax, h_ax) if batch[k].ndim >= 3
                        else P(DATA_AXIS)) for k in batch}

        train_call = lazy_shard_jit(
            train, mesh,
            lambda b: ((P(), P(), batch_specs(b), P(), P()),
                       (P(), P(), P())),
            batch_pos=2, donate_argnums=(0, 1))
        evals_call = lazy_shard_jit(
            evals, mesh,
            lambda b: ((P(), batch_specs(b)),
                       (P(), P(DATA_AXIS), P(DATA_AXIS))),
            batch_pos=1)
        return train_call, evals_call, tx
    if mesh is not None:
        train = shard_map_fn(train, mesh,
                             in_specs=(P(), P(), P(DATA_AXIS), P(), P()),
                             out_specs=(P(), P(), P()))
        evals = shard_map_fn(
            evals, mesh, in_specs=(P(), P(DATA_AXIS)),
            out_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)))
    return (jax.jit(train, donate_argnums=(0, 1)), jax.jit(evals), tx)
