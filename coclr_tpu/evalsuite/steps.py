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


def preprocess_train(batch_seq_u8, rng, dtype, backend: str = "auto"):
    """[B, T, S, S, 3] uint8 -> normalized float: per-sample hflip p=.5 +
    ColorJitter(0.4,0.4,0.4,0.1) @ p=.3 consistent + normalize
    (eval/main_classifier.py train transform).

    Round 4 moved the jitter to the frame-flattened positional-select
    chain (augment.eval_color_jitter), 410 -> 430 clips/s. Round 5
    (profile-guided, tools/profile_step.py — the `rev`/`reduce` tail the
    r4 profile attributed to train-BN is actually HERE, per the trace's
    per-op `source` attribution):
      (a) the per-sample hflip moved to the UINT8 input. Flip commutes
          with the whole jitter chain exactly — every op is pixel-local
          and contrast's per-frame luma mean is flip-invariant — so the
          result is element-identical while the activation-sized bf16
          `rev.40` (0.90 ms/step, steps.py:79 in the r4 trace) becomes a
          4x-smaller u8 reverse.
      (b) on TPU backends the jitter+normalize chain runs as the fused
          Pallas VMEM kernel (ops/pallas_aug.py, gray disabled): one u8
          read + one `dtype` write per frame instead of the 4-position
          select chain's ~16 candidate passes + the unfused f32 contrast
          reduces + the separate normalize. Parameter draws are SHARED
          with the XLA path (augment.eval_color_jitter_params), so
          backend choice changes numerics only by f32-vs-dtype rounding.
    The per-clip-consistent semantics and the sp draw-sharing contract
    (factors are drawn with batch-shaped keys only, so T-chunked
    application under `sp` is exact) are unchanged. Under `sph` this
    function must see the FULL height: the contrast mean is per-frame
    (make_classifier_steps uploads train clips H-replicated and slices
    after — the round-4 H-sharded spec silently computed chunk-local
    means whenever jitter triggered)."""
    k_jit, k_flip = jax.random.split(rng)
    b, t = batch_seq_u8.shape[0], batch_seq_u8.shape[1]
    do_flip = jax.random.uniform(k_flip, (b,)) < 0.5
    x_u8 = jnp.where(do_flip[:, None, None, None, None],
                     batch_seq_u8[:, :, :, ::-1, :], batch_seq_u8)
    if backend == "auto":
        backend = ("pallas" if jax.default_backend() in ("tpu", "axon")
                   else "xla")
    if backend == "pallas":
        from coclr_tpu.ops.pallas_aug import fused_jitter_normalize

        fb, fc, fs, fh, codes = augment.eval_color_jitter_params(
            k_jit, b, p=0.3, strength=(0.4, 0.4, 0.4, 0.1))
        rep = lambda v: jnp.repeat(v, t)  # noqa: E731 (clip -> frame)
        s1, s2 = batch_seq_u8.shape[2], batch_seq_u8.shape[3]
        xp = jnp.transpose(x_u8.reshape(b * t, s1, s2, 3), (0, 3, 1, 2))
        y = fused_jitter_normalize(
            xp, rep(fb), rep(fc), rep(fs), rep(fh),
            jnp.full((b * t,), -1, jnp.int32), rep(codes), out_dtype=dtype)
        return jnp.transpose(y, (0, 2, 3, 1)).reshape(batch_seq_u8.shape)
    x = x_u8.astype(dtype) / jnp.asarray(255.0, dtype)
    x = augment.eval_color_jitter(x, k_jit, p=0.3,
                                  strength=(0.4, 0.4, 0.4, 0.1))
    return augment.normalize(x, dtype=dtype)


def preprocess_eval(batch_seq_u8, dtype):
    x = batch_seq_u8.astype(jnp.float32) / 255.0
    return augment.normalize(x, dtype=dtype)


def _train_step(state: ClassifierState, opt_state, batch, rng, lr,
                *, model, cfg, tx, axis_name, grad_axes=None, h_ax=None):
    if axis_name is not None:
        # fold over the DATA axes only: sp members of one data shard hold
        # T chunks of the SAME clips, so their aug/dropout draws must match
        # for the per-sample consistent transform to stay clip-consistent
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
    rng_aug, rng_drop = jax.random.split(jax.random.fold_in(rng, 0))
    x = preprocess_train(batch["seq"], rng_aug, cfg.dtype)
    if h_ax is not None:
        # clips arrive H-replicated (preprocess needs the full frame for
        # the per-frame contrast mean); each sph member takes its H chunk
        # here — a local contiguous slice, no collective
        hsz = x.shape[2] // jax.lax.axis_size(h_ax)
        x = jax.lax.dynamic_slice_in_dim(
            x, jax.lax.axis_index(h_ax) * hsz, hsz, axis=2)
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
                              axis_name=axis_name, grad_axes=grad_axes,
                              h_ax=h_ax)
    evals = functools.partial(_eval_step, model=model, cfg=cfg,
                              axis_name=axis_name)
    if mesh is not None and sp is not None:
        from coclr_tpu.parallel.mesh import lazy_shard_jit

        def batch_specs(batch):
            # clip leaves are [B, T, S, S, 3]: T is dim 1 here (the driver
            # squeezes the window dim), unlike pretrain's [B, 2, T, ...].
            # EVAL batches arrive host-augmented and the in-step preprocess
            # is pixel-local (normalize), so clips H-shard over `sph`
            # directly (dim 2).
            return {k: (P(DATA_AXIS, t_ax, h_ax) if batch[k].ndim >= 3
                        else P(DATA_AXIS)) for k in batch}

        def train_batch_specs(batch):
            # TRAIN clips stay H-REPLICATED into the step: the ColorJitter
            # contrast mean is per-FRAME, so an H-chunked preprocess would
            # compute a chunk-local mean and silently diverge from the
            # unsharded recipe whenever jitter triggers (round-5 fix;
            # T-chunking stays exact — factors are per-clip and every op
            # is frame-local). _train_step slices each member's H chunk
            # AFTER preprocess.
            return {k: (P(DATA_AXIS, t_ax) if batch[k].ndim >= 3
                        else P(DATA_AXIS)) for k in batch}

        train_call = lazy_shard_jit(
            train, mesh,
            lambda b: ((P(), P(), train_batch_specs(b), P(), P()),
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
