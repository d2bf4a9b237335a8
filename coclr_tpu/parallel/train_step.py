"""The jitted pretrain step: InfoNCE / UberNCE / CoCLR under shard_map.

One fused, donated step per iteration covers what the reference spreads over
model.forward + loss + backward + optimizer + buffer mutation
(main_nce.py:307-343, main_coclr.py:372-423, model/pretrain.py):

  augment (optional, on-device) -> q-encode -> EMA -> shuffled k-encode ->
  logits -> variant loss -> pmean(grads) -> Adam -> all_gather(k) -> enqueue

State and optimizer state are replicated across the `data` mesh axis; batches
are sharded. Gradient averaging via `jax.lax.pmean` matches DDP's all-reduce
mean. CoCLR's "no optimizer step until the queue is full" gate
(main_coclr.py:403-406) is a functional select on (params, opt_state).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from coclr_tpu.config import PretrainConfig
from coclr_tpu.models import moco
from coclr_tpu.models.moco import MoCoState
from coclr_tpu.parallel.mesh import (DATA_AXIS, lazy_shard_jit, mesh_axes,
                                     shard_map_fn, sp_axis_of)


def make_optimizer(cfg: PretrainConfig):
    """torch.optim.Adam semantics: L2 weight decay added to the gradient
    before the moment update (main_nce.py:200)."""
    return optax.chain(
        optax.add_decayed_weights(cfg.wd),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
    )


def _split_clips(seq):
    """[b, 2, T, H, W, C] -> (clip1, clip2) (pretrain.py:147-150)."""
    return seq[:, 0], seq[:, 1]


def _pretrain_step(state: MoCoState, opt_state, batch, rng, lr,
                   *, encoder, cfg: PretrainConfig, tx, axis_name,
                   preprocess_fn, grad_axes=None, sp_axis=None):
    rng = jax.random.fold_in(rng, 0)
    rng_pre, rng_shuffle, rng_self = jax.random.split(rng, 3)

    if preprocess_fn is not None:
        if axis_name is not None:
            rng_pre = jax.random.fold_in(rng_pre, jax.lax.axis_index(axis_name))
        if sp_axis is not None:
            # fused preprocess on a T chunk: pass the global frame context
            # so per-frame draws match the unsharded stream (augment.py).
            # `sp_axis` here is always the TEMPORAL axis name (the fused
            # path is asserted incompatible with spatial sp below).
            clip_key = "seq" if "seq" in batch else "seq_rgb"
            t_loc = batch[clip_key].shape[2]
            off = jax.lax.axis_index(sp_axis) * t_loc
            batch = preprocess_fn(
                batch, rng_pre,
                sp_ctx=(t_loc * jax.lax.axis_size(sp_axis), off))
        else:
            batch = preprocess_fn(batch, rng_pre)

    variant = cfg.model

    if variant == "coclr":
        # block1/block2 carry (primary, other) modality per clip
        # (pretrain.py:344-355); --reverse swaps roles.
        primary = batch["seq_flow"] if cfg.reverse else batch["seq_rgb"]
        other = batch["seq_rgb"] if cfg.reverse else batch["seq_flow"]
        x1, x2 = _split_clips(primary)
        _, f2 = _split_clips(other)
    else:
        x1, x2 = _split_clips(batch["seq"])
        f2 = None

    # EMA update before the key forward (pretrain.py:161)
    params_k = moco.momentum_update(state.params_q, state.params_k, cfg.moco_m)
    state = state.replace(params_k=params_k)

    # key encoding with shuffle-BN (no gradients)
    k, stats_k = moco.encode_keys(encoder, state, x2, rng_shuffle, axis_name,
                                  cfg.bn_shuffle)
    k = jax.lax.stop_gradient(k)

    # CoCLR: frozen sampler on the other modality, eval mode
    # (pretrain.py:379-381, main_coclr.py:363)
    if variant == "coclr":
        kf = encoder.apply(
            {"params": state.params_s, "batch_stats": state.stats_s},
            f2, train=False)
        kf = moco.l2_normalize(kf.astype(jnp.float32))
        kf = jax.lax.stop_gradient(kf)

    # targets / masks (pre-enqueue queue contents, like the reference)
    if variant == "ubernce":
        mask = moco.ubernce_mask(batch["label"], state.queue_label)
    elif variant == "coclr":
        mask = moco.coclr_mask(kf, batch["vname"], state.queue_second,
                               state.queue_vname, state.queue_label, cfg.topk)

    queue_is_full = (jnp.all(state.queue_label != -1)
                     if variant == "coclr" else jnp.bool_(True))

    def loss_fn(params_q):
        q, mut = encoder.apply(
            {"params": params_q, "batch_stats": state.stats_q},
            x1, train=True, mutable=["batch_stats"])
        q = moco.l2_normalize(q.astype(jnp.float32))
        logits = moco.moco_logits(q, k, state.queue, cfg.moco_t)
        if variant == "infonce":
            loss = moco.infonce_loss(logits)
        elif variant == "ubernce":
            loss = moco.ubernce_loss(logits, mask)
        elif variant == "coclr":
            # 90%: mask out self-similarity where other positives exist
            # (main_coclr.py:382-390); one draw per device per step, like
            # one random.random() per rank per iteration.
            r = rng_self
            if axis_name is not None:
                r = jax.random.fold_in(r, jax.lax.axis_index(axis_name))
            drop_self = jax.random.uniform(r) < 0.9
            mask_sum = jnp.sum(mask, axis=1)
            col0 = jnp.where(drop_self & (mask_sum != 1), 0.0, mask[:, 0])
            mask_used = mask.at[:, 0].set(col0)
            loss = moco.multi_nce_loss(logits, mask_used)
        else:
            raise ValueError(variant)
        return loss, (mut["batch_stats"], logits)

    (loss, (stats_q, logits)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params_q)

    if axis_name is not None:
        # under sequence parallelism grads must ALSO be pmean'd over `sp`:
        # backbone member grads are sp_size x their true per-member
        # contribution (head grads replicated) — see ops/seqpar.py and
        # tests/test_seqpar.py::test_sp_grads_pmean_combine_is_exact
        grads = jax.lax.pmean(grads, grad_axes or axis_name)

    updates, new_opt_state = tx.update(grads, opt_state, state.params_q)
    new_params_q = optax.apply_updates(
        state.params_q, jax.tree_util.tree_map(lambda u: -lr * u, updates))

    # CoCLR queue-fill gate: no parameter/optimizer update until full
    gate = queue_is_full
    new_params_q = jax.tree_util.tree_map(
        lambda new, old: jnp.where(gate, new, old), new_params_q, state.params_q)
    new_opt_state = jax.tree_util.tree_map(
        lambda new, old: jnp.where(gate, new, old), new_opt_state, opt_state)

    # metrics (pmean over devices)
    zeros = jnp.zeros((logits.shape[0],), jnp.int32)
    metrics = {"loss": loss}
    if variant == "infonce":
        metrics["top1"], metrics["top5"] = moco.topk_accuracy(logits, zeros)
    else:
        metrics["top1"], metrics["top5"] = moco.mask_accuracy(logits, mask)
        metrics["top1_self"], metrics["top5_self"] = moco.topk_accuracy(
            logits, zeros)
    if variant == "coclr":
        metrics["queue_is_full"] = queue_is_full.astype(jnp.float32)
    if axis_name is not None:
        metrics = jax.lax.pmean(metrics, axis_name)

    # enqueue (post-loss, pretrain.py:188,276,416)
    if variant == "infonce":
        state = moco.dequeue_and_enqueue(state, k, axis_name)
    elif variant == "ubernce":
        state = moco.dequeue_and_enqueue(state, k, axis_name,
                                         labels=batch["label"])
    else:
        state = moco.dequeue_and_enqueue(state, k, axis_name,
                                         keys_second=kf, vnames=batch["vname"])

    state = state.replace(params_q=new_params_q, stats_q=stats_q,
                          stats_k=stats_k, step=state.step + 1)
    return state, new_opt_state, metrics


def make_pretrain_step(encoder, cfg: PretrainConfig, mesh=None,
                       preprocess_fn: Optional[Callable] = None,
                       donate: bool = True, fuse_preprocess: bool = False):
    """Build the jitted step. With a mesh: shard_map over the `data` axis
    (state/opt replicated, batch sharded). Without: single-device jit.

    The preprocess (on-device augmentation) compiles as its OWN program by
    default: fusing it into the train step sends the XLA TPU compiler into a
    ~10-minute search (43s + 4s separately); the split costs one extra HBM
    round-trip of the batch (~0.3ms) per step."""
    from coclr_tpu.ops.seqpar import sp_axes

    tx = make_optimizer(cfg)
    axis_name = mesh_axes(mesh)  # 'data', ('dcn','data'), or None
    sp = sp_axis_of(mesh)        # None, temporal axis name, or SPAxes
    t_ax, h_ax = sp_axes(sp)
    enc_sp = getattr(encoder, "sp_axis", None)
    assert enc_sp == sp, (
        f"encoder.sp_axis={enc_sp!r} but the mesh's sp axis is {sp!r}: "
        "construct the encoder with sp_axis=sp_axis_of(mesh)")
    assert not (fuse_preprocess and h_ax is not None and
                preprocess_fn is not None), (
        "fused preprocess is incompatible with spatial sequence parallelism"
        " (the crop/resize aug is not H-local); use the default split mode")
    grad_axes = tuple(mesh.axis_names) if mesh is not None else None
    batch_spec = P(axis_name) if mesh is not None else None
    split = preprocess_fn is not None and not fuse_preprocess
    fn = functools.partial(
        _pretrain_step, encoder=encoder, cfg=cfg, tx=tx,
        axis_name=axis_name, grad_axes=grad_axes,
        preprocess_fn=None if split else preprocess_fn,
        sp_axis=None if split else t_ax)

    donate_argnums = (0, 1) if donate else ()

    def _sp_leaf_spec(leaf):
        # clip leaves [b, 2, T, H, W, C] shard along T over `sp` and H over
        # `sph`; 1-D leaves (label/vname) replicate over the sp axes
        if leaf.ndim >= 3:
            return P(axis_name, None, t_ax, h_ax)
        return P(axis_name)

    def _pre_leaf_spec(leaf):
        # the aug program sees the FULL H of its T chunk (crop/resize/blur
        # are not H-local): clip leaves replicate over `sph` on the way in
        # and out; the step's H-sharded in_specs slice each member's chunk
        # at the pre->step jit boundary (a local slice, no collective)
        if leaf.ndim >= 3:
            return P(axis_name, None, t_ax)
        return P(axis_name)

    if mesh is not None and sp is not None:
        # the spec pytree must mirror the batch dict, which
        # make_pretrain_step never sees — built lazily per batch structure
        step = lazy_shard_jit(
            fn, mesh,
            lambda b: ((P(), P(), {k: _sp_leaf_spec(b[k]) for k in b},
                        P(), P()),
                       (P(), P(), P())),
            batch_pos=2, donate_argnums=donate_argnums)
    else:
        if mesh is not None:
            fn = shard_map_fn(
                fn, mesh,
                in_specs=(P(), P(), batch_spec, P(), P()),
                out_specs=(P(), P(), P()),
            )
        step = jax.jit(fn, donate_argnums=donate_argnums)
    if not split:
        return step, tx

    if sp is not None:
        def pre(batch, rng):
            rng = jax.random.fold_in(rng, 1)  # disjoint from step's fold(0)
            # fold over the DATA axes only: sp members of one data shard
            # must reproduce the same per-clip draws for their T chunks
            # (and sph members for their identical full-H chunk)
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
            if t_ax is None:
                return preprocess_fn(batch, rng)
            clip_key = "seq" if "seq" in batch else "seq_rgb"
            t_loc = batch[clip_key].shape[2]
            off = jax.lax.axis_index(t_ax) * t_loc
            return preprocess_fn(
                batch, rng, sp_ctx=(t_loc * jax.lax.axis_size(t_ax), off))

        # the aug chain is frame-local with per-clip parameter draws, so it
        # runs T-SHARDED like the step (per-device aug compute and f32
        # activation memory scale 1/sp; the per-frame gray draw reads the
        # global frame stream via sp_ctx — exact vs unsharded, tested);
        # under SPATIAL sp it runs on the full H (see _pre_leaf_spec)
        pre_jit = lazy_shard_jit(
            pre, mesh,
            lambda b: (({k: _pre_leaf_spec(b[k]) for k in b}, P()),
                       {k: _pre_leaf_spec(b[k]) for k in b
                        if k != "aug_base"}),
            batch_pos=0)
    else:
        def pre(batch, rng):
            rng = jax.random.fold_in(rng, 1)  # disjoint from step's fold(0)
            if axis_name is not None:
                rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
            return preprocess_fn(batch, rng)

        if mesh is not None:
            pre = shard_map_fn(pre, mesh, in_specs=(batch_spec, P()),
                               out_specs=batch_spec)
        pre_jit = jax.jit(pre)  # batch not donated: callers may reuse buffers

    def wrapped(state, opt_state, batch, rng, lr):
        return step(state, opt_state, pre_jit(batch, rng), rng, lr)

    return wrapped, tx
