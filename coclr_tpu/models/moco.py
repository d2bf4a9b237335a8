"""Functional MoCo core: InfoNCE / UberNCE / CoCLR as pure state transitions.

The reference implements these as torch modules with in-place buffer mutation
(/root/reference/model/pretrain.py). Here everything is an explicit pytree
(`MoCoState`) transformed by pure functions that run per-device inside
`shard_map` (axis_name='data') or single-device (axis_name=None):

  - momentum key-encoder EMA            (pretrain.py:77-80)
  - cross-device batch-shuffle-BN       (pretrain.py:99-143)
  - l_pos/l_neg logits with temperature (pretrain.py:175-182)
  - all_gather -> ring-buffer enqueue   (pretrain.py:83-96), as
    `lax.dynamic_update_slice` keeping the exact rank-ordered write and the
    `K % global_batch == 0` contract (pretrain.py:90)
  - UberNCE label-mask targets          (pretrain.py:230-278)
  - CoCLR sampler top-k positive mining (pretrain.py:344-418)
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct


NEG_INF = -1e30


@struct.dataclass
class MoCoState:
    """All mutable training state of a MoCo-family model (optimizer aside)."""

    params_q: Any
    stats_q: Any
    params_k: Any
    stats_k: Any
    queue: jnp.ndarray           # [K, dim] float32, L2-normalized rows
    queue_ptr: jnp.ndarray       # int32 scalar
    step: jnp.ndarray            # int32 scalar
    queue_label: Optional[jnp.ndarray] = None   # [K] int32 (ubernce; coclr monitor)
    queue_vname: Optional[jnp.ndarray] = None   # [K] int32 (coclr)
    queue_second: Optional[jnp.ndarray] = None  # [K, dim] (coclr)
    params_s: Optional[Any] = None              # frozen sampler (coclr)
    stats_s: Optional[Any] = None


def l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def init_moco_state(rng, encoder, variant: str, sample_clip,
                    dim: int = 128, K: int = 2048,
                    use_jit: bool = True) -> MoCoState:
    """Initialize encoders + queues. encoder_k starts as a copy of encoder_q
    (pretrain.py:64-66); queue ~ randn, normalized (pretrain.py:69-70).

    use_jit compiles the whole init as ONE program — mandatory on backends
    where eager dispatch is a per-op round trip (axon: ~1s/op, S3D init has
    hundreds of ops)."""
    if use_jit:
        import functools

        fn = functools.partial(_init_moco_state_impl, encoder=encoder,
                               variant=variant, dim=dim, K=K)
        return jax.jit(fn)(rng, jnp.asarray(sample_clip))
    return _init_moco_state_impl(rng, jnp.asarray(sample_clip),
                                 encoder=encoder, variant=variant,
                                 dim=dim, K=K)


def _init_moco_state_impl(rng, sample_clip, *, encoder, variant: str,
                          dim: int, K: int) -> MoCoState:
    k_init, k_queue, k_queue2 = jax.random.split(rng, 3)
    variables = encoder.init(k_init, sample_clip, train=False)
    params_q = variables["params"]
    stats_q = variables.get("batch_stats", {})
    params_k = jax.tree_util.tree_map(jnp.copy, params_q)
    stats_k = jax.tree_util.tree_map(jnp.copy, stats_q)

    queue = l2_normalize(jax.random.normal(k_queue, (K, dim), jnp.float32))
    state = dict(
        params_q=params_q, stats_q=stats_q, params_k=params_k, stats_k=stats_k,
        queue=queue, queue_ptr=jnp.zeros((), jnp.int32),
        step=jnp.zeros((), jnp.int32),
    )
    if variant in ("ubernce", "coclr"):
        state["queue_label"] = -jnp.ones((K,), jnp.int32)  # pretrain.py:208,316
    if variant == "coclr":
        state["queue_vname"] = -jnp.ones((K,), jnp.int32)  # pretrain.py:314
        state["queue_second"] = l2_normalize(
            jax.random.normal(k_queue2, (K, dim), jnp.float32))  # pretrain.py:310-311
        # sampler starts as another init of the same architecture; in practice
        # it is always loaded from a checkpoint (main_coclr.py:253-268)
        s_vars = encoder.init(jax.random.fold_in(k_init, 1), sample_clip, train=False)
        state["params_s"] = s_vars["params"]
        state["stats_s"] = s_vars.get("batch_stats", {})
    return MoCoState(**state)


def momentum_update(params_q, params_k, m: float):
    """params_k <- m * params_k + (1-m) * params_q (pretrain.py:77-80)."""
    return jax.tree_util.tree_map(
        lambda pk, pq: pk * m + pq.astype(pk.dtype) * (1.0 - m), params_k, params_q)


# ---------------------------------------------------------------------------
# cross-device batch shuffle (BN information-leak control)
# ---------------------------------------------------------------------------

def _gather(x, axis_name):
    return x if axis_name is None else jax.lax.all_gather(x, axis_name, tiled=True)


def batch_shuffle(x, rng, axis_name):
    """Shuffle the key batch across devices with a shared-PRNG permutation.

    Faithful to _batch_shuffle_ddp (pretrain.py:99-124): all_gather, a
    permutation known to every device (shared key replaces the rank-0
    broadcast), each device takes its slice. Returns (x_shuffled, inv_perm).
    """
    b = x.shape[0]
    if axis_name is None:
        perm = jax.random.permutation(rng, b)
        return x[perm], jnp.argsort(perm)
    n = jax.lax.axis_size(axis_name)
    big = _gather(x, axis_name)             # [n*b, ...]
    perm = jax.random.permutation(rng, n * b)
    inv = jnp.argsort(perm)
    me = jax.lax.axis_index(axis_name)
    mine = jax.lax.dynamic_slice_in_dim(perm, me * b, b)
    return jnp.take(big, mine, axis=0), inv


def batch_unshuffle(k, inv, axis_name):
    """Inverse of batch_shuffle on encoded keys (pretrain.py:127-143)."""
    b = k.shape[0]
    if axis_name is None:
        return k[inv]
    big = _gather(k, axis_name)
    me = jax.lax.axis_index(axis_name)
    mine = jax.lax.dynamic_slice_in_dim(inv, me * b, b)
    return jnp.take(big, mine, axis=0)


def batch_shuffle_alltoall(x, rng, axis_name):
    """TPU-efficient equivalent: local perm -> all_to_all -> local perm.

    Moves each sample over ICI once (vs n times for all_gather). Not the
    same permutation group as a uniform global permutation, but each
    device's BN batch gets an even random mix from every device, which is
    what the shuffle exists for. Requires b % n == 0.
    """
    b = x.shape[0]
    n = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    r_local, r_cross = jax.random.split(rng)
    # per-device local permutation (fold in device id)
    perm = jax.random.permutation(jax.random.fold_in(r_local, me), b)
    x = jnp.take(x, perm, axis=0)
    # exchange equal shards with every device
    x = x.reshape((n, b // n) + x.shape[1:])
    x = jax.lax.all_to_all(x, axis_name, split_axis=0, concat_axis=0, tiled=False)
    x = x.reshape((b,) + x.shape[2:])
    # second local permutation mixes the received shards
    perm2 = jax.random.permutation(jax.random.fold_in(r_cross, me), b)
    return jnp.take(x, perm2, axis=0), (perm, perm2)


def batch_unshuffle_alltoall(k, perms, axis_name):
    perm, perm2 = perms
    b = k.shape[0]
    n = jax.lax.axis_size(axis_name)
    k = jnp.take(k, jnp.argsort(perm2), axis=0)
    k = k.reshape((n, b // n) + k.shape[1:])
    k = jax.lax.all_to_all(k, axis_name, split_axis=0, concat_axis=0, tiled=False)
    k = k.reshape((b,) + k.shape[2:])
    return jnp.take(k, jnp.argsort(perm), axis=0)


def encode_keys(encoder, state: MoCoState, x2, rng, axis_name,
                bn_shuffle: str = "gather"):
    """EMA-updated key encoding with cross-device shuffle-BN.

    Returns (k [b,dim] normalized, new params_k, new stats_k).
    Mirrors pretrain.py:159-172: EMA first, shuffle, encode (per-device BN
    stats update), unshuffle.
    """
    if axis_name is None:
        # One device == one BN batch: a within-batch permutation (what
        # gather/alltoall degenerate to) changes neither the BN statistics
        # (permutation-invariant) nor the unshuffled keys — skip the
        # round-trip copies outright. The reference never runs this case
        # (single-GPU pretrain is forbidden, main_nce.py:182-186).
        bn_shuffle = "none"
    elif bn_shuffle == "alltoall" and x2.shape[0] % jax.lax.axis_size(axis_name):
        bn_shuffle = "gather"  # block exchange needs b % n == 0

    if bn_shuffle == "alltoall":
        x2s, ctx = batch_shuffle_alltoall(x2, rng, axis_name)
    elif bn_shuffle == "gather":
        x2s, ctx = batch_shuffle(x2, rng, axis_name)
    else:  # 'none'
        x2s, ctx = x2, None

    k, mut = encoder.apply(
        {"params": state.params_k, "batch_stats": state.stats_k},
        x2s, train=True, mutable=["batch_stats"])
    k = l2_normalize(k.astype(jnp.float32))

    if ctx is None:
        pass
    elif bn_shuffle == "alltoall" and axis_name is not None:
        k = batch_unshuffle_alltoall(k, ctx, axis_name)
    else:
        k = batch_unshuffle(k, ctx, axis_name)
    return k, mut["batch_stats"]


# ---------------------------------------------------------------------------
# logits / losses
# ---------------------------------------------------------------------------

def moco_logits(q, k, queue, temperature: float):
    """[l_pos, l_neg] / T (pretrain.py:175-182). q,k: [b,d]; queue: [K,d]."""
    l_pos = jnp.sum(q * k, axis=1, keepdims=True)
    l_neg = q @ queue.T
    return jnp.concatenate([l_pos, l_neg], axis=1) / temperature


def infonce_loss(logits):
    """CE with target 0 (main_nce.py:312-315)."""
    logz = jax.nn.logsumexp(logits, axis=1)
    return jnp.mean(logz - logits[:, 0])


def ubernce_loss(logits, mask):
    """Mean over positives of log-softmax, mean over batch
    (main_nce.py:317-322)."""
    logp = jax.nn.log_softmax(logits, axis=1)
    per = -jnp.sum(logp * mask, axis=1) / jnp.sum(mask, axis=1)
    return jnp.mean(per)


def multi_nce_loss(logits, mask):
    """-log(sum of softmax over positives) (main_coclr.py:343-346)."""
    logp = jax.nn.log_softmax(logits, axis=1)
    pos = jnp.where(mask > 0, logp, NEG_INF)
    return jnp.mean(-jax.nn.logsumexp(pos, axis=1))


def ubernce_mask(k_label, queue_label):
    """[1, (k_label == queue_label)] binary mask (pretrain.py:271-273)."""
    m = (k_label[:, None] == queue_label[None, :]).astype(jnp.float32)
    ones = jnp.ones((m.shape[0], 1), jnp.float32)
    return jnp.concatenate([ones, m], axis=1)


def coclr_mask(kf, k_vsource, queue_second, queue_vname, queue_label,
               topk: int):
    """Sibling-source mask + sampler top-k mining (pretrain.py:395-413).

    Returns mask [b, 1+K] float. Top-k mining applies only once the queue is
    full (queue_label all != -1, pretrain.py:400-404).
    """
    mask_source = k_vsource[:, None] == queue_vname[None, :]  # [b, K] bool
    mask = mask_source

    if topk != 0:
        sim = kf @ queue_second.T  # [b, K]
        sim = jnp.where(mask_source, NEG_INF, sim)
        _, idx = jax.lax.top_k(sim, topk)
        topk_onehot = jnp.sum(jax.nn.one_hot(idx, sim.shape[1], dtype=jnp.bool_),
                              axis=1)
        queue_is_full = jnp.all(queue_label != -1)
        mask = jnp.where(queue_is_full, mask | topk_onehot, mask)

    ones = jnp.ones((mask.shape[0], 1), jnp.bool_)
    return jnp.concatenate([ones, mask], axis=1).astype(jnp.float32)


# ---------------------------------------------------------------------------
# queue updates
# ---------------------------------------------------------------------------

def dequeue_and_enqueue(state: MoCoState, keys, axis_name,
                        labels=None, keys_second=None, vnames=None) -> MoCoState:
    """All-gather keys (rank-ordered) and write the ring buffer slice
    (pretrain.py:83-96, 212-227, 322-341). Requires K % global_batch == 0."""
    keys = _gather(keys, axis_name)
    ptr = state.queue_ptr
    bs = keys.shape[0]
    upd = dict(
        queue=jax.lax.dynamic_update_slice(state.queue, keys, (ptr, 0)),
        queue_ptr=((ptr + bs) % state.queue.shape[0]).astype(jnp.int32),
    )
    if labels is not None:
        labels = _gather(labels, axis_name)
        upd["queue_label"] = jax.lax.dynamic_update_slice(
            state.queue_label, labels.astype(jnp.int32), (ptr,))
    if keys_second is not None:
        keys_second = _gather(keys_second, axis_name)
        upd["queue_second"] = jax.lax.dynamic_update_slice(
            state.queue_second, keys_second, (ptr, 0))
    if vnames is not None:
        vnames = _gather(vnames, axis_name)
        upd["queue_vname"] = jax.lax.dynamic_update_slice(
            state.queue_vname, vnames.astype(jnp.int32), (ptr,))
        # CoCLR writes queue_label = 1 alongside vnames as the is-filled flag
        # (pretrain.py:338)
        upd["queue_label"] = jax.lax.dynamic_update_slice(
            state.queue_label, jnp.ones_like(vnames, jnp.int32), (ptr,))
    return state.replace(**upd)


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------

def topk_accuracy(logits, target, ks=(1, 5)):
    """calc_topk_accuracy (utils/utils.py:52-69)."""
    maxk = max(ks)
    _, pred = jax.lax.top_k(logits, maxk)  # [b, maxk]
    correct = pred == target[:, None]
    return tuple(jnp.mean(jnp.any(correct[:, :k], axis=1).astype(jnp.float32))
                 for k in ks)


def mask_accuracy(logits, mask, ks=(1, 5)):
    """calc_mask_accuracy (utils/utils.py:71-85): hit if any top-k prediction
    is a positive."""
    maxk = max(ks)
    _, pred = jax.lax.top_k(logits, maxk)  # [b, maxk]
    hit = jnp.take_along_axis(mask, pred, axis=1) > 0
    return tuple(jnp.mean(jnp.any(hit[:, :k], axis=1).astype(jnp.float32))
                 for k in ks)
