"""MoCo core: queue ring buffer, EMA, shuffle-BN, losses, masks, train steps
(single-device and 8-virtual-device shard_map)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coclr_tpu.config import PretrainConfig
from coclr_tpu.models import moco
from coclr_tpu.models.encoder import ProjectionEncoder
from coclr_tpu.parallel import make_mesh, make_pretrain_step

DIM = 16
K = 64
T, H, W = 4, 16, 16


def tiny_cfg(**kw):
    base = dict(net="tiny", moco_dim=DIM, moco_k=K, compute_dtype="float32",
                seq_len=T, img_dim=H, batch_size=2)
    base.update(kw)
    return PretrainConfig(**base)


@pytest.fixture(scope="module")
def encoder():
    return ProjectionEncoder(network="tiny", dim=DIM, dtype=jnp.float32)


def init_state(encoder, variant):
    return moco.init_moco_state(
        jax.random.PRNGKey(0), encoder, variant,
        jnp.zeros((1, T, H, W, 3), jnp.float32), dim=DIM, K=K)


def make_batch(rng, b, variant):
    r = np.random.RandomState(rng)
    seq = r.rand(b, 2, T, H, W, 3).astype(np.float32)
    batch = {"label": r.randint(0, 5, size=(b,)).astype(np.int32)}
    if variant == "coclr":
        batch["seq_rgb"] = seq
        batch["seq_flow"] = r.rand(b, 2, T, H, W, 3).astype(np.float32)
        batch["vname"] = r.randint(0, 7, size=(b,)).astype(np.int32)
    else:
        batch["seq"] = seq
    return batch


# ---------------------------------------------------------------------------
# unit pieces
# ---------------------------------------------------------------------------

def test_ema():
    pq = {"w": jnp.ones((3,))}
    pk = {"w": jnp.zeros((3,))}
    out = moco.momentum_update(pq, pk, 0.9)
    np.testing.assert_allclose(out["w"], 0.1 * np.ones(3), rtol=1e-6)


def test_queue_ring_semantics():
    """Matches the reference's queue[:, ptr:ptr+B] = keys.T with wraparound
    across steps (pretrain.py:83-96)."""
    queue = jnp.zeros((8, 2))
    state = moco.MoCoState(
        params_q={}, stats_q={}, params_k={}, stats_k={},
        queue=queue, queue_ptr=jnp.zeros((), jnp.int32),
        step=jnp.zeros((), jnp.int32))
    ref = np.zeros((8, 2))
    ptr = 0
    for i in range(5):
        keys = np.full((4, 2), float(i + 1))
        state = moco.dequeue_and_enqueue(state, jnp.asarray(keys), None)
        ref[ptr:ptr + 4] = keys
        ptr = (ptr + 4) % 8
        np.testing.assert_array_equal(np.asarray(state.queue), ref)
        assert int(state.queue_ptr) == ptr


def test_shuffle_unshuffle_roundtrip():
    x = jnp.arange(24, dtype=jnp.float32).reshape(6, 4)
    xs, inv = moco.batch_shuffle(x, jax.random.PRNGKey(3), None)
    x2 = moco.batch_unshuffle(xs, inv, None)
    np.testing.assert_array_equal(np.asarray(x2), np.asarray(x))


def test_losses_against_reference_formulas():
    r = np.random.RandomState(0)
    logits = r.randn(4, 9).astype(np.float32)
    mask = (r.rand(4, 9) < 0.3).astype(np.float32)
    mask[:, 0] = 1.0

    # infonce == CE with target 0
    p = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    ce = -np.log(p[:, 0]).mean()
    np.testing.assert_allclose(float(moco.infonce_loss(jnp.asarray(logits))),
                               ce, rtol=1e-5)

    # ubernce: -(log_softmax * mask).sum(1) / mask.sum(1), mean
    ub = (-(np.log(p) * mask).sum(1) / mask.sum(1)).mean()
    np.testing.assert_allclose(
        float(moco.ubernce_loss(jnp.asarray(logits), jnp.asarray(mask))),
        ub, rtol=1e-5)

    # multi_nce: -log((softmax * mask).sum(1)), mean
    mn = (-np.log((p * mask).sum(1))).mean()
    np.testing.assert_allclose(
        float(moco.multi_nce_loss(jnp.asarray(logits), jnp.asarray(mask))),
        mn, rtol=1e-5)


def test_coclr_mask_topk():
    r = np.random.RandomState(1)
    kf = moco.l2_normalize(jnp.asarray(r.randn(3, DIM).astype(np.float32)))
    queue_second = moco.l2_normalize(
        jnp.asarray(r.randn(K, DIM).astype(np.float32)))
    queue_vname = jnp.asarray(r.randint(0, 5, size=(K,)).astype(np.int32))
    vname = jnp.asarray([0, 1, 2], jnp.int32)

    # queue not full -> source mask only
    not_full = -jnp.ones((K,), jnp.int32)
    m = moco.coclr_mask(kf, vname, queue_second, queue_vname, not_full, topk=5)
    assert m.shape == (3, 1 + K)
    np.testing.assert_array_equal(np.asarray(m[:, 0]), 1.0)
    np.testing.assert_array_equal(
        np.asarray(m[:, 1:]),
        (np.asarray(vname)[:, None] == np.asarray(queue_vname)[None, :]))

    # queue full -> source mask | top-5 by sampler similarity
    full = jnp.ones((K,), jnp.int32)
    m2 = np.asarray(moco.coclr_mask(kf, vname, queue_second, queue_vname, full,
                                    topk=5))
    sim = np.asarray(kf) @ np.asarray(queue_second).T
    src = np.asarray(vname)[:, None] == np.asarray(queue_vname)[None, :]
    sim[src] = -np.inf
    for i in range(3):
        top = np.argsort(-sim[i])[:5]
        expect = src[i].copy()
        expect[top] = True
        np.testing.assert_array_equal(m2[i, 1:], expect.astype(np.float32))


def test_accuracy_metrics():
    logits = jnp.asarray([[3.0, 1.0, 2.0], [2.0, 5.0, 1.0]])
    target = jnp.asarray([0, 0])
    t1, t2 = moco.topk_accuracy(logits, target, ks=(1, 2))
    assert float(t1) == 0.5 and float(t2) == 1.0
    mask = jnp.asarray([[1.0, 0, 1.0], [1.0, 0, 0]])
    m1, m2 = moco.mask_accuracy(logits, mask, ks=(1, 2))
    assert float(m1) == 0.5 and float(m2) == 1.0


# ---------------------------------------------------------------------------
# full steps
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("variant", ["infonce", "ubernce", "coclr"])
def test_single_device_step(encoder, variant):
    cfg = tiny_cfg(model=variant)
    state = init_state(encoder, variant)
    step, tx = make_pretrain_step(encoder, cfg, mesh=None, donate=False)
    opt_state = tx.init(state.params_q)
    batch = {k: jnp.asarray(v) for k, v in make_batch(0, 4, variant).items()}

    state2, opt_state2, metrics = step(state, opt_state, batch,
                                       jax.random.PRNGKey(1), jnp.float32(1e-3))
    assert int(state2.step) == 1
    assert int(state2.queue_ptr) == 4
    assert np.isfinite(float(metrics["loss"]))
    # queue rows [0,4) were overwritten with normalized keys
    norms = np.linalg.norm(np.asarray(state2.queue[:4]), axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)

    if variant == "coclr":
        # queue not full yet -> params must NOT have been updated
        for a, b in zip(jax.tree_util.tree_leaves(state.params_q),
                        jax.tree_util.tree_leaves(state2.params_q)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    else:
        diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
                 for a, b in zip(jax.tree_util.tree_leaves(state.params_q),
                                 jax.tree_util.tree_leaves(state2.params_q))]
        assert max(diffs) > 0


def test_coclr_queue_fill_then_train(encoder):
    cfg = tiny_cfg(model="coclr", topk=2)
    state = init_state(encoder, "coclr")
    step, tx = make_pretrain_step(encoder, cfg, mesh=None, donate=False)
    opt_state = tx.init(state.params_q)
    p0 = jax.tree_util.tree_leaves(state.params_q)

    n_fill = K // 4
    for i in range(n_fill + 1):
        batch = {k: jnp.asarray(v) for k, v in make_batch(i, 4, "coclr").items()}
        state, opt_state, metrics = step(state, opt_state, batch,
                                         jax.random.PRNGKey(i), jnp.float32(1e-3))
        if i < n_fill - 1:
            assert float(metrics["queue_is_full"]) == 0.0
        if i == n_fill:  # first gated update has happened
            assert float(metrics["queue_is_full"]) == 1.0

    p1 = jax.tree_util.tree_leaves(state.params_q)
    assert max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
               for a, b in zip(p0, p1)) > 0


@pytest.mark.parametrize("variant", ["infonce", "coclr"])
@pytest.mark.parametrize("bn_shuffle", ["gather", "alltoall"])
def test_multi_device_step(encoder, variant, bn_shuffle):
    n = jax.device_count()
    assert n == 8
    cfg = tiny_cfg(model=variant, bn_shuffle=bn_shuffle)
    mesh = make_mesh()
    state = init_state(encoder, variant)
    step, tx = make_pretrain_step(encoder, cfg, mesh=mesh, donate=False)
    opt_state = tx.init(state.params_q)

    # alltoall block exchange needs per-device batch divisible by n
    b = 8 * n if bn_shuffle == "alltoall" else 2 * n
    batch = {k: jnp.asarray(v) for k, v in make_batch(0, b, variant).items()}
    state2, opt_state2, metrics = step(state, opt_state, batch,
                                       jax.random.PRNGKey(1), jnp.float32(1e-3))
    assert int(state2.queue_ptr) == b % K
    assert np.isfinite(float(metrics["loss"]))
    norms = np.linalg.norm(np.asarray(state2.queue[:b]), axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_multi_device_enqueue_order_matches_single(encoder):
    """The all_gather enqueue must be ordered by device index (rank order),
    i.e. equal to running the same global batch through a simulation."""
    n = jax.device_count()
    cfg = tiny_cfg(model="infonce", bn_shuffle="none")
    mesh = make_mesh()
    state = init_state(encoder, "infonce")
    step, tx = make_pretrain_step(encoder, cfg, mesh=mesh, donate=False)
    opt_state = tx.init(state.params_q)
    b = n  # one sample per device
    batch = {k: jnp.asarray(v) for k, v in make_batch(0, b, "infonce").items()}
    state2, _, _ = step(state, opt_state, batch, jax.random.PRNGKey(1),
                        jnp.float32(0.0))

    # keys computed directly: encoder_k after EMA (m * k + (1-m) * q), on x2,
    # one sample per device -> per-device BN stats == per-sample batch of 1
    params_k = moco.momentum_update(state.params_q, state.params_k, cfg.moco_m)
    rows = []
    for i in range(b):
        ki, _ = encoder.apply(
            {"params": params_k, "batch_stats": state.stats_k},
            batch["seq"][i:i + 1, 1], train=True, mutable=["batch_stats"])
        rows.append(moco.l2_normalize(ki.astype(jnp.float32))[0])
    k_direct = jnp.stack(rows)
    np.testing.assert_allclose(np.asarray(state2.queue[:b]),
                               np.asarray(k_direct), atol=1e-5)
