"""Round-4 composition matrix (VERDICT-r3 weak #3/#4 + ask #3): the
TPU-specific mechanisms proven in isolation elsewhere, exercised TOGETHER
as one program — full S3D x multi-device collectives x alltoall shuffle-BN
x on-device augmentation, and the multihost -> Orbax cross-mesh resume
flow (tests/test_multihost.py holds that one).

These are integration contracts, not numerics-parity tests: the numerics
of each mechanism are pinned by test_seqpar / test_ddp_equivalence /
test_alltoall / test_model_parity; what was never exercised before round 4
is the composed program itself (the round-3 dryrun used a tiny net because
8 virtual devices + full S3D starve XLA:CPU collective rendezvous on a
1-core box — 2 devices with the real net is the shape this box tolerates,
CLAUDE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np

from coclr_tpu.config import PretrainConfig
from coclr_tpu.models import moco as moco_mod
from coclr_tpu.models.encoder import ProjectionEncoder
from coclr_tpu.ops.augment import make_pretrain_preprocess
from coclr_tpu.parallel import make_mesh, make_pretrain_step
from coclr_tpu.train.pretrain import make_upload


def test_full_s3d_2device_production_step():
    """The full production InfoNCE step — real S3D backbone, on-device aug
    chain, alltoall shuffle-BN, gradient pmean, queue enqueue — over a
    2-device data mesh, as ONE compiled program (the unit the round-3
    dryrun could not cover with the real net). Asserts the state machine
    advanced coherently across two steps: finite decreasing-capable loss,
    queue_ptr ring arithmetic, enqueued keys normalized, params/EMA/BN
    all updated."""
    DIM, K, T, HW, B = 16, 32, 8, 32, 4  # B global, 2 per device
    cfg = PretrainConfig(net="s3d", moco_dim=DIM, moco_k=K,
                         compute_dtype="float32", seq_len=T, img_dim=HW,
                         batch_size=B // 2, model="infonce",
                         bn_shuffle="alltoall", aug_backend="xla")
    mesh = make_mesh(2)
    enc = ProjectionEncoder(network="s3d", dim=DIM, dtype=jnp.float32)
    state = moco_mod.init_moco_state(
        jax.random.PRNGKey(0), enc, "infonce",
        jnp.zeros((1, T, HW, HW, 3), jnp.float32), dim=DIM, K=K)
    p0 = jax.tree_util.tree_map(np.asarray, state.params_q)

    pre_fn = make_pretrain_preprocess(cfg)
    step, tx = make_pretrain_step(enc, cfg, mesh, pre_fn, donate=False)
    opt = jax.jit(tx.init)(state.params_q)
    put_batch, put_repl = make_upload(mesh)
    state, opt = put_repl((state, opt))

    losses = []
    r = np.random.RandomState(11)
    for i in range(2):
        raw = {"seq": r.randint(0, 255, (B, 2, T, HW, HW, 3))
                       .astype(np.uint8),
               "aug_base": np.ones((B, 2), np.float32)}
        state, opt, m = step(state, opt, put_batch(raw),
                             jax.random.PRNGKey(31 + i), jnp.float32(1e-3))
        losses.append(float(m["loss"]))

    assert all(np.isfinite(losses)), losses
    # ring pointer advanced by global batch per step (pretrain.py:83-96)
    assert int(np.asarray(state.queue_ptr)) == (2 * B) % K
    # the enqueued rows are l2-normalized keys, untouched rows still init
    q = np.asarray(state.queue)
    norms = np.linalg.norm(q[: 2 * B], axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
    # params actually moved and EMA tracked them
    moved = [float(np.abs(np.asarray(a) - b).max())
             for a, b in zip(jax.tree_util.tree_leaves(state.params_q),
                             jax.tree_util.tree_leaves(p0))]
    assert max(moved) > 0.0
    ema_gap = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
               for a, b in zip(jax.tree_util.tree_leaves(state.params_q),
                               jax.tree_util.tree_leaves(state.params_k))]
    assert max(ema_gap) > 0.0  # EMA lags the query encoder
    # BN running stats updated on BOTH encoders (key side via shuffle-BN)
    for stats in (state.stats_q, state.stats_k):
        var_leaves = [np.asarray(v)
                      for k, v in jax.tree_util.tree_flatten_with_path(stats)[0]
                      if "var" in jax.tree_util.keystr(k)]
        assert any(float(np.abs(v - 1.0).max()) > 0 for v in var_leaves)
