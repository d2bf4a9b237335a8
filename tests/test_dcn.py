"""Multi-slice (DCN) data parallelism: a (dcn=2, data=4) mesh must be
semantically identical to the flat 8-device `data` mesh — collectives span
both axes in linear-index order, so losses, queue contents and parameters
agree bitwise-ish (same reduction topology on CPU).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from coclr_tpu.config import PretrainConfig
from coclr_tpu.models import moco
from coclr_tpu.models.encoder import ProjectionEncoder
from coclr_tpu.ops.augment import make_pretrain_preprocess
from coclr_tpu.parallel import make_mesh, make_pretrain_step
from coclr_tpu.parallel.mesh import mesh_axes


def _run(dcn_size, steps=2):
    T, S = 4, 32
    cfg = PretrainConfig(net="tiny", model="infonce", seq_len=T, img_dim=S,
                         batch_size=1, moco_k=16, moco_dim=16,
                         compute_dtype="float32", bn_shuffle="gather",
                         dcn_size=dcn_size)
    mesh = make_mesh(8, dcn_size=dcn_size)
    enc = ProjectionEncoder(network=cfg.net, dim=cfg.moco_dim)
    sample = jnp.zeros((1, T, S, S, 3), jnp.float32)
    state = moco.init_moco_state(jax.random.PRNGKey(0), enc, cfg.model,
                                 sample, dim=cfg.moco_dim, K=cfg.moco_k)
    step_fn, tx = make_pretrain_step(enc, cfg, mesh,
                                     make_pretrain_preprocess(cfg))
    opt_state = jax.jit(tx.init)(state.params_q)
    rng = np.random.RandomState(0)
    batch = {
        "seq": jnp.asarray(rng.randint(0, 255, (8, 2, T, S, S, 3), np.uint8)),
        "aug_base": jnp.asarray(rng.randint(0, 2, (8, 2), np.uint8)),
        "label": jnp.asarray(rng.randint(0, 10, (8,), np.int32)),
    }
    losses = []
    for i in range(steps):
        state, opt_state, m = step_fn(state, opt_state, batch,
                                      jax.random.PRNGKey(7 + i),
                                      jnp.float32(1e-3))
        losses.append(float(np.asarray(m["loss"])))
    return losses, state


def test_mesh_axes_shapes():
    m1 = make_mesh(8)
    m2 = make_mesh(8, dcn_size=2)
    assert mesh_axes(m1) == "data"
    assert mesh_axes(m2) == ("dcn", "data")
    assert m2.devices.shape == (2, 4)
    with pytest.raises(AssertionError):
        make_mesh(8, dcn_size=3)


def test_dcn_matches_flat_dp():
    losses_flat, state_flat = _run(dcn_size=1)
    losses_dcn, state_dcn = _run(dcn_size=2)
    np.testing.assert_allclose(losses_flat, losses_dcn, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(state_flat.queue),
                               np.asarray(state_dcn.queue), rtol=1e-5,
                               atol=1e-6)
    q_flat = jax.tree_util.tree_leaves(state_flat.params_q)
    q_dcn = jax.tree_util.tree_leaves(state_dcn.params_q)
    for a, b in zip(q_flat, q_dcn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)
    assert int(np.asarray(state_dcn.queue_ptr)) == 16 % 16


def test_dcn_alltoall_shuffle_runs():
    # the all_to_all shuffle path must also compile/run over a 2-D mesh
    T, S = 4, 32
    cfg = PretrainConfig(net="tiny", model="infonce", seq_len=T, img_dim=S,
                         batch_size=2, moco_k=16, moco_dim=16,
                         compute_dtype="float32", bn_shuffle="alltoall",
                         dcn_size=2)
    mesh = make_mesh(8, dcn_size=2)
    enc = ProjectionEncoder(network=cfg.net, dim=cfg.moco_dim)
    sample = jnp.zeros((1, T, S, S, 3), jnp.float32)
    state = moco.init_moco_state(jax.random.PRNGKey(0), enc, cfg.model,
                                 sample, dim=cfg.moco_dim, K=cfg.moco_k)
    step_fn, tx = make_pretrain_step(enc, cfg, mesh,
                                     make_pretrain_preprocess(cfg))
    opt_state = jax.jit(tx.init)(state.params_q)
    rng = np.random.RandomState(1)
    batch = {
        "seq": jnp.asarray(rng.randint(0, 255, (16, 2, T, S, S, 3), np.uint8)),
        "aug_base": jnp.asarray(rng.randint(0, 2, (16, 2), np.uint8)),
        "label": jnp.asarray(rng.randint(0, 10, (16,), np.int32)),
    }
    state, opt_state, m = step_fn(state, opt_state, batch,
                                  jax.random.PRNGKey(3), jnp.float32(1e-3))
    assert np.isfinite(float(np.asarray(m["loss"])))
