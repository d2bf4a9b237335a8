"""Orbax checkpoint backend (SURVEY §5.4 build note): same payload/rotation
semantics as the flax-msgpack single-file format, plus the two properties the
single-file format cannot give — shard-wise saves of sharded jax.Arrays and
resharding restore (resume on a different mesh/device count).

Reference contract being preserved: torch.save dict payload + rotation
(/root/reference/utils/utils.py:12-26), resume/pretrain load modes
(/root/reference/main_nce.py:215-246).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from coclr_tpu.models import moco
from coclr_tpu.models.encoder import ProjectionEncoder
from coclr_tpu.parallel import make_mesh
from coclr_tpu.utils.checkpoint import (checkpoint_exists, is_orbax_checkpoint,
                                        load_checkpoint, save_checkpoint)

DIM, K, T, H, W = 16, 64, 4, 16, 16


@pytest.fixture(scope="module")
def state_and_opt():
    enc = ProjectionEncoder(network="tiny", dim=DIM, dtype=jnp.float32)
    state = moco.init_moco_state(
        jax.random.PRNGKey(0), enc, "infonce",
        jnp.zeros((1, T, H, W, 3), jnp.float32), dim=DIM, K=K)
    tx = optax.adam(1e-3)
    opt = tx.init(state.params_q)
    return state, opt


def _payload(state, opt, epoch=3):
    return {"epoch": epoch, "state": jax.device_get(state),
            "opt_state": jax.device_get(opt), "best_acc": 0.25,
            "iteration": 100}


def _assert_tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_orbax_roundtrip_with_templates(tmp_path, state_and_opt):
    state, opt = state_and_opt
    ck = str(tmp_path / "epoch3.ckpt")
    save_checkpoint(_payload(state, opt), filename=ck, fmt="orbax",
                    keep_all=True)
    assert is_orbax_checkpoint(ck) and checkpoint_exists(ck)
    out = load_checkpoint(ck, state_template=state, opt_template=opt)
    assert type(out["state"]) is type(state)          # MoCoState, not dict
    assert out["epoch"] == 3 and out["iteration"] == 100
    assert out["best_acc"] == pytest.approx(0.25)
    _assert_tree_equal(out["state"], state)
    _assert_tree_equal(out["opt_state"], opt)


def test_orbax_raw_restore_for_surgery(tmp_path, state_and_opt):
    """CoCLR init surgery and eval --pretrain load without templates and
    index dict-style (driver.py load_pretrained, init_surgery.load_encoder_q)."""
    state, opt = state_and_opt
    ck = str(tmp_path / "epoch3.ckpt")
    save_checkpoint(_payload(state, opt), filename=ck, fmt="orbax",
                    keep_all=True)
    raw = load_checkpoint(ck)
    _assert_tree_equal(raw["state"]["params_q"], state.params_q)
    _assert_tree_equal(raw["state"]["stats_q"], state.stats_q)
    assert raw["epoch"] == 3


def test_orbax_matches_flax_format(tmp_path, state_and_opt):
    state, opt = state_and_opt
    f_flax = str(tmp_path / "a" / "epoch3.ckpt")
    f_orbx = str(tmp_path / "b" / "epoch3.ckpt")
    save_checkpoint(_payload(state, opt), filename=f_flax, keep_all=True)
    save_checkpoint(_payload(state, opt), filename=f_orbx, fmt="orbax",
                    keep_all=True)
    a = load_checkpoint(f_flax, state_template=state, opt_template=opt)
    b = load_checkpoint(f_orbx, state_template=state, opt_template=opt)
    _assert_tree_equal(a["state"], b["state"])
    _assert_tree_equal(a["opt_state"], b["opt_state"])
    assert a["epoch"] == b["epoch"] and a["iteration"] == b["iteration"]


def test_orbax_rotation_and_best(tmp_path, state_and_opt):
    """utils/utils.py:12-26 semantics with directory checkpoints: saving
    epoch N deletes epoch N-gap; best copies are directories too."""
    state, opt = state_and_opt
    d = tmp_path / "rot"
    for ep in (1, 3, 5):
        save_checkpoint(_payload(state, opt, epoch=ep),
                        filename=str(d / f"epoch{ep}.ckpt"), fmt="orbax",
                        gap=2, is_best=(ep == 5))
    assert not os.path.exists(d / "epoch1.ckpt")
    assert not os.path.exists(d / "epoch3.ckpt")
    assert is_orbax_checkpoint(str(d / "epoch5.ckpt"))
    best = d / "model_best_epoch5.ckpt"
    assert is_orbax_checkpoint(str(best))
    out = load_checkpoint(str(best), state_template=state, opt_template=opt)
    assert out["epoch"] == 5


def test_orbax_overwrite_same_epoch(tmp_path, state_and_opt):
    """Preemption can re-save the same filename; orbax refuses to overwrite
    a live directory, so save_checkpoint clears it first."""
    state, opt = state_and_opt
    ck = str(tmp_path / "preempt.ckpt")
    save_checkpoint(_payload(state, opt, epoch=1), filename=ck, fmt="orbax",
                    keep_all=True)
    save_checkpoint(_payload(state, opt, epoch=2), filename=ck, fmt="orbax",
                    keep_all=True)
    assert load_checkpoint(ck)["epoch"] == 2


def test_orbax_cross_mesh_resume(tmp_path, state_and_opt):
    """The capability the single-file format lacks: save with state sharded
    over an 8-device mesh, restore onto a 4-device mesh — orbax reshards on
    read to whatever sharding the load-time template carries."""
    state, opt = state_and_opt
    mesh8 = make_mesh(8)
    mesh4 = make_mesh(4)
    shard8 = NamedSharding(mesh8, P("data"))
    shard4 = NamedSharding(mesh4, P("data"))

    def put(tree, shard):
        def leaf(x):
            x = jnp.asarray(x)
            if x.ndim >= 1 and x.shape[0] % 8 == 0:
                return jax.device_put(x, shard)
            return jax.device_put(x, NamedSharding(shard.mesh, P()))
        return jax.tree_util.tree_map(leaf, tree)

    sharded_state = put(state, shard8)
    ck = str(tmp_path / "epoch0.ckpt")
    # NOTE: no device_get — the sharded arrays are saved as-is, shard-wise
    save_checkpoint({"epoch": 0, "state": sharded_state,
                     "opt_state": jax.device_get(opt), "best_acc": 0.0,
                     "iteration": 1},
                    filename=ck, fmt="orbax", keep_all=True)

    template4 = put(state, shard4)
    out = load_checkpoint(ck, state_template=template4)
    queue = out["state"].queue
    assert queue.sharding.is_equivalent_to(shard4, queue.ndim)
    assert set(queue.sharding.device_set) == set(jax.devices()[:4])
    _assert_tree_equal(out["state"], state)
