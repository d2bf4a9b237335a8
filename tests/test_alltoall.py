"""alltoall shuffle-BN: equivalence-grade properties (VERDICT-r2 weak #6)
plus the K400-scale configuration step (VERDICT-r2 ask #5).

The batch shuffle exists so no device computes BN statistics over its own
loader samples (information leak, /root/reference/model/pretrain.py:99-124).
`gather` mode is proven equal to the reference's global permutation
(tests/test_ddp_equivalence.py); `alltoall` is the ICI-efficient variant
whose soundness argument (models/moco.py:146-153) is:

  1. the inverse restores sample order exactly (keys come back in loader
     order, so logits/queue are unaffected by the shuffle), and
  2. every device's post-shuffle BN batch contains an EQUAL number of
     samples from every source device (the even-mix property — stronger
     mixing than a uniform random permutation guarantees).

These tests pin both, on flat and (dcn, data) meshes, and run the full
CoCLR step at the K400 config shapes (moco-k 16384, alltoall, 2-D mesh).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from coclr_tpu.config import PretrainConfig
from coclr_tpu.models import moco
from coclr_tpu.models.encoder import ProjectionEncoder
from coclr_tpu.parallel import make_mesh, make_pretrain_step
from coclr_tpu.parallel.mesh import mesh_axes, shard_map_fn


@pytest.mark.parametrize("dcn_size", [1, 2])
def test_alltoall_roundtrip_and_even_mix(dcn_size):
    n = jax.device_count()
    assert n == 8
    b = 16  # per-device batch; b % n == 0 -> each device gets b/n per source
    mesh = make_mesh(n, dcn_size=dcn_size)
    axis = mesh_axes(mesh)
    spec = P(axis)

    def fn(x, rng):
        shuffled, ctx = moco.batch_shuffle_alltoall(x, rng, axis)
        restored = moco.batch_unshuffle_alltoall(shuffled, ctx, axis)
        return shuffled, restored

    f = jax.jit(shard_map_fn(fn, mesh, in_specs=(spec, P()),
                             out_specs=(spec, spec)))

    x = jnp.arange(n * b, dtype=jnp.float32)[:, None]  # value == global idx
    for seed in range(3):
        shuffled, restored = f(x, jax.random.PRNGKey(seed))
        shuffled = np.asarray(shuffled)[:, 0]
        # (1) exact inverse: unshuffle restores loader order bitwise
        np.testing.assert_array_equal(np.asarray(restored), np.asarray(x))
        # global permutation: nothing lost or duplicated
        np.testing.assert_array_equal(np.sort(shuffled), np.arange(n * b))
        # (2) even mix: device d's post-shuffle batch (rows d*b:(d+1)*b)
        # holds exactly b/n samples from every source device (src = idx//b)
        for d in range(n):
            src = (shuffled[d * b:(d + 1) * b] // b).astype(np.int64)
            counts = np.bincount(src, minlength=n)
            np.testing.assert_array_equal(
                counts, np.full(n, b // n),
                err_msg=f"device {d} seed {seed}: uneven source mix")
        # and it actually moved samples across devices (not a local no-op)
        stay = sum(int(((shuffled[d * b:(d + 1) * b] // b) == d).sum())
                   for d in range(n))
        assert stay == n * (b // n)  # exactly its own quota, no more


def test_k400_scale_coclr_alltoall_dcn_step():
    """One CoCLR step at the K400 config shapes: moco-k 16384 ring buffer,
    bn_shuffle=alltoall (actually taken: per-device b % n == 0), 2-D
    (dcn, data) mesh. Reference workload: README.md:52-56 / main_coclr.py
    --moco-k 16384 on K400."""
    n = jax.device_count()
    T, S, K = 4, 32, 16384
    per_dev = n  # alltoall block exchange needs b % n == 0
    gb = n * per_dev
    assert K % gb == 0
    cfg = PretrainConfig(net="tiny", model="coclr", seq_len=T, img_dim=S,
                         batch_size=per_dev, moco_k=K, moco_dim=16,
                         compute_dtype="float32", bn_shuffle="alltoall",
                         dcn_size=2, topk=5)
    mesh = make_mesh(n, dcn_size=2)
    enc = ProjectionEncoder(network=cfg.net, dim=cfg.moco_dim,
                            dtype=jnp.float32)
    sample = jnp.zeros((1, T, S, S, 3), jnp.float32)
    state = moco.init_moco_state(jax.random.PRNGKey(0), enc, cfg.model,
                                 sample, dim=cfg.moco_dim, K=K)
    step_fn, tx = make_pretrain_step(enc, cfg, mesh=mesh, donate=False)
    opt_state = jax.jit(tx.init)(state.params_q)

    rng = np.random.RandomState(0)
    batch = {
        "seq_rgb": jnp.asarray(rng.rand(gb, 2, T, S, S, 3).astype(np.float32)),
        "seq_flow": jnp.asarray(rng.rand(gb, 2, T, S, S, 3).astype(np.float32)),
        "vname": jnp.asarray(rng.randint(0, 999, (gb,), np.int32)),
        "label": jnp.asarray(rng.randint(0, 10, (gb,), np.int32)),
    }
    state, opt_state, metrics = step_fn(state, opt_state, batch,
                                        jax.random.PRNGKey(1),
                                        jnp.float32(1e-3))
    assert np.isfinite(float(metrics["loss"]))
    assert int(np.asarray(state.queue_ptr)) == gb
    # enqueued rows are unit-norm keys in the 16384-deep ring
    norms = np.linalg.norm(np.asarray(state.queue[:gb]), axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
    # untouched tail still the random-init queue (normalized too), ptr math ok
    assert np.asarray(state.queue).shape == (K, cfg.moco_dim)
    # queue-fill gate: 16384-deep queue is NOT full after one step
    assert float(metrics["queue_is_full"]) == 0.0
