"""Full-model numerical parity against the ACTUAL reference torch modules.

Closes VERDICT-r2 missing #1: the MoCo heads were verified only against
numpy formulas; here we assert that, given identical weights (exported via
`torch_interop`), identical queue state, and identical inputs, our
functional pipeline reproduces the reference `InfoNCE.forward` /
`UberNCE.forward` / `CoCLR.forward`
(/root/reference/model/pretrain.py:145-190, 229-278, 344-418) and
`LinearClassifier.forward` (/root/reference/model/classifier.py:47-61):
same logits, same positive masks, same post-step queue / queue_ptr /
EMA'd key encoder.

Conditions forced identical on both sides:

- **Frozen BN stats**: the torch models run `.eval()` *with grad enabled*,
  so `in_train_mode` (== `q.requires_grad`, pretrain.py:156) stays True and
  the EMA update + dequeue/enqueue side effects still fire, while BN uses
  running stats. Ours runs `train=False` encoders with the same stats.
- **Single rank**: `torch.distributed` is monkeypatched to world-size-1
  semantics (gather = identity copy, broadcast = no-op, rank 0) and
  `Tensor.cuda` to identity, so the DDP-only reference code runs on CPU.
  The batch shuffle (pretrain.py:99-143) then reduces to a within-batch
  permutation whose effect is exactly cancelled by the unshuffle under
  frozen BN stats — the logits are permutation-independent.

Weight transfer uses `load_state_dict(strict=True)`, which doubles as a
structural assertion that our export produces *every* buffer and parameter
the reference model owns, and nothing else.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flax import traverse_util

from coclr_tpu.models import moco
from coclr_tpu.models.encoder import ProjectionEncoder
from coclr_tpu.utils.torch_interop import (
    flax_from_torch_classifier,
    torch_from_flax_proj_encoder,
    torch_from_moco_state,
)

REFERENCE = "/root/reference"

DIM, K, B, T, S = 8, 16, 2, 8, 32
M, TEMP, TOPK = 0.999, 0.07, 3


@pytest.fixture()
def ref_env(monkeypatch):
    """CPU-runnable reference modules: torch + single-rank DDP shims."""
    torch = pytest.importorskip("torch")
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    dist = torch.distributed

    def _all_gather(out_list, tensor, async_op=False):
        assert len(out_list) == 1
        out_list[0].copy_(tensor)

    monkeypatch.setattr(dist, "get_world_size", lambda *a, **k: 1)
    monkeypatch.setattr(dist, "get_rank", lambda *a, **k: 0)
    monkeypatch.setattr(dist, "broadcast", lambda *a, **k: None)
    monkeypatch.setattr(dist, "all_gather", _all_gather)
    return torch


def _randomized_stats(stats, seed):
    """Nontrivial BN running stats so eval-mode BN actually normalizes."""
    rs = np.random.RandomState(seed)
    flat = traverse_util.flatten_dict(stats)
    out = {}
    for path, leaf in flat.items():
        shape = np.shape(leaf)
        if path[-1] == "var":
            out[path] = jnp.asarray(1.0 + 0.2 * rs.rand(*shape),
                                    jnp.float32)
        else:
            out[path] = jnp.asarray(0.05 * rs.randn(*shape), jnp.float32)
    return traverse_util.unflatten_dict(out)


@pytest.fixture(scope="module")
def our_state():
    """One s3d MoCoState shared by all variants (coclr superset; the
    infonce/ubernce tests just ignore the sampler/extra queues)."""
    enc = ProjectionEncoder(network="s3d", dim=DIM, dtype=jnp.float32)
    clip = jnp.zeros((1, T, S, S, 3), jnp.float32)
    state = moco.init_moco_state(jax.random.PRNGKey(0), enc, "coclr", clip,
                                 dim=DIM, K=K, use_jit=False)
    # distinct key encoder (EMA must actually move) + nontrivial BN stats
    k_vars = enc.init(jax.random.PRNGKey(7), clip, train=False)
    state = state.replace(
        params_k=k_vars["params"],
        stats_q=_randomized_stats(state.stats_q, 1),
        stats_k=_randomized_stats(state.stats_k, 2),
        stats_s=_randomized_stats(state.stats_s, 3),
    )
    return enc, state


def _load_reference(torch, tmodel, state, variant):
    sd = torch_from_moco_state(state, variant)
    tsd = {k: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))
           for k, v in sd.items()}
    tmodel.load_state_dict(tsd, strict=True)
    tmodel.eval()  # frozen BN stats; grad stays enabled (in_train_mode=True)
    return tmodel


def _inputs(seed, n=2):
    rs = np.random.RandomState(seed)
    return [rs.rand(B, T, S, S, 3).astype(np.float32) for _ in range(n)]


def _to_torch_block(torch, *clips):
    """[B,T,H,W,C] clips -> reference block [B,N,C,T,H,W]."""
    stacked = np.stack(clips, axis=1).transpose(0, 1, 5, 2, 3, 4)
    return torch.from_numpy(np.ascontiguousarray(stacked))


def _our_forward(enc, state, x1, x2):
    """Mirror of the step under frozen stats: EMA -> k -> q -> logits ->
    enqueue. Returns (logits, k, new_params_k, state_after_enqueue)."""
    params_k = moco.momentum_update(state.params_q, state.params_k, M)
    state = state.replace(params_k=params_k)
    k = moco.l2_normalize(enc.apply(
        {"params": params_k, "batch_stats": state.stats_k},
        jnp.asarray(x2), train=False))
    q = moco.l2_normalize(enc.apply(
        {"params": state.params_q, "batch_stats": state.stats_q},
        jnp.asarray(x1), train=False))
    logits = moco.moco_logits(q, k, state.queue, TEMP)
    return logits, k, params_k, state


def _assert_queue_and_ema(torch, tmodel, enc, state_after, params_k,
                          stats_k, batch):
    tsd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    # ring buffer write + pointer (pretrain.py:83-96)
    np.testing.assert_allclose(
        tsd["queue"], np.asarray(state_after.queue).T, atol=1e-5)
    assert int(tsd["queue_ptr"][0]) == int(state_after.queue_ptr) == batch
    # EMA'd key encoder, every parameter (pretrain.py:77-80)
    ours_k = torch_from_flax_proj_encoder(
        {"params": params_k, "batch_stats": stats_k}, "encoder_k.")
    for key, val in ours_k.items():
        if key.endswith("num_batches_tracked"):
            continue
        np.testing.assert_allclose(tsd[key], np.asarray(val), atol=1e-6,
                                   err_msg=key)


def test_infonce_forward_parity(ref_env, our_state):
    torch = ref_env
    from model.pretrain import InfoNCE

    enc, state = our_state
    tmodel = _load_reference(
        torch, InfoNCE(network="s3d", dim=DIM, K=K, m=M, T=TEMP),
        state, "infonce")

    x1, x2 = _inputs(10)
    ref_logits, ref_labels = tmodel(_to_torch_block(torch, x1, x2))

    logits, k, params_k, state2 = _our_forward(enc, state, x1, x2)
    state2 = moco.dequeue_and_enqueue(state2, k, None)

    np.testing.assert_allclose(np.asarray(logits),
                               ref_logits.detach().numpy(),
                               atol=5e-3, rtol=1e-4)
    assert np.array_equal(ref_labels.detach().numpy(), np.zeros(B))
    _assert_queue_and_ema(torch, tmodel, enc, state2, params_k,
                          state.stats_k, B)


def test_ubernce_forward_parity(ref_env, our_state):
    torch = ref_env
    from model.pretrain import UberNCE

    enc, state = our_state
    # labels in the queue: classes 0..3 tiled; batch labels hit some of them
    queue_label = jnp.asarray(np.arange(K) % 4, jnp.int32)
    state = state.replace(queue_label=queue_label)
    tmodel = _load_reference(
        torch, UberNCE(network="s3d", dim=DIM, K=K, m=M, T=TEMP),
        state, "ubernce")

    x1, x2 = _inputs(11)
    labels = np.asarray([1, 3], np.int64)
    ref_logits, ref_mask = tmodel(_to_torch_block(torch, x1, x2),
                                  torch.from_numpy(labels))

    logits, k, params_k, state2 = _our_forward(enc, state, x1, x2)
    mask = moco.ubernce_mask(jnp.asarray(labels, jnp.int32), queue_label)
    state2 = moco.dequeue_and_enqueue(state2, k, None,
                                      labels=jnp.asarray(labels, jnp.int32))

    np.testing.assert_allclose(np.asarray(logits),
                               ref_logits.detach().numpy(),
                               atol=5e-3, rtol=1e-4)
    # mask semantics (pretrain.py:271-273): exact binary agreement
    assert np.array_equal(np.asarray(mask) > 0, ref_mask.detach().numpy())
    assert np.asarray(mask).shape == (B, 1 + K)
    _assert_queue_and_ema(torch, tmodel, enc, state2, params_k,
                          state.stats_k, B)
    # post-step label queue
    tsd = {k_: v.detach().numpy() for k_, v in tmodel.state_dict().items()}
    np.testing.assert_array_equal(tsd["queue_label"],
                                  np.asarray(state2.queue_label))


@pytest.mark.parametrize("queue_full", [True, False])
def test_coclr_forward_parity(ref_env, our_state, queue_full):
    torch = ref_env
    from model.pretrain import CoCLR

    enc, state = our_state
    # vnames 0..K-1 in the queue; batch sample 0 collides with entry 3
    # (sibling-video mask_source path, pretrain.py:397-399)
    queue_vname = jnp.asarray(np.arange(K), jnp.int32)
    queue_label = (jnp.ones((K,), jnp.int32) if queue_full
                   else state.queue_label)  # all -1 -> mining gated off
    state = state.replace(queue_vname=queue_vname, queue_label=queue_label)
    tmodel = _load_reference(
        torch, CoCLR(network="s3d", dim=DIM, K=K, m=M, T=TEMP, topk=TOPK),
        state, "coclr")

    x1, x2 = _inputs(12)
    f1, f2 = _inputs(13)
    vsource = np.asarray([3, 1000], np.int64)
    ref_logits, ref_mask = tmodel(
        _to_torch_block(torch, x1, f1), _to_torch_block(torch, x2, f2),
        torch.from_numpy(vsource))
    assert bool(tmodel.queue_is_full) == queue_full

    logits, k, params_k, state2 = _our_forward(enc, state, x1, x2)
    kf = moco.l2_normalize(enc.apply(
        {"params": state.params_s, "batch_stats": state.stats_s},
        jnp.asarray(f2), train=False))
    mask = moco.coclr_mask(kf, jnp.asarray(vsource, jnp.int32),
                           state.queue_second, queue_vname, queue_label,
                           TOPK)
    state2 = moco.dequeue_and_enqueue(
        state2, k, None, keys_second=kf,
        vnames=jnp.asarray(vsource, jnp.int32))

    np.testing.assert_allclose(np.asarray(logits),
                               ref_logits.detach().numpy(),
                               atol=5e-3, rtol=1e-4)
    got_mask = np.asarray(mask) > 0
    assert np.array_equal(got_mask, ref_mask.detach().numpy())
    if queue_full:
        # mining actually fired: each row has the self column + sibling
        # and/or top-k extras
        assert got_mask[:, 1:].sum() >= TOPK
    else:
        # gated: only self + sibling-vname columns
        assert got_mask[0, 1:].sum() == 1 and got_mask[1, 1:].sum() == 0

    _assert_queue_and_ema(torch, tmodel, enc, state2, params_k,
                          state.stats_k, B)
    tsd = {k_: v.detach().numpy() for k_, v in tmodel.state_dict().items()}
    np.testing.assert_allclose(tsd["queue_second"],
                               np.asarray(state2.queue_second).T, atol=1e-5)
    np.testing.assert_array_equal(tsd["queue_vname"],
                                  np.asarray(state2.queue_vname))
    # CoCLR writes queue_label=1 as the filled flag (pretrain.py:338)
    np.testing.assert_array_equal(tsd["queue_label"][:B], np.ones(B))


@pytest.mark.parametrize("use_l2_norm,use_final_bn",
                         [(False, False), (True, True)])
def test_linear_classifier_parity(ref_env, use_l2_norm, use_final_bn):
    """LinearClassifier logit + feat vs model/classifier.py:47-61 (torch ->
    flax direction via flax_from_torch_classifier)."""
    torch = ref_env
    from model.classifier import LinearClassifier as TorchClassifier

    from coclr_tpu.models.classifier import LinearClassifier

    tmodel = TorchClassifier(num_class=11, network="s3d",
                             use_dropout=True, use_l2_norm=use_l2_norm,
                             use_final_bn=use_final_bn)
    # nontrivial running stats
    rs = np.random.RandomState(21)
    with torch.no_grad():
        for name, buf in tmodel.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.from_numpy(
                    (0.05 * rs.randn(*buf.shape)).astype(np.float32)))
            elif name.endswith("running_var"):
                buf.copy_(torch.from_numpy(
                    (1.0 + 0.2 * rs.rand(*buf.shape)).astype(np.float32)))
    tmodel.eval()

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = flax_from_torch_classifier(sd)

    ours = LinearClassifier(num_class=11, network="s3d",
                            use_l2_norm=use_l2_norm,
                            use_final_bn=use_final_bn, dtype=jnp.float32)

    x = rs.rand(B, T, S, S, 3).astype(np.float32)
    with torch.no_grad():
        ref_logit, ref_feat = tmodel(
            torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    logit, feat = ours.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False)

    np.testing.assert_allclose(np.asarray(feat), ref_feat.numpy(),
                               atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(logit), ref_logit.numpy(),
                               atol=2e-3, rtol=1e-4)
