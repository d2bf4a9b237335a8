"""Backbone shape + torch-reference numerical parity tests."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coclr_tpu.backbones import select_backbone
from coclr_tpu.utils.torch_interop import (
    flax_from_torch_backbone,
    torch_from_flax_backbone,
)

REFERENCE = "/root/reference"


def _init_backbone(name, shape, dtype=jnp.float32):
    model, param = select_backbone(name, dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros(shape, jnp.float32),
                           train=False)
    return model, param, variables


def test_s3d_shapes():
    # temporal stride /8 (Conv_1a, MaxPool_4a, MaxPool_5a: s3dg.py:145,173,190),
    # spatial /32, 1024 channels
    model, param, variables = _init_backbone("s3d", (1, 8, 64, 64, 3))
    out = model.apply(variables, jnp.zeros((1, 8, 64, 64, 3)), train=False)
    assert out.shape == (1, 1, 2, 2, 1024)
    assert param["feature_size"] == 1024


def test_r50_shapes():
    # conv1 stride (2,2,2), maxpool /2, layers2-4 /2 spatial: T/2, H/32, W/32
    model, param, variables = _init_backbone("r50", (1, 8, 64, 64, 3))
    out = model.apply(variables, jnp.zeros((1, 8, 64, 64, 3)), train=False)
    assert out.shape == (1, 4, 2, 2, 2048)
    assert param["feature_size"] == 2048


@pytest.fixture(scope="module")
def torch_ref():
    torch = pytest.importorskip("torch")
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    return torch


def _param_count(tree):
    return sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree))


@pytest.mark.parametrize("gating", [False, True])
def test_s3d_torch_parity(torch_ref, gating):
    torch = torch_ref
    from backbone.s3dg import S3D as TorchS3D  # reference, read-only

    tmodel = TorchS3D(input_channel=3, gating=gating).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    name = "s3dg" if gating else "s3d"
    model, _, variables = _init_backbone(name, (1, 8, 32, 32, 3))
    converted = flax_from_torch_backbone(sd)

    # structural match with our init
    flat_ours = jax.tree_util.tree_structure(variables["params"])
    flat_theirs = jax.tree_util.tree_structure(converted["params"])
    assert flat_ours == flat_theirs
    assert _param_count(variables["params"]) == _param_count(converted["params"])

    x = np.random.RandomState(0).rand(1, 8, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()
    ours = model.apply(
        {"params": converted["params"], "batch_stats": converted["batch_stats"]},
        jnp.asarray(x), train=False)
    ours = np.asarray(ours).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_r50_torch_parity(torch_ref):
    torch = torch_ref
    from backbone.resnet_2d3d import r2d3d50 as torch_r2d3d50

    tmodel = torch_r2d3d50().eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    model, _, variables = _init_backbone("r50", (1, 4, 32, 32, 3))
    converted = flax_from_torch_backbone(sd)
    assert (jax.tree_util.tree_structure(variables["params"])
            == jax.tree_util.tree_structure(converted["params"]))

    x = np.random.RandomState(1).rand(1, 4, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()
    ours = model.apply(
        {"params": converted["params"], "batch_stats": converted["batch_stats"]},
        jnp.asarray(x), train=False)
    ours = np.asarray(ours).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_backbone_roundtrip(torch_ref):
    """flax -> torch -> flax is the identity (checkpoint export fidelity)."""
    model, _, variables = _init_backbone("s3d", (1, 8, 32, 32, 3))
    sd = torch_from_flax_backbone(variables)
    back = flax_from_torch_backbone(sd)
    for a, b in zip(jax.tree_util.tree_leaves(variables["params"]),
                    jax.tree_util.tree_leaves(back["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_max_pool_custom_backward_matches_reduce_window():
    """max_pool_3d's separable 1-D decomposition must match the 3-D
    reduce_window forward bitwise and its VJP on continuous inputs; on
    tie-heavy post-ReLU-style inputs (zeros everywhere) the oracle is the
    separable reduce_window chain (3-D SaS routes ties in scan order — the
    documented divergence)."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from coclr_tpu.backbones.s3d import max_pool_3d

    rng = np.random.RandomState(0)
    cases = [((3, 3, 3), (1, 1, 1), [(1, 1)] * 3),
             ((1, 3, 3), (1, 2, 2), [(0, 0), (1, 1), (1, 1)]),
             ((3, 3, 3), (2, 2, 2), [(1, 1)] * 3),
             ((2, 2, 2), (2, 2, 2), [(0, 0)] * 3)]
    def sep_pool(y, win, st, pad):
        # the separable reduce_window chain: the tie-routing oracle for the
        # custom backward (3-D SaS routes ties in 3-D scan order instead —
        # the documented divergence)
        for axis, (k, s, p) in enumerate(zip(win, st, pad), start=1):
            if (k, s, tuple(p)) == (1, 1, (0, 0)):
                continue
            w_ = [1, 1, 1]
            s_ = [1, 1, 1]
            p_ = [(0, 0)] * 3
            w_[axis - 1], s_[axis - 1], p_[axis - 1] = k, s, tuple(p)
            y = nn.max_pool(y, window_shape=tuple(w_), strides=tuple(s_),
                            padding=p_)
        return y

    x = jnp.asarray(rng.randn(2, 8, 13, 17, 5).astype(np.float32))
    xz = jnp.maximum(jnp.asarray(rng.randn(2, 8, 13, 17, 5)
                                 .astype(np.float32)), 0.0)
    xz = jnp.where(xz < 0.8, 0.0, xz)  # exact-zero ties everywhere
    for win, st, pad in cases:
        fp = [tuple(p) for p in pad]
        for inp, oracle in ((x, "full3d"), (xz, "separable")):
            ref = nn.max_pool(inp, window_shape=win, strides=st, padding=fp)
            got = max_pool_3d(inp, win, st, pad)
            assert np.array_equal(np.asarray(ref), np.asarray(got))
            g1 = jax.grad(lambda y: jnp.sum(
                jnp.sin(max_pool_3d(y, win, st, pad))))(inp)
            if oracle == "full3d":  # continuous input: ties measure-zero
                g2 = jax.grad(lambda y: jnp.sum(jnp.sin(
                    nn.max_pool(y, window_shape=win, strides=st,
                                padding=fp))))(inp)
            else:  # tie-heavy input: compare against the separable chain
                g2 = jax.grad(lambda y: jnp.sum(jnp.sin(
                    sep_pool(y, win, st, pad))))(inp)
            # atol: multi-window contributions sum in a different order
            np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                       atol=5e-5)
