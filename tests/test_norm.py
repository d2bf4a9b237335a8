"""FoldedBatchNorm == flax BatchNorm (values, grads, running stats), across
all COCLR_BN_STATS lowerings, plus the output-keyed ReLU VJP.

The folded form (backbones/norm.py) exists for HBM-traffic reasons on TPU;
these tests pin its numerics to flax nn.BatchNorm so backbone torch-parity
rests on a verified foundation.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from coclr_tpu.backbones import norm


def _rand(key, shape, scale=1.7, shift=0.4):
    return jax.random.normal(key, shape, jnp.float32) * scale + shift


def test_folded_bn_matches_flax_train_and_eval():
    x = _rand(jax.random.PRNGKey(0), (4, 3, 5, 5, 8))
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5,
                       dtype=jnp.float32)
    mine = norm.FoldedBatchNorm(dtype=jnp.float32)
    vr = ref.init(jax.random.PRNGKey(1), x)
    vm = mine.init(jax.random.PRNGKey(1), x, use_running_average=False)
    assert (jax.tree_util.tree_structure(vr)
            == jax.tree_util.tree_structure(vm))

    sc = _rand(jax.random.PRNGKey(2), (8,), 0.5, 1.0)
    bi = _rand(jax.random.PRNGKey(3), (8,), 0.3, 0.0)
    stats = vr["batch_stats"]
    vr = vm = {"params": {"scale": sc, "bias": bi}, "batch_stats": stats}

    def f_ref(params, x):
        y, mut = ref.apply({"params": params, "batch_stats": stats}, x,
                           mutable=["batch_stats"])
        return jnp.sum(jax.nn.relu(y) ** 2), (y, mut["batch_stats"])

    def f_mine(params, x):
        y, mut = mine.apply({"params": params, "batch_stats": stats}, x,
                            use_running_average=False,
                            mutable=["batch_stats"])
        return (jnp.sum(norm.relu_keyed_on_output(y) ** 2),
                (y, mut["batch_stats"]))

    (lr, (yr, sr)), gr = jax.value_and_grad(f_ref, (0, 1), has_aux=True)(
        vr["params"], x)
    (lm, (ym, sm)), gm = jax.value_and_grad(f_mine, (0, 1), has_aux=True)(
        vm["params"], x)

    np.testing.assert_allclose(yr, ym, atol=2e-6)
    np.testing.assert_allclose(float(lr), float(lm), rtol=1e-6)
    np.testing.assert_allclose(sr["mean"], sm["mean"], atol=1e-6)
    # running var: ours follows torch (unbiased n/(n-1) update), flax biased
    n = x.size // x.shape[-1]
    batch_var = jnp.var(x, axis=(0, 1, 2, 3))
    expected_var = 0.9 * stats["var"] + 0.1 * batch_var * n / (n - 1)
    np.testing.assert_allclose(expected_var, sm["var"], atol=1e-5)
    np.testing.assert_allclose(gr[1], gm[1], atol=1e-5)  # d/dx
    np.testing.assert_allclose(gr[0]["scale"], gm[0]["scale"], rtol=1e-4)
    np.testing.assert_allclose(gr[0]["bias"], gm[0]["bias"], rtol=1e-4)

    # eval mode: running stats, exact folded equivalence
    ye_ref = nn.BatchNorm(use_running_average=True, momentum=0.9,
                          epsilon=1e-5, dtype=jnp.float32).apply(vr, x)
    ye_mine = mine.apply(vm, x, use_running_average=True)
    np.testing.assert_allclose(ye_ref, ye_mine, atol=2e-6)


@pytest.mark.parametrize("mode", ["barrier", "dot"])
def test_stats_lowerings_match_fused(mode, monkeypatch):
    x = _rand(jax.random.PRNGKey(7), (2, 3, 4, 4, 6))

    def loss(x, m):
        monkeypatch.setenv("COCLR_BN_STATS", m)
        mean, var = norm._batch_stats(x)
        w = jnp.arange(6.0)
        return jnp.sum(mean * w) + jnp.sum(var * jnp.cos(w))

    v0, g0 = jax.value_and_grad(loss)(x, "fused")
    v1, g1 = jax.value_and_grad(loss)(x, mode)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    np.testing.assert_allclose(g0, g1, atol=1e-6)


def test_relu_keyed_on_output_matches_jax_relu():
    x = jnp.asarray([-2.0, -0.0, 0.0, 1e-30, 0.5, 3.0])

    def f(fn, x):
        return jnp.sum(fn(x) * jnp.arange(1.0, 7.0))

    vr, gr = jax.value_and_grad(lambda x: f(jax.nn.relu, x))(x)
    vm, gm = jax.value_and_grad(lambda x: f(norm.relu_keyed_on_output, x))(x)
    np.testing.assert_array_equal(np.asarray(gr), np.asarray(gm))
    assert float(vr) == float(vm)
