"""Pallas 1-D max-pool backward vs select_and_scatter (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coclr_tpu.ops.pallas_pool import max_pool_1d, pool1d_bwd

CASES = [(3, 1, 1, 16), (3, 2, 1, 16), (3, 2, 1, 13), (2, 2, 0, 16),
         (2, 2, 0, 17), (3, 2, 1, 64)]


@pytest.mark.parametrize("k,s,lo,n", CASES)
@pytest.mark.parametrize("ties", [False, True])
def test_pool1d_bwd_matches_select_and_scatter(k, s, lo, n, ties):
    rng = np.random.RandomState(0)
    P, Q = 4, 256
    x = jnp.asarray(rng.randn(P, n, Q).astype(np.float32))
    if ties:
        x = jnp.where(x < 0.5, 0.0, x)  # post-ReLU-style exact ties

    def pool(y):
        return jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, k, 1),
                                     (1, s, 1), [(0, 0), (lo, lo), (0, 0)])

    out = pool(x)
    g = jnp.asarray(rng.randn(*out.shape).astype(np.float32))
    _, vjp = jax.vjp(pool, x)
    want = vjp(g)[0]
    got = pool1d_bwd(x, out, g, k, s, lo)  # interpret on CPU
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_max_pool_1d_custom_vjp_end_to_end():
    """The custom_vjp wrapper (reshape + kernel) through jax.grad."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 12, 10, 5).astype(np.float32))

    def f_pallas(y):
        return jnp.sum(jnp.sin(max_pool_1d(y, 2, 3, 2, 1)))

    def f_ref(y):
        return jnp.sum(jnp.sin(jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 1, 3, 1, 1), (1, 1, 2, 1, 1),
            [(0, 0), (0, 0), (1, 1), (0, 0), (0, 0)])))

    g1 = jax.grad(f_pallas)(x)
    g2 = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)
