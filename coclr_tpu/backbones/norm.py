"""BatchNorm + ReLU tuned for HBM-bound TPU training.

Semantics parity: torch nn.BatchNorm3d as used by the reference backbones
(/root/reference/backbone/s3dg.py:15-22, resnet_2d3d.py:59-66): per-channel
batch statistics in training, running-average statistics in eval, gamma/beta
affine, and — unlike flax nn.BatchNorm — the torch running-var convention
(running_var accumulates the UNBIASED n/(n-1) batch variance while the
normalization itself uses the biased one), so post-training running stats
match reference checkpoints exactly (asserted by tests/test_model_parity.py).

Why not flax nn.BatchNorm(dtype=float32): under `jax.grad`, its unfused
normalize chain makes float32 activation-sized intermediates (x_hat, the
pre-ReLU output) AD residuals, so every BatchNorm costs extra full f32
HBM round-trips on the backward pass. This implementation:

  - computes mean/var in float32 (reductions fuse into the producing conv),
  - FOLDS the normalize into one per-channel affine y = x * s + o with
    s = gamma * rsqrt(var + eps), o = beta - mean * s  (f32 scalars),
    applied in the compute dtype (bf16) — so the only activation-sized AD
    residual is the conv output x itself, which the forward pass already
    materializes (d gamma needs sum(dy * x); d x flows through s and,
    in training, through the stats' dependence on x — algebraically the
    standard BN backward, handled by AD);
  - `relu_keyed_on_output` keys the ReLU mask on its OUTPUT (y > 0,
    identical routing to jax.nn.relu's x > 0 rule incl. the x == 0 case),
    so the residual is the post-ReLU tensor that the next conv reads
    anyway, instead of forcing the BN output (normally fused away) to
    materialize as a residual.

Net effect: the backward pass reads only bfloat16 tensors that exist
regardless; measured on the v5e bench step this removes ~1/4 of the HBM
traffic (DESIGN.md "round 2").

Variable names/collections match flax nn.BatchNorm exactly
(params: scale, bias; batch_stats: mean, var) so init trees, checkpoints
and torch interop are unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


@jax.custom_vjp
def relu_keyed_on_output(x):
    return jnp.maximum(x, 0)


def _relu_fwd(x):
    y = jnp.maximum(x, 0)
    return y, y


def _relu_bwd(y, g):
    return (jnp.where(y > 0, g, jnp.zeros_like(g)),)


relu_keyed_on_output.defvjp(_relu_fwd, _relu_bwd)


def _batch_stats(x):
    """Per-channel (mean, biased var) in float32 over all-but-last axes.

    COCLR_BN_STATS selects the lowering (numerically equivalent up to
    f32 accumulation order; all three verified against flax BatchNorm):
      - 'fused' (default): convert+square+reduce, which XLA fuses into the
        producing convolution's epilogue.
      - 'barrier': optimization_barrier first, so the stats reduce compiles
        as its own pass instead of constraining the conv fusion's tiling.
      - 'dot': per-channel sums as MXU contractions — sum(x) and the
        diagonal of x^T x via multi-dim dot_general (no reshape/copy);
        trades C x redundant (free) MXU flops for full-bandwidth reads,
        vs the VPU cross-sublane reduction chains of 'fused'.
    """
    import os

    mode = os.environ.get("COCLR_BN_STATS", "fused")
    c = x.shape[-1]
    n = x.size // c
    axes = tuple(range(x.ndim - 1))
    if mode == "barrier":
        x = jax.lax.optimization_barrier(x)
    if mode == "dot":
        return _stats_dot(x)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes)
    # E[x^2] - E[x]^2 (biased), as flax computes it
    var = jnp.maximum(jnp.mean(xf * xf, axis=axes) - mean * mean, 0.0)
    return mean, var


@jax.custom_vjp
def _stats_dot(x):
    axes = tuple(range(x.ndim - 1))
    n = x.size // x.shape[-1]
    ones = jnp.ones(x.shape[:-1], x.dtype)
    dn = ((axes, axes), ((), ()))
    s1 = jax.lax.dot_general(ones, x, dn, preferred_element_type=jnp.float32)
    xtx = jax.lax.dot_general(x, x, dn, preferred_element_type=jnp.float32)
    mean = s1 / n
    var = jnp.maximum(jnp.diagonal(xtx) / n - mean * mean, 0.0)
    return mean, var


def _stats_dot_fwd(x):
    mean, var = _stats_dot(x)
    return (mean, var), (x, mean)


def _stats_dot_bwd(res, g):
    # analytic, elementwise (what AD of the reduce formulation produces);
    # avoids differentiating through the x^T x contraction, whose VJP would
    # be another full-size MXU pass + x-sized gradient write.
    x, mean = res
    gm, gv = g
    n = x.size // x.shape[-1]
    xf = x.astype(jnp.float32)
    dx = gm / n + (xf - mean) * (2.0 / n) * gv
    return (dx.astype(x.dtype),)


_stats_dot.defvjp(_stats_dot_fwd, _stats_dot_bwd)


class FoldedBatchNorm(nn.Module):
    """BatchNorm with the normalize folded to one per-channel affine.

    `dtype` is the apply/compute dtype of the elementwise affine (the
    surrounding conv compute dtype); statistics and parameters are float32.

    `sp_axis`: sequence-parallel mesh axis/axes (ops/seqpar.py — None, a
    bare temporal axis name, or an SPAxes naming temporal+spatial). When
    set, batch statistics are pmean'd over it so the statistic scope stays
    "this data shard's batch, full T x H" — numerically the unsharded BN,
    and exactly the per-device-batch semantics MoCo's shuffle-BN relies on.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16
    sp_axis: object = None  # str | SPAxes | None (seqpar.sp_axes spec)

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                nn.initializers.zeros, None, (c,), jnp.float32)
        ra_var = self.variable("batch_stats", "var",
                               nn.initializers.ones, None, (c,), jnp.float32)

        from coclr_tpu.ops.seqpar import sp_names, sp_pmean

        names = sp_names(self.sp_axis)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        elif names and not self.is_initializing():
            # sync over the sp shards of the time/height axes: E[x], E[x^2]
            # are means over equal-size shards, so pmean composes exactly
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = sp_pmean(jnp.mean(xf, axis=axes), self.sp_axis)
            ex2 = sp_pmean(jnp.mean(xf * xf, axis=axes), self.sp_axis)
            var = jnp.maximum(ex2 - mean * mean, 0.0)
        else:
            mean, var = _batch_stats(x)
        if not use_running_average:
            if not self.is_initializing():
                # torch nn.BatchNorm running-var update uses the UNBIASED
                # n/(n-1) estimator (normalization itself uses the biased
                # one) — flax uses biased for both; torch semantics are kept
                # here for eval-mode parity with reference checkpoints.
                n = x.size // c
                for nm in names:
                    n = n * jax.lax.axis_size(nm)
                corr = n / max(n - 1, 1)
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var * corr)

        s = scale * jax.lax.rsqrt(var + self.epsilon)
        o = bias - mean * s
        d = self.dtype
        return x.astype(d) * s.astype(d) + o.astype(d)


def bn_relu(x, train: bool, dtype, name: str, sp_axis: str | None = None):
    """FoldedBatchNorm + output-keyed ReLU, the backbone's BN+ReLU unit."""
    x = FoldedBatchNorm(dtype=dtype, sp_axis=sp_axis, name=name)(
        x, use_running_average=not train)
    return relu_keyed_on_output(x)
