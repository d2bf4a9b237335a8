"""Backbone + projection head encoder.

Parity: the reference's encoder_q/encoder_k/sampler Sequential
(/root/reference/model/pretrain.py:49-62): backbone -> AdaptiveAvgPool3d(1) ->
Conv3d(fs, fs, 1, bias) -> ReLU -> Conv3d(fs, dim, 1, bias).

On TPU the 1x1x1 convs over a pooled [B,1,1,1,C] tensor are plain Dense
layers (exact same math, MXU-friendly). Torch's default Conv3d init
(kaiming_uniform(a=sqrt(5)) == uniform(+-1/sqrt(fan_in)) for weight and bias)
is mirrored so training curves start from the same distribution.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from coclr_tpu.backbones import select_backbone

# torch Conv3d/Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
# weight and bias (kaiming_uniform with a=sqrt(5) reduces to this).
torch_default_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def torch_default_bias_init(key, shape, dtype=jnp.float32, fan_in=None):
    import jax

    bound = 1.0 / jnp.sqrt(fan_in) if fan_in else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class ProjectionEncoder(nn.Module):
    """backbone -> global avg pool -> fc1 -> ReLU -> fc2 (dim).

    `sp_axis`: sequence-parallel mesh axes (ops/seqpar.py: None, a bare
    temporal axis name, or an SPAxes(t, h) adding spatial H sharding). The
    backbone runs on the local T chunk (halo-exchanged convs/pools); the
    global average pool composes exactly as a local mean + pmean over sp,
    so the projection head sees the identical pooled feature on every sp
    member and the downstream MoCo state stays replicated across sp.
    """

    network: str = "s3d"
    dim: int = 128
    dtype: jnp.dtype = jnp.bfloat16
    sp_axis: object = None  # str | SPAxes | None (seqpar.sp_axes spec)

    def setup(self):
        self.backbone, self.param = select_backbone(
            self.network, dtype=self.dtype, sp_axis=self.sp_axis)
        fs = self.param["feature_size"]
        self.fc1 = nn.Dense(
            fs,
            kernel_init=torch_default_kernel_init,
            bias_init=lambda k, s, d=jnp.float32: torch_default_bias_init(k, s, d, fan_in=fs),
            dtype=jnp.float32, name="fc1")
        self.fc2 = nn.Dense(
            self.dim,
            kernel_init=torch_default_kernel_init,
            bias_init=lambda k, s, d=jnp.float32: torch_default_bias_init(k, s, d, fan_in=fs),
            dtype=jnp.float32, name="fc2")

    def __call__(self, x, train: bool = False):
        """x: [B, T, H, W, C] video; returns UNNORMALIZED [B, dim] float32."""
        from coclr_tpu.ops.seqpar import sp_pmean

        feat = self.backbone(x, train=train)
        feat = jnp.mean(feat.astype(jnp.float32), axis=(1, 2, 3))  # [B, fs]
        feat = sp_pmean(
            feat, None if self.is_initializing() else self.sp_axis)
        h = nn.relu(self.fc1(feat))
        return self.fc2(h)

    def features(self, x, train: bool = False):
        """Pooled backbone features [B, feature_size] (for eval/retrieval)."""
        from coclr_tpu.ops.seqpar import sp_pmean

        feat = self.backbone(x, train=train)
        feat = jnp.mean(feat.astype(jnp.float32), axis=(1, 2, 3))
        return sp_pmean(
            feat, None if self.is_initializing() else self.sp_axis)
