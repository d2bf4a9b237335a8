"""S3D / S3D-G backbone, TPU-native (Flax linen, NDHWC, bf16 MXU compute).

Architecture parity with the reference separable-3D Inception network
(/root/reference/backbone/s3dg.py:8-217): factored spatial (1,k,k) +
temporal (k,1,1) convolutions, five blocks, optional self-gating.

Design differences from the torch reference (deliberate, TPU-first):
  - channels-last video layout [B, T, H, W, C] so XLA tiles convs onto the MXU;
  - convolutions compute in a configurable dtype (bfloat16 by default) with
    float32 parameters; BatchNorm statistics always float32;
  - BatchNorm is functional (batch_stats collection) instead of buffer mutation.

Initializers follow the reference exactly (they matter for training-curve
reproduction): conv weights ~ Normal(0, 0.01) (s3dg.py:20,51-52), BN gamma=1,
beta=0 (s3dg.py:21-22,53-56).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

# Matches the reference init: conv.weight.data.normal_(mean=0, std=0.01).
conv_init = nn.initializers.normal(stddev=0.01)


def max_pool_3d(x, window, strides, padding):
    """3D max pool over [B, T, H, W, C]; `padding` is per-dim (lo, hi) pairs.

    Torch MaxPool3d pads with -inf implicitly (s3dg.py:105,151,173,190);
    flax max_pool does the same for explicit padding.
    """
    return nn.max_pool(
        x,
        window_shape=window,
        strides=strides,
        padding=[tuple(p) for p in padding],
    )


class BasicConv3d(nn.Module):
    """Conv3d(bias=False) + BN + ReLU (s3dg.py:8-28)."""

    out_planes: int
    kernel_size: Sequence[int]  # (kt, kh, kw)
    stride: Sequence[int]
    padding: Sequence[int]  # symmetric per-dim
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.out_planes,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.stride),
            padding=[(p, p) for p in self.padding],
            use_bias=False,
            kernel_init=conv_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,  # torch momentum=0.1 convention flipped
            epsilon=1e-5,
            dtype=jnp.float32,
            name="bn",
        )(x)
        return nn.relu(x).astype(self.dtype)


class STConv3d(nn.Module):
    """Separable spatio-temporal conv: (1,k,k) then (k,1,1), each +BN+ReLU
    (s3dg.py:30-65)."""

    out_planes: int
    kernel_size: int
    stride: Sequence[int]  # (t_stride, s_stride) expanded from ref's int/tuple
    padding: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        k, p = self.kernel_size, self.padding
        t_stride, s_stride = self.stride
        x = nn.Conv(
            self.out_planes,
            kernel_size=(1, k, k),
            strides=(1, s_stride, s_stride),
            padding=[(0, 0), (p, p), (p, p)],
            use_bias=False,
            kernel_init=conv_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="bn1",
        )(x)
        x = nn.relu(x).astype(self.dtype)
        x = nn.Conv(
            self.out_planes,
            kernel_size=(k, 1, 1),
            strides=(t_stride, 1, 1),
            padding=[(p, p), (0, 0), (0, 0)],
            use_bias=False,
            kernel_init=conv_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv2",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="bn2",
        )(x)
        return nn.relu(x).astype(self.dtype)


class SelfGating(nn.Module):
    """S3D-G feature gating: sigmoid(FC(spatiotemporal mean)) * x
    (s3dg.py:68-78)."""

    @nn.compact
    def __call__(self, x):
        # x: [B, T, H, W, C]
        avg = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))
        weights = nn.Dense(x.shape[-1], dtype=jnp.float32, name="fc")(avg)
        weights = nn.sigmoid(weights)
        return (weights[:, None, None, None, :] * x.astype(jnp.float32)).astype(x.dtype)


class SepInception(nn.Module):
    """Inception block with separable 3x3x3 branches (s3dg.py:81-132).

    out_planes = [b0, b1a, b1b, b2a, b2b, b3b] as in the reference.
    """

    out_planes: Sequence[int]
    gating: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        b0, b1a, b1b, b2a, b2b, b3b = self.out_planes
        d = self.dtype

        x0 = BasicConv3d(b0, (1, 1, 1), (1, 1, 1), (0, 0, 0), d, name="branch0")(x, train)
        x1 = BasicConv3d(b1a, (1, 1, 1), (1, 1, 1), (0, 0, 0), d, name="branch1_0")(x, train)
        x1 = STConv3d(b1b, 3, (1, 1), 1, d, name="branch1_1")(x1, train)
        x2 = BasicConv3d(b2a, (1, 1, 1), (1, 1, 1), (0, 0, 0), d, name="branch2_0")(x, train)
        x2 = STConv3d(b2b, 3, (1, 1), 1, d, name="branch2_1")(x2, train)
        x3 = max_pool_3d(x, (3, 3, 3), (1, 1, 1), [(1, 1)] * 3)
        x3 = BasicConv3d(b3b, (1, 1, 1), (1, 1, 1), (0, 0, 0), d, name="branch3_1")(x3, train)

        if self.gating:
            x0 = SelfGating(name="gating_b0")(x0)
            x1 = SelfGating(name="gating_b1")(x1)
            x2 = SelfGating(name="gating_b2")(x2)
            x3 = SelfGating(name="gating_b3")(x3)

        return jnp.concatenate([x0, x1, x2, x3], axis=-1)


class S3D(nn.Module):
    """S3D backbone (s3dg.py:135-217). Input [B, T, H, W, C]; output
    [B, T/4 (T/2 if slow), H/32, W/32, 1024]."""

    input_channel: int = 3
    gating: bool = False
    slow: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = x.astype(d)

        # block1 (s3dg.py:143-147)
        t_stride = 1 if self.slow else 2
        x = STConv3d(64, 7, (t_stride, 2), 3, d, name="Conv_1a")(x, train)

        # block2 (s3dg.py:151-158)
        x = max_pool_3d(x, (1, 3, 3), (1, 2, 2), [(0, 0), (1, 1), (1, 1)])
        x = BasicConv3d(64, (1, 1, 1), (1, 1, 1), (0, 0, 0), d, name="Conv_2b")(x, train)
        x = STConv3d(192, 3, (1, 1), 1, d, name="Conv_2c")(x, train)

        # block3 (s3dg.py:162-169)
        x = max_pool_3d(x, (1, 3, 3), (1, 2, 2), [(0, 0), (1, 1), (1, 1)])
        x = SepInception([64, 96, 128, 16, 32, 32], self.gating, d, name="Mixed_3b")(x, train)
        x = SepInception([128, 128, 192, 32, 96, 64], self.gating, d, name="Mixed_3c")(x, train)

        # block4 (s3dg.py:173-186)
        x = max_pool_3d(x, (3, 3, 3), (2, 2, 2), [(1, 1)] * 3)
        x = SepInception([192, 96, 208, 16, 48, 64], self.gating, d, name="Mixed_4b")(x, train)
        x = SepInception([160, 112, 224, 24, 64, 64], self.gating, d, name="Mixed_4c")(x, train)
        x = SepInception([128, 128, 256, 24, 64, 64], self.gating, d, name="Mixed_4d")(x, train)
        x = SepInception([112, 144, 288, 32, 64, 64], self.gating, d, name="Mixed_4e")(x, train)
        x = SepInception([256, 160, 320, 32, 128, 128], self.gating, d, name="Mixed_4f")(x, train)

        # block5 (s3dg.py:190-197)
        x = max_pool_3d(x, (2, 2, 2), (2, 2, 2), [(0, 0)] * 3)
        x = SepInception([256, 160, 320, 32, 128, 128], self.gating, d, name="Mixed_5b")(x, train)
        x = SepInception([384, 192, 384, 48, 128, 128], self.gating, d, name="Mixed_5c")(x, train)
        return x
