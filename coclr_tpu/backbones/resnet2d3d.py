"""ResNet-2d3d backbone (CVRL-style R50), TPU-native.

Parity target: /root/reference/backbone/resnet_2d3d.py:46-217.
Layers 1-2 use "2D" bottlenecks ((1,3,3) middle conv, 1x1x1 reductions),
layers 3-4 use "3D" bottlenecks ((3,1,1) temporal conv then (1,3,3) spatial).
The final block omits its last ReLU and the network re-applies ReLU at the end
(resnet_2d3d.py:181-184,202) — mathematically idempotent, structure preserved.

Initializers per the reference: kaiming normal fan_out for convs
(resnet_2d3d.py:150-153), BN gamma=1 beta=0 (:154-156).
Layout [B, T, H, W, C]; bf16 conv compute / f32 params+BN.

`sp_axis` (sequence parallelism, ops/seqpar.py — no reference
counterpart; None, a temporal mesh-axis name, or an SPAxes(t, h)):
temporally, only the stem conv (k_t=5, stride 2, pad 2) and the 3D
bottlenecks' conv1 (k_t=3, pad 1) touch time; each halo-exchanges its pad
width and runs VALID on the local block. Temporal strides elsewhere
(downsample/conv2) are always 1 in both published configs. Requires the
local T chunk even (stem stride 2): T % (2*sp) == 0. Under SPATIAL
sequence parallelism (h axis, round 4) the H-kernel sites are the stem
(k_h=7, pad 3, stride 2), the (1,3,3) stride-2 max pool, and every
bottleneck conv2 ((1,3,3), pad 1, spatial stride) — same halo treatment;
the stride-2 1x1x1 downsample convs tile without halo. Total spatial
stride is 32, so the local H chunk must satisfy H % (32*sph) == 0.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from coclr_tpu.backbones.norm import (FoldedBatchNorm, bn_relu,
                                      relu_keyed_on_output)
from coclr_tpu.backbones.s3d import max_pool_3d

kaiming_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _conv(out, kernel, stride, padding, dtype, name):
    return nn.Conv(
        out,
        kernel_size=kernel,
        strides=stride,
        padding=[(p, p) for p in padding],
        use_bias=False,
        kernel_init=kaiming_init,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def _bn(train, name, dtype, sp_axis=None):
    bn = FoldedBatchNorm(dtype=dtype, sp_axis=sp_axis, name=name)
    return lambda x: bn(x, use_running_average=not train)


class Bottleneck(nn.Module):
    """Bottleneck2d / Bottleneck3d in one module (resnet_2d3d.py:46-129).

    is_3d=True: conv1 is (3,1,1) temporal (pad (1,0,0)); False: conv1 is 1x1x1.
    `stride` is the (t, s) stride applied at conv2 as (t,s,s) — the reference
    applies (1,stride,stride) with tuple strides carrying the temporal part
    through the downsample path.
    """

    planes: int
    is_3d: bool
    stride: Tuple[int, int] = (1, 1)  # (temporal, spatial) of downsample/conv2
    use_final_relu: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    sp_axis: object = None  # str | SPAxes | None (seqpar.sp_axes spec)

    @nn.compact
    def __call__(self, x, train: bool):
        from coclr_tpu.ops.seqpar import sp_axes, spatial_halo, temporal_halo

        d = self.dtype
        expansion = 4
        st, ss = self.stride
        in_planes = x.shape[-1]
        out_planes = self.planes * expansion
        sp = None if self.is_initializing() else self.sp_axis
        t_ax, h_ax = sp_axes(sp)

        if self.is_3d:
            if t_ax is not None:
                # halo the (3,1,1) conv's pad width; run VALID locally
                h = temporal_halo(x, 1, 1, t_ax)
                h = _conv(self.planes, (3, 1, 1), (1, 1, 1), (0, 0, 0), d,
                          "conv1")(h)
            else:
                h = _conv(self.planes, (3, 1, 1), (1, 1, 1), (1, 0, 0), d,
                          "conv1")(x)
        else:
            h = _conv(self.planes, (1, 1, 1), (1, 1, 1), (0, 0, 0), d, "conv1")(x)
        h = bn_relu(h, train, d, name="bn1", sp_axis=sp)

        # conv2 spatial (1,3,3); spatial stride only (resnet_2d3d.py:56,99)
        if h_ax is not None:
            assert h.shape[2] % ss == 0, (
                f"local H chunk {h.shape[2]} not divisible by spatial "
                f"stride {ss} under spatial sequence parallelism")
            h = spatial_halo(h, 1, 1, h_ax)
            h = _conv(self.planes, (1, 3, 3), (1, ss, ss), (0, 0, 1), d,
                      "conv2")(h)
        else:
            h = _conv(self.planes, (1, 3, 3), (1, ss, ss), (0, 1, 1), d,
                      "conv2")(h)
        h = bn_relu(h, train, d, name="bn2", sp_axis=sp)

        h = _conv(out_planes, (1, 1, 1), (1, 1, 1), (0, 0, 0), d, "conv3")(h)
        h = _bn(train, "bn3", d, sp_axis=sp)(h)

        if (st, ss) != (1, 1) or in_planes != out_planes:
            # 1x1x1 conv with the customized (t,s,s) stride + BN
            # (resnet_2d3d.py:173-176)
            residual = _conv(out_planes, (1, 1, 1), (st, ss, ss), (0, 0, 0), d,
                             "downsample_conv")(x)
            residual = _bn(train, "downsample_bn", d, sp_axis=sp)(residual)
        else:
            residual = x

        out = h + residual.astype(h.dtype)
        if self.use_final_relu:
            out = relu_keyed_on_output(out)
        return out.astype(d)


class ResNet2d3d(nn.Module):
    """resnet_2d3d.py:133-202. blocks_3d[i] says whether layer i+1 uses 3D
    bottlenecks; layers gives block counts."""

    blocks_3d: Sequence[bool] = (False, False, True, True)
    layers: Sequence[int] = (3, 4, 6, 3)
    input_channel: int = 3
    dtype: jnp.dtype = jnp.bfloat16
    sp_axis: object = None  # str | SPAxes | None (seqpar.sp_axes spec)

    @nn.compact
    def __call__(self, x, train: bool = False):
        from coclr_tpu.ops.seqpar import (drop_h, gather_h, sp_axes,
                                          spatial_halo, temporal_halo)

        d = self.dtype
        x = x.astype(d)
        sp_mod = self.sp_axis  # spec handed to submodules
        sp = None if self.is_initializing() else sp_mod
        t_ax, h_ax = sp_axes(sp)

        t_pad, h_pad = (2, 2), (3, 3)
        if t_ax is not None:
            # stem (k_t=5, pad 2, stride 2): local T chunk must tile the
            # stride for the halo'd VALID conv to be exact (seqpar.py)
            assert x.shape[1] % 2 == 0, (
                f"sequence parallelism needs the local T chunk even for the "
                f"stride-2 stem; got T/sp={x.shape[1]}")
            x = temporal_halo(x, 2, 2, t_ax)
            t_pad = (0, 0)
        if h_ax is not None:
            assert x.shape[2] % 2 == 0, (
                f"spatially-sequence-parallel ResNet-2d3d needs an even "
                f"local H chunk ({x.shape[2]}) for the stride-2 stem")
            x = spatial_halo(x, 3, 3, h_ax)
            h_pad = (0, 0)

        def degrade_h(x, sp_mod, sp, h_ax):
            """Before a stride-2 H site: if the local H chunk no longer
            tiles the stride, all-gather H once and drop the sph axis for
            every later module — same late-gather fallback as S3D
            (exactness argument: seqpar.gather_h), so ANY img_dim works
            at any sph (e.g. 224: layer4's input H=14 doesn't tile 2
            shards; the gather fires there, where activations are
            smallest)."""
            if h_ax is None or x.shape[2] % 2 == 0:
                return x, sp_mod, sp, h_ax
            if not self.is_initializing():
                x = gather_h(x, h_ax)
            sp_mod = drop_h(sp_mod)
            return x, sp_mod, (None if self.is_initializing() else sp_mod), None
        x = nn.Conv(64, kernel_size=(5, 7, 7), strides=(2, 2, 2),
                    padding=[t_pad, h_pad, (3, 3)], use_bias=False,
                    kernel_init=kaiming_init, dtype=d,
                    param_dtype=jnp.float32, name="conv1")(x)
        x = bn_relu(x, train, d, name="bn1", sp_axis=sp)
        x, sp_mod, sp, h_ax = degrade_h(x, sp_mod, sp, h_ax)
        x = max_pool_3d(x, (1, 3, 3), (1, 2, 2), [(0, 0), (1, 1), (1, 1)],
                        sp_axis=sp)

        planes = (64, 128, 256, 512)
        for li in range(4):
            is_3d = self.blocks_3d[li]
            n_blocks = self.layers[li]
            is_final = li == 3
            if li > 0:  # layers 2-4 open with a stride-(1,2,2) block
                x, sp_mod, sp, h_ax = degrade_h(x, sp_mod, sp, h_ax)
            for bi in range(n_blocks):
                if bi == 0:
                    # layer1 stride 1; layers2-4 stride (1,2,2)
                    # (resnet_2d3d.py:146-149)
                    stride = (1, 1) if li == 0 else (1, 2)
                else:
                    stride = (1, 1)
                use_final_relu = not (is_final and bi == n_blocks - 1)
                x = Bottleneck(
                    planes=planes[li],
                    is_3d=is_3d,
                    stride=stride,
                    use_final_relu=use_final_relu,
                    dtype=d,
                    sp_axis=sp_mod,
                    name=f"layer{li + 1}_{bi}",
                )(x, train)

        return nn.relu(x)  # forward re-applies ReLU (resnet_2d3d.py:202)


def r2d3d50(input_channel: int = 3, dtype=jnp.bfloat16,
            sp_axis=None) -> ResNet2d3d:
    """CVRL ResNet-50: 2D,2D,3D,3D bottlenecks (resnet_2d3d.py:206-210)."""
    return ResNet2d3d(blocks_3d=(False, False, True, True), layers=(3, 4, 6, 3),
                      input_channel=input_channel, dtype=dtype,
                      sp_axis=sp_axis)


def r3d50(input_channel: int = 3, dtype=jnp.bfloat16,
          sp_axis=None) -> ResNet2d3d:
    """Full ResNet3D-50 (resnet_2d3d.py:213-217)."""
    return ResNet2d3d(blocks_3d=(True, True, True, True), layers=(3, 4, 6, 3),
                      input_channel=input_channel, dtype=dtype,
                      sp_axis=sp_axis)
