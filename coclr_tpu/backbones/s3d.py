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

import os
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from coclr_tpu.backbones.norm import bn_relu

# Matches the reference init: conv.weight.data.normal_(mean=0, std=0.01).
conv_init = nn.initializers.normal(stddev=0.01)


def _pool_1d_fwd(x, axis: int, k: int, s: int, pad):
    win = [1] * x.ndim
    st = [1] * x.ndim
    pd = [(0, 0)] * x.ndim
    win[axis], st[axis], pd[axis] = k, s, tuple(pad)
    return nn.max_pool(x, window_shape=tuple(win[1:-1]),
                       strides=tuple(st[1:-1]), padding=pd[1:-1])


def max_pool_3d(x, window, strides, padding, sp_axis=None):
    """3D max pool over [B, T, H, W, C]; `padding` is per-dim (lo, hi) pairs.

    `sp_axis`: sequence-parallel mesh axes (ops/seqpar.py; None, a bare
    temporal axis name, or an SPAxes naming temporal+spatial) — the
    temporal/height 1-D pools then run VALID on halo-extended local blocks
    (exact tiling; the zero-filled global edges are value-identical to the
    -inf pad on these post-ReLU inputs, see seqpar._halo).

    Torch MaxPool3d pads with -inf implicitly (s3dg.py:105,151,173,190).

    Implemented as up to three separable 1-D max pools (max over a product
    window == iterated per-axis max). Forward values are bitwise-identical
    to a single 3-D reduce_window; the backward becomes three 1-D
    select_and_scatter ops (3+3+3 window points, ~10ms/step) instead of one
    3-D one (27 points, ~20ms/step). A hand-written shifted-compare VJP was
    tried and REVERTED: its per-tap jax.lax.pads materialized full copies
    (31ms of pad + 21ms of selects) — on this HBM-bound step the 1-D
    select_and_scatter is already near its data-movement floor. Tie
    divergence vs cuDNN's 3-D first-argmax rule: the separable argmax picks
    first-per-axis instead of first-in-window-scan-order — measure-zero for
    continuous activations and irrelevant for the ubiquitous all-zero
    post-ReLU ties (any routing sends gradient to a zero).
    """
    from coclr_tpu.ops import pallas_pool
    from coclr_tpu.ops.seqpar import _halo, sp_axes

    t_ax, h_ax = sp_axes(sp_axis)
    use_pallas = pallas_pool.pool_backward_mode() == "pallas"
    for axis, (k, s, p) in enumerate(zip(window, strides, padding), start=1):
        if k == 1 and s == 1 and tuple(p) == (0, 0):
            continue
        p = tuple(p)
        halo_ax = t_ax if axis == 1 else (h_ax if axis == 2 else None)
        if halo_ax is not None and (k > 1 or p != (0, 0)):
            assert x.shape[axis] % s == 0, (
                f"local chunk {x.shape[axis]} (dim {axis}) not divisible "
                f"by pool stride {s} under sequence parallelism")
            x = _halo(x, p[0], p[1], halo_ax, dim=axis)
            p = (0, 0)
        if use_pallas:
            assert p[0] == p[1]
            x = pallas_pool.max_pool_1d(x, axis, k, s, p[0])
        else:
            x = _pool_1d_fwd(x, axis, k, s, p)
    return x


class BasicConv3d(nn.Module):
    """Conv3d(bias=False) + BN + ReLU (s3dg.py:8-28).

    Under sequence parallelism (`sp_axis`: None / temporal axis name /
    SPAxes) a temporal and/or height kernel runs VALID on a halo-extended
    block (exact, ops/seqpar.py); unsharded dims unchanged.
    """

    out_planes: int
    kernel_size: Sequence[int]  # (kt, kh, kw)
    stride: Sequence[int]
    padding: Sequence[int]  # symmetric per-dim
    dtype: jnp.dtype = jnp.bfloat16
    sp_axis: object = None  # str | SPAxes | None (seqpar.sp_axes spec)

    @nn.compact
    def __call__(self, x, train: bool):
        from coclr_tpu.ops.seqpar import sp_axes, spatial_halo, temporal_halo

        # collectives cannot run during init (outside the mesh); param and
        # stat shapes are T/H-independent so init with sp off is identical
        sp = None if self.is_initializing() else self.sp_axis
        t_ax, h_ax = sp_axes(sp)
        pads = list(self.padding)
        if t_ax is not None and (self.kernel_size[0] > 1 or pads[0] > 0):
            # exact tiling of the halo'd VALID conv needs the local T chunk
            # to tile the temporal stride (seqpar._halo docstring)
            assert x.shape[1] % self.stride[0] == 0, (
                f"local T chunk {x.shape[1]} not divisible by temporal "
                f"stride {self.stride[0]} under sequence parallelism")
            x = temporal_halo(x, pads[0], pads[0], t_ax)
            pads[0] = 0
        if h_ax is not None and (self.kernel_size[1] > 1 or pads[1] > 0):
            assert x.shape[2] % self.stride[1] == 0, (
                f"local H chunk {x.shape[2]} not divisible by spatial "
                f"stride {self.stride[1]} under spatial sequence parallelism")
            x = spatial_halo(x, pads[1], pads[1], h_ax)
            pads[1] = 0
        x = nn.Conv(
            self.out_planes,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.stride),
            padding=[(p, p) for p in pads],
            use_bias=False,
            kernel_init=conv_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        # torch momentum=0.1 convention flipped -> momentum 0.9 (default)
        return bn_relu(x, train, self.dtype, name="bn", sp_axis=sp)


class SpaceToDepthConv(nn.Module):
    """Spatial (1,k,k) stride-2 conv computed as a (1,ceil((k+1)/2),·) stride-1
    conv on 2x2 space-to-depth input — mathematically exact, same parameter
    (canonical [1,k,k,Cin,Cout] kernel, so checkpoint interop is unchanged).

    Motivation: the S3D stem convolves RGB (Cin=3), using 3/128 of each MXU
    pass; profiling showed the stem at ~12% MXU utilization and ~12% of step
    time. Space-to-depth packs 2x2 pixel blocks into channels (Cin 3->12) and
    halves H,W, quadrupling systolic-array occupancy for the same math.

    Input may arrive PRE-PACKED as [B, T, H/2, W/2, 4c] (channel index
    (ph*2+pw)*c + cc for 2x2 phase (ph, pw)) — e.g. emitted by the aug
    pipeline (ops/augment.py emit_s2d) — in which case the on-device one-hot
    packing conv is skipped entirely. Packing commutes with the conv's edge
    padding because the effective left pad p0 = p+1 is even: padding the
    packed tensor with p0/2 zero 4c-vectors equals padding the original
    image with p0 zero pixels.
    """

    out_planes: int
    kernel_size: int  # k, odd
    padding: int      # symmetric; stride fixed at 2
    dtype: jnp.dtype = jnp.bfloat16
    in_channels: int = 3  # canonical Cin of the parameter

    @nn.compact
    def __call__(self, x):
        k, p, c = self.kernel_size, self.padding, self.in_channels
        packed = x.shape[-1] == 4 * c
        assert packed or x.shape[-1] == c, (
            f"expected {c} (raw) or {4 * c} (pre-packed) channels, "
            f"got {x.shape[-1]}")
        kernel = self.param("kernel", conv_init,
                            (1, k, k, c, self.out_planes), jnp.float32)
        b, t, h, w, _ = x.shape
        if packed:
            h, w = 2 * h, 2 * w
        out_h, out_w = (h + 2 * p - k) // 2 + 1, (w + 2 * p - k) // 2 + 1
        # out[i] = sum_m xpad[2i+m] w[m], xpad = pad(x, p). Re-index with an
        # even left pad P0 = p+1 (k odd => p even in our uses keeps parity):
        # out[i] = sum_{m'=1..k} x_P0[2i+m'] w[m'-1]  ==  an (k+1)-tap kernel
        # w8 = [0, w...] consumed as ceil((k+1)/2) taps of 2-pixel phases.
        p0 = p + 1
        assert p0 % 2 == 0, "space-to-depth stem expects odd k with odd pad"
        taps = (k + 1) // 2  # number of 2-pixel taps, k odd -> (k+1)/2
        hi_h = 2 * (out_h - 1) + k - h - p
        hi_w = 2 * (out_w - 1) + k - w - p
        hi_h += (p0 + h + hi_h) % 2
        hi_w += (p0 + w + hi_w) % 2
        if packed:
            # phases align (p0, h, hi all even), so padding in packed
            # coordinates is exact — no packing conv at all
            assert hi_h % 2 == 0 and hi_w % 2 == 0 and h % 2 == 0
            xs2d = jnp.pad(x.astype(self.dtype),
                           ((0, 0), (0, 0), (p0 // 2, hi_h // 2),
                            (p0 // 2, hi_w // 2), (0, 0)))
        else:
            xp = jnp.pad(x, ((0, 0), (0, 0), (p0, hi_h), (p0, hi_w), (0, 0)))
            # 2x2 space-to-depth via a one-hot (1,2,2,c,4c) stride-2 conv:
            # both strided slices (lowered to gathers, ~5ms each at stem
            # size) and >5-D reshapes (pathological layout search) are far
            # slower on this backend than a stride-2 conv, XLA's
            # best-optimized data movement.
            eye = jnp.zeros((1, 2, 2, c, 4 * c), self.dtype)
            for ph in (0, 1):
                for pw in (0, 1):
                    eye = eye.at[0, ph, pw,
                                 jnp.arange(c),
                                 (ph * 2 + pw) * c + jnp.arange(c)].set(1)
            xs2d = jax.lax.conv_general_dilated(
                xp.astype(self.dtype), eye,
                window_strides=(1, 2, 2), padding="VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=self.dtype)
        # kernel: [1,k,k,c,o] -> [1,k+1,k+1,c,o] (zero tap at index 0)
        #   -> [1,taps,2,taps,2,c,o] -> [1,taps,taps,2,2,c,o] -> [1,taps,taps,4c,o]
        w8 = jnp.pad(kernel, ((0, 0), (1, 0), (1, 0), (0, 0), (0, 0)))
        w2 = w8.reshape(1, taps, 2, taps, 2, c, self.out_planes)
        w2 = w2.transpose(0, 1, 3, 2, 4, 5, 6).reshape(
            1, taps, taps, 4 * c, self.out_planes)
        y = jax.lax.conv_general_dilated(
            xs2d, w2.astype(self.dtype),
            window_strides=(1, 1, 1), padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=self.dtype)
        return y[:, :, :out_h, :out_w, :]


class STConv3d(nn.Module):
    """Separable spatio-temporal conv: (1,k,k) then (k,1,1), each +BN+ReLU
    (s3dg.py:30-65)."""

    out_planes: int
    kernel_size: int
    stride: Sequence[int]  # (t_stride, s_stride) expanded from ref's int/tuple
    padding: int
    dtype: jnp.dtype = jnp.bfloat16
    s2d_spatial: bool = False  # exact space-to-depth path for the RGB stem
    s2d_in_channels: int = 3   # canonical Cin (input may be pre-packed 4x)
    sp_axis: object = None  # str | SPAxes | None (seqpar.sp_axes spec)

    @nn.compact
    def __call__(self, x, train: bool):
        from coclr_tpu.ops.seqpar import sp_axes, spatial_halo, temporal_halo

        sp = None if self.is_initializing() else self.sp_axis
        t_ax, h_ax = sp_axes(sp)
        k, p = self.kernel_size, self.padding
        t_stride, s_stride = self.stride
        if self.s2d_spatial and s_stride == 2:
            assert h_ax is None, (
                "the space-to-depth stem does not support spatial sequence "
                "parallelism (its 2x2 repack crosses the H shards); unset "
                "COCLR_S2D_STEM or sph_size")
            x = SpaceToDepthConv(self.out_planes, k, p, self.dtype,
                                 in_channels=self.s2d_in_channels,
                                 name="conv1")(x)
        else:
            h_pad = (p, p)
            if h_ax is not None and (k > 1 or p > 0):
                assert x.shape[2] % s_stride == 0, (
                    f"local H chunk {x.shape[2]} not divisible by spatial "
                    f"stride {s_stride} under spatial sequence parallelism")
                x = spatial_halo(x, p, p, h_ax)
                h_pad = (0, 0)
            x = nn.Conv(
                self.out_planes,
                kernel_size=(1, k, k),
                strides=(1, s_stride, s_stride),
                padding=[(0, 0), h_pad, (p, p)],
                use_bias=False,
                kernel_init=conv_init,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="conv1",
            )(x)
        x = bn_relu(x, train, self.dtype, name="bn1", sp_axis=sp)
        t_pad = (p, p)
        if t_ax is not None and (k > 1 or p > 0):
            assert x.shape[1] % t_stride == 0, (
                f"local T chunk {x.shape[1]} not divisible by temporal "
                f"stride {t_stride} under sequence parallelism")
            x = temporal_halo(x, p, p, t_ax)
            t_pad = (0, 0)
        x = nn.Conv(
            self.out_planes,
            kernel_size=(k, 1, 1),
            strides=(t_stride, 1, 1),
            padding=[t_pad, (0, 0), (0, 0)],
            use_bias=False,
            kernel_init=conv_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv2",
        )(x)
        return bn_relu(x, train, self.dtype, name="bn2", sp_axis=sp)


class SelfGating(nn.Module):
    """S3D-G feature gating: sigmoid(FC(spatiotemporal mean)) * x
    (s3dg.py:68-78). Under sp the spatiotemporal mean composes exactly from
    per-shard means of the equal-size time/height chunks."""

    sp_axis: object = None  # str | SPAxes | None (seqpar.sp_axes spec)

    @nn.compact
    def __call__(self, x):
        from coclr_tpu.ops.seqpar import sp_pmean

        # x: [B, T, H, W, C]
        avg = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))
        avg = sp_pmean(
            avg, None if self.is_initializing() else self.sp_axis)
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
    sp_axis: object = None  # str | SPAxes | None (seqpar.sp_axes spec)

    @nn.compact
    def __call__(self, x, train: bool):
        b0, b1a, b1b, b2a, b2b, b3b = self.out_planes
        d = self.dtype
        sp = self.sp_axis
        sp_now = None if self.is_initializing() else sp

        x0 = BasicConv3d(b0, (1, 1, 1), (1, 1, 1), (0, 0, 0), d, sp_axis=sp, name="branch0")(x, train)
        x1 = BasicConv3d(b1a, (1, 1, 1), (1, 1, 1), (0, 0, 0), d, sp_axis=sp, name="branch1_0")(x, train)
        x1 = STConv3d(b1b, 3, (1, 1), 1, d, sp_axis=sp, name="branch1_1")(x1, train)
        x2 = BasicConv3d(b2a, (1, 1, 1), (1, 1, 1), (0, 0, 0), d, sp_axis=sp, name="branch2_0")(x, train)
        x2 = STConv3d(b2b, 3, (1, 1), 1, d, sp_axis=sp, name="branch2_1")(x2, train)
        x3 = max_pool_3d(x, (3, 3, 3), (1, 1, 1), [(1, 1)] * 3,
                         sp_axis=sp_now)
        x3 = BasicConv3d(b3b, (1, 1, 1), (1, 1, 1), (0, 0, 0), d, sp_axis=sp, name="branch3_1")(x3, train)

        if self.gating:
            x0 = SelfGating(sp_axis=sp, name="gating_b0")(x0)
            x1 = SelfGating(sp_axis=sp, name="gating_b1")(x1)
            x2 = SelfGating(sp_axis=sp, name="gating_b2")(x2)
            x3 = SelfGating(sp_axis=sp, name="gating_b3")(x3)

        return jnp.concatenate([x0, x1, x2, x3], axis=-1)


class S3D(nn.Module):
    """S3D backbone (s3dg.py:135-217). Input [B, T, H, W, C]; output
    [B, T/4 (T/2 if slow), H/32, W/32, 1024]."""

    input_channel: int = 3
    gating: bool = False
    slow: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    # exact space-to-depth stem: measured a small net LOSS at batch 32
    # (one-hot s2d conv costs ~3.3ms vs ~0.9ms saved on the C_in=3 convs),
    # kept available for larger-batch / multi-chip configs
    s2d_stem: bool = False
    # sequence parallelism (ops/seqpar.py): None, a temporal mesh-axis name,
    # or an SPAxes(t, h). The local T chunk must be divisible by the total
    # temporal stride (8, or 4 with slow=True); the local H chunk must be
    # EVEN (the stem's stride 2). Deeper stride-2 sites that no longer
    # tile the shrinking local H chunk fall back via `seqpar.gather_h`:
    # the full H is all-gathered once and the remaining (tiny) blocks run
    # replicated over `sph` — so 160/224 work at sph 2 (round 5; they
    # failed the old H%32 contract), gathering only at block 5 where
    # activations are smallest. 128/192/256 stay sharded end-to-end.
    sp_axis: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from coclr_tpu.ops.seqpar import drop_h, gather_h, sp_axes

        d = self.dtype
        sp = self.sp_axis
        sp_now = None if self.is_initializing() else sp
        t_ax, h_ax = sp_axes(sp)
        x = x.astype(d)
        if x.shape[-1] == 4 * self.input_channel:
            assert self.s2d_stem, (
                "pre-packed (space-to-depth) input requires s2d_stem=True")
        if t_ax is not None:
            div = 4 if self.slow else 8
            assert x.shape[1] % div == 0, (
                f"sequence-parallel S3D needs the local T chunk ({x.shape[1]})"
                f" divisible by the total temporal stride {div}")
        if h_ax is not None:
            assert x.shape[2] % 2 == 0, (
                f"spatially-sequence-parallel S3D needs an even local H "
                f"chunk ({x.shape[2]}) for the stride-2 stem")

        def degrade_h(x, sp, sp_now, h_ax):
            """Before a stride-2 H site: if the local H chunk no longer
            tiles the stride, all-gather H once and drop the sph axis for
            every later module (exactness argument: seqpar.gather_h)."""
            if h_ax is None or x.shape[2] % 2 == 0:
                return x, sp, sp_now, h_ax
            if not self.is_initializing():
                x = gather_h(x, h_ax)
            sp = drop_h(sp)
            return x, sp, (None if self.is_initializing() else sp), None

        # block1 (s3dg.py:143-147)
        t_stride = 1 if self.slow else 2
        x = STConv3d(64, 7, (t_stride, 2), 3, d, s2d_spatial=self.s2d_stem,
                     s2d_in_channels=self.input_channel, sp_axis=sp,
                     name="Conv_1a")(x, train)

        # block2 (s3dg.py:151-158); the pool is spatial-only, so it needs
        # sp_axis only for the H halo under spatial sequence parallelism
        x, sp, sp_now, h_ax = degrade_h(x, sp, sp_now, h_ax)
        x = max_pool_3d(x, (1, 3, 3), (1, 2, 2), [(0, 0), (1, 1), (1, 1)],
                        sp_axis=sp_now)
        x = BasicConv3d(64, (1, 1, 1), (1, 1, 1), (0, 0, 0), d, sp_axis=sp, name="Conv_2b")(x, train)
        x = STConv3d(192, 3, (1, 1), 1, d, sp_axis=sp, name="Conv_2c")(x, train)

        # COCLR_REMAT=block: rematerialize each inception block in the
        # backward pass (jax.checkpoint via flax lifted remat) — saves only
        # block inputs as AD residuals, recomputing branch activations in
        # bwd. A bandwidth-bound-step experiment (VERDICT-r3 ask #2a): fwd
        # writes fewer residual bytes, bwd re-reads/recomputes. Measured
        # numbers in DESIGN.md "Round 4".
        Sep = SepInception
        if os.environ.get("COCLR_REMAT", "") == "block":
            Sep = nn.remat(SepInception, static_argnums=(2,))

        # block3 (s3dg.py:162-169)
        x, sp, sp_now, h_ax = degrade_h(x, sp, sp_now, h_ax)
        x = max_pool_3d(x, (1, 3, 3), (1, 2, 2), [(0, 0), (1, 1), (1, 1)],
                        sp_axis=sp_now)
        x = Sep([64, 96, 128, 16, 32, 32], self.gating, d, sp_axis=sp, name="Mixed_3b")(x, train)
        x = Sep([128, 128, 192, 32, 96, 64], self.gating, d, sp_axis=sp, name="Mixed_3c")(x, train)

        # block4 (s3dg.py:173-186)
        x, sp, sp_now, h_ax = degrade_h(x, sp, sp_now, h_ax)
        x = max_pool_3d(x, (3, 3, 3), (2, 2, 2), [(1, 1)] * 3, sp_axis=sp_now)
        x = Sep([192, 96, 208, 16, 48, 64], self.gating, d, sp_axis=sp, name="Mixed_4b")(x, train)
        x = Sep([160, 112, 224, 24, 64, 64], self.gating, d, sp_axis=sp, name="Mixed_4c")(x, train)
        x = Sep([128, 128, 256, 24, 64, 64], self.gating, d, sp_axis=sp, name="Mixed_4d")(x, train)
        x = Sep([112, 144, 288, 32, 64, 64], self.gating, d, sp_axis=sp, name="Mixed_4e")(x, train)
        x = Sep([256, 160, 320, 32, 128, 128], self.gating, d, sp_axis=sp, name="Mixed_4f")(x, train)

        # block5 (s3dg.py:190-197)
        x, sp, sp_now, h_ax = degrade_h(x, sp, sp_now, h_ax)
        x = max_pool_3d(x, (2, 2, 2), (2, 2, 2), [(0, 0)] * 3, sp_axis=sp_now)
        x = Sep([256, 160, 320, 32, 128, 128], self.gating, d, sp_axis=sp, name="Mixed_5b")(x, train)
        x = Sep([384, 192, 384, 48, 128, 128], self.gating, d, sp_axis=sp, name="Mixed_5c")(x, train)
        return x
