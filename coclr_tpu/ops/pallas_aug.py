"""Pallas TPU kernel: the fused elementwise augmentation chain.

One VMEM-resident pass per frame computes what the stock XLA path does in
several HBM round-trips over the [F, S, S, 3] batch (uint8 decode, brightness,
contrast incl. its per-frame luma-mean reduction, saturation, HSV hue
rotation, RandomGray channel-splitting, and ImageNet normalization), reading
each frame from HBM once (uint8) and writing once (bfloat16/float32).

The spatial steps stay outside: GaussianBlur(+folded flip) is two banded
[S,S] matmuls (MXU work), and normalization commutes with them exactly
because the blur matrices are row-stochastic and the flip is a permutation —
so the kernel can fold normalize even though the reference applies it last
(utils/transforms.py:57-63 after augmentation.py's jitter chain).

Frames are channel-planar [F, 3, S, S] inside the kernel so each channel is a
well-tiled [S, S] plane (S = 128 -> (8,128)-aligned); channels-last [S, S, 3]
would put 3 in the 128-lane dimension. Per-frame jitter parameters arrive as
scalar-prefetch arrays (pltpu.PrefetchScalarGridSpec).

Semantics follow coclr_tpu/ops/augment.py (itself mirroring
/root/reference/utils/augmentation.py:219-356): factors are drawn OUTSIDE the
kernel with the same jax.random streams, so pallas on/off changes numerics
only by float-rounding (the kernel computes in f32; the jnp path computes in
the configured dtype).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from coclr_tpu.ops.augment import IMAGENET_MEAN, IMAGENET_STD

_LUMA_R, _LUMA_G, _LUMA_B = 0.299, 0.587, 0.114  # ITU-R 601-2


def _hue_rotate(r, g, b, fh):
    """HSV hue rotation by fh (in turns) on [S,S] f32 planes; elementwise
    VPU math (mirrors augment.rgb_to_hsv/hsv_to_rgb where-chains)."""
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(delta == 0, 0.0, h)

    h = (h + fh) % 1.0
    v = maxc
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6

    def pick(opts):
        out = opts[5]
        for idx in range(4, -1, -1):
            out = jnp.where(i == idx, opts[idx], out)
        return out

    r2 = pick([v, q, p, p, t, v])
    g2 = pick([t, v, v, q, p, p])
    b2 = pick([p, p, t, v, v, q])
    clip = lambda a: jnp.clip(a, 0.0, 1.0)
    return clip(r2), clip(g2), clip(b2)


def _jitter_kernel(fb_ref, fc_ref, fs_ref, fh_ref, gray_ref, order_ref,
                   x_ref, o_ref, *, out_dtype, mean, std):
    import jax.experimental.pallas as pl  # local import keeps module light

    i = pl.program_id(0)
    fb = fb_ref[i]
    fc = fc_ref[i]
    fs = fs_ref[i]
    fh = fh_ref[i]
    gray = gray_ref[i]   # -1: keep color; 0/1/2: split that channel
    order = order_ref[i]  # packed 2-bit op codes, position 0 in the low bits

    inv255 = 1.0 / 255.0
    # Mosaic has no direct u8->f32 cast; hop through int32
    u8f = lambda a: a.astype(jnp.int32).astype(jnp.float32)
    r = u8f(x_ref[0, 0]) * inv255
    g = u8f(x_ref[0, 1]) * inv255
    b = u8f(x_ref[0, 2]) * inv255
    clip = lambda a: jnp.clip(a, 0.0, 1.0)

    def op_brightness(rgb):
        r, g, b = rgb
        return clip(r * fb), clip(g * fb), clip(b * fb)

    def op_contrast(rgb):
        # per-frame luma mean of the CURRENT image (PIL ImageEnhance.Contrast)
        r, g, b = rgb
        lmean = jnp.mean(_LUMA_R * r + _LUMA_G * g + _LUMA_B * b)
        return (clip(r * fc + lmean * (1.0 - fc)),
                clip(g * fc + lmean * (1.0 - fc)),
                clip(b * fc + lmean * (1.0 - fc)))

    def op_saturation(rgb):
        r, g, b = rgb
        luma = _LUMA_R * r + _LUMA_G * g + _LUMA_B * b
        return (clip(r * fs + luma * (1.0 - fs)),
                clip(g * fs + luma * (1.0 - fs)),
                clip(b * fs + luma * (1.0 - fs)))

    def op_hue(rgb):
        # exact identity when fh == 0 — the null path must be bit-clean
        r, g, b = rgb
        r2, g2, b2 = _hue_rotate(r, g, b, fh)
        keep = fh == 0.0
        return (jnp.where(keep, r, r2), jnp.where(keep, g, g2),
                jnp.where(keep, b, b2))

    # positional loop over the per-frame random op order (reference:
    # augmentation.py:272-293 shuffles the 4 ops once per clip unit); only
    # the selected op executes per position (real branch, not a select)
    rgb = (r, g, b)
    for pos in range(4):
        code = (order >> (2 * pos)) & 3
        rgb = jax.lax.switch(
            code, [op_brightness, op_contrast, op_saturation, op_hue], rgb)
    r, g, b = rgb

    # RandomGray channel split (augmentation.py:211-216): channel per frame
    sel = jnp.where(gray == 0, r, jnp.where(gray == 1, g, b))
    r = jnp.where(gray >= 0, sel, r)
    g = jnp.where(gray >= 0, sel, g)
    b = jnp.where(gray >= 0, sel, b)

    # normalize (folded: commutes with the downstream blur/flip)
    o_ref[0, 0] = ((r - mean[0]) / std[0]).astype(out_dtype)
    o_ref[0, 1] = ((g - mean[1]) / std[1]).astype(out_dtype)
    o_ref[0, 2] = ((b - mean[2]) / std[2]).astype(out_dtype)


def fused_jitter_normalize(x_planar_u8, fb, fc, fs, fh, gray_sel, orders=None,
                           out_dtype=jnp.bfloat16, interpret=False,
                           mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """x_planar_u8: [F, 3, S, S] uint8. fb/fc/fs/fh: [F] f32 per-frame jitter
    factors (1/1/1/0 = identity). gray_sel: [F] int32, -1 = keep color, else
    the channel whose value replaces all three. orders: [F] int32 packed
    per-frame op orders (see ops.augment.pack_orders; None = fixed b->c->s->h).
    Returns [F, 3, S, S] `out_dtype`, jittered + gray'd + normalized by
    (mean, std).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from coclr_tpu.ops.augment import FIXED_ORDER_CODE

    f, c, s1, s2 = x_planar_u8.shape
    assert c == 3
    if orders is None:
        orders = jnp.full((f,), FIXED_ORDER_CODE, jnp.int32)
    # mosaic compiles only for real TPU backends; interpret elsewhere (tests)
    if jax.default_backend() not in ("tpu", "axon"):
        interpret = True
    kernel = functools.partial(_jitter_kernel, out_dtype=out_dtype,
                               mean=tuple(mean), std=tuple(std))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(f,),
        in_specs=[
            pl.BlockSpec((1, 3, s1, s2), lambda i, *_: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 3, s1, s2), lambda i, *_: (i, 0, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((f, 3, s1, s2), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(fb.astype(jnp.float32), fc.astype(jnp.float32), fs.astype(jnp.float32),
      fh.astype(jnp.float32), gray_sel.astype(jnp.int32),
      orders.astype(jnp.int32), x_planar_u8)
