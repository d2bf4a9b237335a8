"""On-device augmentation (the device half of utils/augmentation.py).

Host sends cropped uint8 clips + per-clip `aug_base` flags
(coclr_tpu/data/hostaug.py); this module runs the rest of the reference's
base/null transform inside the jitted train step, vmapped over (sample, clip):

  base: ColorJitter(0.4,0.4,0.4,0.1) @ p=0.8, RandomGray @ p=0.2 (channel
        split, channel chosen per frame), GaussianBlur(sigma U[0.1,2]) @ p=0.5,
        HFlip @ p=0.5    (main_nce.py:373-382)
  null: HFlip @ p=0.5 only (main_nce.py:367-371)

All random draws are per clip unit (the `consistent=False, seq_len` semantics;
a unit is T frames, or 2T rgb+flow frames for CoCLR), except the RandomGray
channel choice, which the reference draws per frame (augmentation.py:211-216).
Jitter op order is a random permutation like torchvision's get_params shuffle
(augmentation.py:272-293).

Numerics notes (documented divergences from PIL): uint8-rounded HSV hue
rotation is done in float; PIL's 3-pass box-blur approximation is replaced by
an exact separable Gaussian; contrast uses the float per-frame luma mean.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# ITU-R 601-2 luma weights. Kept as a Python tuple (not a jnp array): a
# module-level device array would initialize the XLA backend at import time,
# which breaks multihost startup — jax.distributed.initialize() must precede
# the first backend touch (see parallel/multihost.py). einsum folds the
# constant under jit either way.
_LUMA = (0.299, 0.587, 0.114)
BLUR_TAPS = 13  # covers 3*sigma_max = 6 pixels each side at sigma = 2


def _luma(x):
    return jnp.einsum("...c,c->...", x, jnp.asarray(_LUMA, jnp.float32))


def adjust_brightness(x, factor):
    return jnp.clip(x * factor, 0.0, 1.0)


def adjust_contrast(x, factor):
    # per-frame mean of the grayscale image (PIL ImageEnhance.Contrast).
    # NB: reduce over a flattened trailing axis — reducing (-2,-1) of a 6-D
    # array with keepdims sent the TPU compiler into a ~500s layout search.
    luma = _luma(x).astype(jnp.float32)  # f32 accumulate even in bf16 mode
    mean = jnp.mean(luma.reshape(luma.shape[:-2] + (-1,)), axis=-1)
    mean = mean[..., None, None, None].astype(x.dtype)
    return jnp.clip(x * factor + mean * (1.0 - factor), 0.0, 1.0)


def adjust_saturation(x, factor):
    gray = _luma(x)[..., None]
    return jnp.clip(x * factor + gray * (1.0 - factor), 0.0, 1.0)


def rgb_to_hsv(x):
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.max(x, axis=-1)
    minc = jnp.min(x, axis=-1)
    v = maxc
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
    return h, s, v


def hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6

    # where-chains, not jnp.choose: choose lowers to per-element gathers
    # (~50x slower on the VPU than selects)
    def pick(opts):
        out = opts[5]
        for idx in range(4, -1, -1):
            out = jnp.where(i == idx, opts[idx], out)
        return out

    r = pick([v, q, p, p, t, v])
    g = pick([t, v, v, q, p, p])
    b = pick([p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(x, delta):
    h, s, v = rgb_to_hsv(x)
    out = jnp.clip(hsv_to_rgb((h + delta) % 1.0, s, v), 0.0, 1.0)
    # exact identity for delta == 0 (null path must be bit-clean)
    return jnp.where(jnp.broadcast_to((delta == 0.0)[..., None],
                                      out.shape) if jnp.ndim(delta) else
                     delta == 0.0, x, out)


def _blur_matrix(size: int, sigma, apply, dtype):
    """Banded [size, size] Gaussian smoothing matrix (identity when not
    applied). Rows renormalize at the borders (edge-replicate-like, closer
    to PIL than zero padding)."""
    i = jnp.arange(size, dtype=jnp.float32)
    d = i[:, None] - i[None, :]
    r = BLUR_TAPS // 2
    k = jnp.exp(-0.5 * (d / jnp.maximum(sigma, 1e-6)) ** 2)
    k = jnp.where(jnp.abs(d) <= r, k, 0.0)
    k = k / jnp.sum(k, axis=1, keepdims=True)
    ident = jnp.eye(size, dtype=jnp.float32)
    return jnp.where(apply, k, ident).astype(dtype)


def _blur_matrix_rows(rows, size: int, sigma, apply, dtype):
    """Selected rows of `_blur_matrix(size, ...)` built directly from the row
    indices (`rows`, int [R]) — bitwise identical to slicing the full matrix
    (per-row normalization only involves that row), without a strided slice.
    Used to fold 2x2 space-to-depth phase extraction (and the W-axis flip,
    via pre-flipped row indices) into the blur matmuls for free."""
    i = rows.astype(jnp.float32)
    j = jnp.arange(size, dtype=jnp.float32)
    d = i[:, None] - j[None, :]
    r = BLUR_TAPS // 2
    k = jnp.exp(-0.5 * (d / jnp.maximum(sigma, 1e-6)) ** 2)
    k = jnp.where(jnp.abs(d) <= r, k, 0.0)
    k = k / jnp.sum(k, axis=1, keepdims=True)
    ident = (d == 0).astype(jnp.float32)
    return jnp.where(apply, k, ident).astype(dtype)


def gaussian_blur(x, sigma, apply):
    """Separable Gaussian over H and W as two banded matmuls — 3-channel
    depthwise convs waste the 128-lane MXU; dense [S,S] matmuls saturate it.
    x: [L, H, W, C] float."""
    wh = _blur_matrix(x.shape[1], sigma, apply, x.dtype)
    ww = _blur_matrix(x.shape[2], sigma, apply, x.dtype)
    x = jnp.einsum("hk,lkwc->lhwc", wh, x)
    x = jnp.einsum("wk,lhkc->lhwc", ww, x)
    return x


def _color_jitter(x, key, apply, strength=(0.4, 0.4, 0.4, 0.1)):
    """Random-order brightness/contrast/saturation/hue, factors per unit.
    strength = (b, c, s, h): factors ~ U(1-v, 1+v), hue ~ U(-h, h)."""
    sb, sc, ss, sh = strength
    kb, kc, ks, kh, kperm = jax.random.split(key, 5)
    fb = jnp.where(apply,
                   jax.random.uniform(kb, (), minval=max(0.0, 1 - sb),
                                      maxval=1 + sb), 1.0)
    fc = jnp.where(apply,
                   jax.random.uniform(kc, (), minval=max(0.0, 1 - sc),
                                      maxval=1 + sc), 1.0)
    fs = jnp.where(apply,
                   jax.random.uniform(ks, (), minval=max(0.0, 1 - ss),
                                      maxval=1 + ss), 1.0)
    fh = jnp.where(apply, jax.random.uniform(kh, (), minval=-sh, maxval=sh),
                   0.0)
    order = jax.random.permutation(kperm, 4)

    def apply_op(img, op):
        return jax.lax.switch(op, [
            lambda a: adjust_brightness(a, fb),
            lambda a: adjust_contrast(a, fc),
            lambda a: adjust_saturation(a, fs),
            lambda a: adjust_hue(a, fh),
        ], img), None

    x, _ = jax.lax.scan(apply_op, x, order)
    return x


def eval_color_jitter_params(key, m, p=0.3, strength=(0.2, 0.2, 0.2, 0.1)):
    """Per-clip RandomApply(p) ColorJitter parameter draws — the ONE place
    the eval/classifier jitter streams are drawn, shared by the XLA
    positional-select chain (`eval_color_jitter`) and the fused Pallas
    kernel path (`evalsuite.steps.preprocess_train`), so backend choice
    changes numerics only by f32-vs-compute-dtype rounding. Returns [m]
    f32 factors (fb, fc, fs centered at 1; hue delta fh centered at 0)
    and [m] int32 packed per-clip op orders (`pack_orders`)."""
    sb, sc, ss, sh = strength
    kp, kb, kc, ks, kh, ko = jax.random.split(key, 6)
    do = jax.random.uniform(kp, (m,)) < p

    def factor(k, spread):
        f = jax.random.uniform(k, (m,), minval=max(0.0, 1.0 - spread),
                               maxval=1.0 + spread)
        return jnp.where(do, f, 1.0)

    fb, fc, fs = factor(kb, sb), factor(kc, sc), factor(ks, ss)
    fh = jnp.where(do, jax.random.uniform(kh, (m,), minval=-sh, maxval=sh),
                   0.0)
    codes = pack_orders(jax.vmap(
        lambda k: jax.random.permutation(k, 4))(jax.random.split(ko, m)))
    return fb, fc, fs, fh, codes


def eval_color_jitter(x, key, p=0.3, strength=(0.2, 0.2, 0.2, 0.1)):
    """Per-clip RandomApply(p) ColorJitter for eval-mode feature extraction
    (the reference extracts retrieval/probe features THROUGH a
    ColorJitter(0.2,0.2,0.2,0.1) @ p=0.3 consistent transform,
    eval/main_classifier.py:560-563). x: [m, L, S, S, C] in [0,1], any
    float dtype; factors and op order drawn per clip, shared by its frames.

    Same frame-flattened 4-stage positional-select structure as the
    pretrain path in `augment_clips` (rank-4, fuses into single VPU
    passes) — the earlier vmap(scan(switch)) formulation executed all four
    branches per scan step anyway (batched switch under vmap lowers to
    select-over-all-branches) but in f32 with scan/vmap fusion barriers,
    costing as much as the S3D forward it fed (DESIGN.md round 3)."""
    m, L = x.shape[0], x.shape[1]
    pfb, pfc, pfs, pfh, pcodes = eval_color_jitter_params(key, m, p, strength)
    fb = jnp.repeat(pfb, L).astype(x.dtype)[:, None, None, None]
    fc = jnp.repeat(pfc, L).astype(x.dtype)[:, None, None, None]
    fs = jnp.repeat(pfs, L).astype(x.dtype)[:, None, None, None]
    fh = jnp.repeat(pfh, L).astype(x.dtype)[:, None, None]
    codes = jnp.repeat(pcodes, L)

    shape = x.shape
    xf = x.reshape((m * L,) + shape[2:])
    ops = [
        lambda a: adjust_brightness(a, fb).astype(x.dtype),
        lambda a: adjust_contrast(a, fc).astype(x.dtype),
        lambda a: adjust_saturation(a, fs).astype(x.dtype),
        lambda a: adjust_hue(a, fh).astype(x.dtype),
    ]
    for pos in range(4):
        code = ((codes >> (2 * pos)) & 3)[:, None, None, None]
        cands = [op(xf) for op in ops]
        xf = jnp.where(code == 0, cands[0],
                       jnp.where(code == 1, cands[1],
                                 jnp.where(code == 2, cands[2], cands[3])))
    return xf.reshape(shape)


def pack_orders(perms):
    """[m, 4] per-clip op permutations -> [m] int32 codes (2 bits per
    position, position 0 in the low bits). [0,1,2,3] packs to 228."""
    return (perms[:, 0] | (perms[:, 1] << 2) | (perms[:, 2] << 4)
            | (perms[:, 3] << 6)).astype(jnp.int32)


FIXED_ORDER_CODE = 228  # pack_orders([[0, 1, 2, 3]]) — b->c->s->h


def draw_orders(k_order, m, order_mode: str):
    """Per-clip-unit jitter op order ([m] packed codes). 'shuffle' draws a
    random permutation per clip like the reference's get_params
    (augmentation.py:272-293 random.shuffle once per clip unit under
    consistent=False/seq_len); 'fixed' is the b->c->s->h chain."""
    if order_mode == "shuffle":
        perms = jax.vmap(lambda kk: jax.random.permutation(kk, 4))(
            jax.random.split(k_order, m))
        return pack_orders(perms)
    return jnp.full((m,), FIXED_ORDER_CODE, jnp.int32)


def augment_clips(seq_u8, aug_base, rng, strength=(0.4, 0.4, 0.4, 0.1),
                  dtype=jnp.float32, order_mode: str = "shuffle",
                  backend: str = "xla", normalize_out: bool = False,
                  emit_s2d: bool = False, frame_ctx=None):
    """seq_u8: [B, n_clips, L, S, S, 3] uint8; aug_base: [B, n_clips].
    Returns `dtype` in [0,1] ([0,1]-normalized when `normalize_out`), same
    shape — or, with `emit_s2d`, 2x2 space-to-depth packed
    [B, n, L, S/2, S/2, 12] (channel (ph*2+pw)*3 + c) for direct consumption
    by the packed-input stem (backbones/s3d.py SpaceToDepthConv): the phase
    extraction rides the blur matmuls for free (`_blur_matrix_rows`), so the
    packed path is bitwise-identical math to packing the unpacked output.

    backend='pallas' runs the elementwise chain (u8 decode, jitter, gray,
    normalize) as one fused VMEM-resident TPU kernel
    (coclr_tpu/ops/pallas_aug.py, ~4x fewer HBM passes); 'xla' is the
    portable jnp path. Identical jax.random streams, so both backends draw
    the same augmentation parameters; numerics differ only by f32-vs-dtype
    rounding (and hue branch ties on clipped pixels).

    TPU shape discipline: everything runs at rank <= 5 — elementwise jitter
    and gray on a flattened frame axis [B*n*L, S, S, 3], blur (+flip, folded
    into the same matrices for free) as batched [S,S] matmuls on
    [B*n, L, S, S, 3]. Rank-6 tensors sent the XLA TPU compiler into
    multi-minute layout searches and the 3-channel depthwise blur conv used
    3/128 of the MXU.

    Jitter factors/decisions are per clip unit (the reference's
    consistent=False seq_len semantics); gray channel per frame. Op order
    (augmentation.py:272-293 shuffles the 4 ops once per clip unit):
      'shuffle' — random per-clip order, the reference semantics (default).
                  Pallas: a per-frame lax.switch positional loop (only the
                  selected op executes). XLA: 4 positional select stages
                  (computes all 4 candidates per stage; fused, VPU-bound).
      'fixed'   — b->c->s->h always; cheapest XLA chain, a documented
                  divergence retained as an opt-in.

    `frame_ctx=(l_global, f_idx)` — temporal sequence parallelism support
    (ops/seqpar.py): the input holds only a T chunk of each clip, and the
    ONE per-frame draw here (the gray channel) must come from the GLOBAL
    frame stream so every sp member reproduces the unsharded channels for
    its chunk. l_global = full per-clip frame count, f_idx [L] = global
    frame index of each local frame (may be traced). Every other draw is
    per-clip and shape-independent, so chunked application is exact."""
    b, n, L, S1, S2, C = seq_u8.shape
    if emit_s2d:
        # odd dims would silently drop the last row/column of every frame
        assert S1 % 2 == 0 and S2 % 2 == 0, \
            f"emit_s2d requires even spatial dims, got {S1}x{S2}"
    m = b * n
    base = aug_base.reshape(m).astype(jnp.bool_)
    (k_jitp, k_b, k_c, k_s, k_h, k_order, k_gray, k_grayc, k_blur, k_sigma,
     k_flip) = jax.random.split(rng, 11)

    # ColorJitter: RandomApply p=0.8 within the base path; factors per clip
    sb, sc, ss, sh = strength
    do_jit = base & (jax.random.uniform(k_jitp, (m,)) < 0.8)

    def factor(key, spread, center):
        if center == 1.0:  # b/c/s: U(max(0, 1-v), 1+v)
            v = jax.random.uniform(key, (m,), minval=max(0.0, 1.0 - spread),
                                   maxval=1.0 + spread)
        else:  # hue: U(-v, v)
            v = jax.random.uniform(key, (m,), minval=-spread, maxval=spread)
        v = jnp.where(do_jit, v, center)
        return jnp.repeat(v, L)  # clip -> frame granularity [m*L]

    fb = factor(k_b, sb, 1.0)
    fc = factor(k_c, sc, 1.0)
    fs = factor(k_s, ss, 1.0)
    fh = factor(k_h, sh, 0.0)

    # RandomGray p=0.2: decision per clip, channel per frame
    do_gray = jnp.repeat(base & (jax.random.uniform(k_gray, (m,)) < 0.2), L)
    if frame_ctx is None:
        ch = jax.random.randint(k_grayc, (m * L,), 0, 3)
    else:
        l_global, f_idx = frame_ctx
        ch_full = jax.random.randint(k_grayc, (m * l_global,), 0, 3)
        ch = jnp.take(ch_full.reshape(m, l_global), f_idx,
                      axis=1).reshape(m * L)

    # GaussianBlur p=0.5 (sigma per clip) + HFlip p=0.5 draws
    do_blur = base & (jax.random.uniform(k_blur, (m,)) < 0.5)
    sigma = jax.random.uniform(k_sigma, (m,), minval=0.1, maxval=2.0)
    do_flip = jax.random.uniform(k_flip, (m,)) < 0.5

    # per-clip jitter op order, at frame granularity (same draw either backend)
    orders = jnp.repeat(draw_orders(k_order, m, order_mode), L)  # [m*L]

    if backend == "pallas":
        from coclr_tpu.ops.pallas_aug import fused_jitter_normalize

        gray_sel = jnp.where(do_gray, ch, -1)
        xp = jnp.transpose(seq_u8.reshape(m * L, S1, S2, C), (0, 3, 1, 2))
        x = fused_jitter_normalize(
            xp, fb, fc, fs, fh, gray_sel, orders, out_dtype=dtype,
            mean=IMAGENET_MEAN if normalize_out else (0.0, 0.0, 0.0),
            std=IMAGENET_STD if normalize_out else (1.0, 1.0, 1.0))
        # blur + flip in planar layout, then one transpose back
        x = x.reshape(m, L, C, S1, S2)
        if emit_s2d:
            # phase-split blur: rows 2j+ph of the H matrix, (flipped) rows
            # 2j+pw of the W matrix — 2+4 half/quarter-size matmuls, same
            # total FLOPs, output already space-to-depth packed
            pieces = []
            for ph in (0, 1):
                rh = jnp.arange(S1 // 2) * 2 + ph
                wh = jax.vmap(lambda s, a: _blur_matrix_rows(
                    rh, S1, s, a, dtype))(sigma, do_blur)
                t = jnp.einsum("mhk,mlckw->mlchw", wh, x)
                for pw in (0, 1):
                    rw = jnp.arange(S2 // 2) * 2 + pw
                    ww = jax.vmap(lambda s, a, f: _blur_matrix_rows(
                        jnp.where(f, S2 - 1 - rw, rw), S2, s, a, dtype))(
                            sigma, do_blur, do_flip)
                    y = jnp.einsum("mwk,mlchk->mlchw", ww, t)
                    pieces.append(jnp.transpose(y, (0, 1, 3, 4, 2)))
            x = jnp.concatenate(pieces, axis=-1)
            return x.reshape(b, n, L, S1 // 2, S2 // 2, 4 * C)
        wh = jax.vmap(lambda s, a: _blur_matrix(S1, s, a, dtype))(sigma, do_blur)
        ww = jax.vmap(lambda s, a: _blur_matrix(S2, s, a, dtype))(sigma, do_blur)
        ww = jnp.where(do_flip[:, None, None], ww[:, ::-1, :], ww)
        x = jnp.einsum("mhk,mlckw->mlchw", wh, x)
        x = jnp.einsum("mwk,mlchk->mlchw", ww, x)
        x = jnp.transpose(x.reshape(m * L, C, S1, S2), (0, 2, 3, 1))
        return x.reshape(b, n, L, S1, S2, C)

    x = seq_u8.reshape(m * L, S1, S2, C).astype(dtype)
    x = x / jnp.asarray(255.0, dtype)

    fb_ = fb.astype(dtype)[:, None, None, None]
    fc_ = fc.astype(dtype)[:, None, None, None]
    fs_ = fs.astype(dtype)[:, None, None, None]
    fh_ = fh.astype(dtype)[:, None, None]
    ops = [
        lambda a: adjust_brightness(a, fb_).astype(dtype),
        lambda a: adjust_contrast(a, fc_).astype(dtype),
        lambda a: adjust_saturation(a, fs_).astype(dtype),
        lambda a: adjust_hue(a, fh_).astype(dtype),
    ]
    if order_mode == "shuffle":
        # per-frame op codes: 4 positional stages, each selecting among the
        # 4 candidate ops (all elementwise + per-frame reductions; XLA fuses
        # each stage into one pass)
        for pos in range(4):
            code = ((orders >> (2 * pos)) & 3)[:, None, None, None]
            cands = [op(x) for op in ops]
            x = jnp.where(code == 0, cands[0],
                          jnp.where(code == 1, cands[1],
                                    jnp.where(code == 2, cands[2], cands[3])))
    else:
        for op in ops:
            x = op(x)

    sel = jax.nn.one_hot(ch, 3, dtype=x.dtype)  # [m*L, 3]
    gray = jnp.einsum("fhwc,fc->fhw", x, sel)[..., None]
    x = jnp.where(do_gray[:, None, None, None], gray, x)

    # blur + flip as two batched matmuls; the flip is a row reversal of the
    # W-axis matrix
    x = x.reshape(m, L, S1, S2, C)
    if emit_s2d:
        pieces = []
        for ph in (0, 1):
            rh = jnp.arange(S1 // 2) * 2 + ph
            wh = jax.vmap(lambda s, a: _blur_matrix_rows(
                rh, S1, s, a, x.dtype))(sigma, do_blur)
            t = jnp.einsum("mhk,mlkwc->mlhwc", wh, x)
            for pw in (0, 1):
                rw = jnp.arange(S2 // 2) * 2 + pw
                ww = jax.vmap(lambda s, a, f: _blur_matrix_rows(
                    jnp.where(f, S2 - 1 - rw, rw), S2, s, a, x.dtype))(
                        sigma, do_blur, do_flip)
                pieces.append(jnp.einsum("mwk,mlhkc->mlhwc", ww, t))
        x = jnp.concatenate(pieces, axis=-1)
        x = x.reshape(b, n, L, S1 // 2, S2 // 2, 4 * C)
        if normalize_out:
            x = normalize(x, mean=IMAGENET_MEAN * 4, std=IMAGENET_STD * 4,
                          dtype=dtype)
        return x
    wh = jax.vmap(lambda s, a: _blur_matrix(S1, s, a, x.dtype))(sigma, do_blur)
    ww = jax.vmap(lambda s, a: _blur_matrix(S2, s, a, x.dtype))(sigma, do_blur)
    ww = jnp.where(do_flip[:, None, None], ww[:, ::-1, :], ww)

    x = jnp.einsum("mhk,mlkwc->mlhwc", wh, x)
    x = jnp.einsum("mwk,mlhkc->mlhwc", ww, x)
    x = x.reshape(b, n, L, S1, S2, C)
    if normalize_out:
        x = normalize(x, dtype=dtype)
    return x


def normalize(x, mean: Tuple[float, ...] = IMAGENET_MEAN,
              std: Tuple[float, ...] = IMAGENET_STD, dtype=jnp.bfloat16):
    """(x - mean) / std over the channel axis (T.Normalize,
    utils/transforms.py:57-63), cast to compute dtype."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return ((x - mean) / std).astype(dtype)


def random_hflip_batch(x, rng):
    """Per-sample horizontal flip (eval-side T.RandomHorizontalFlip,
    utils/transforms.py:286-311). x: [B, ..., H, W, C]."""
    do = jax.random.uniform(rng, (x.shape[0],) + (1,) * (x.ndim - 1)) < 0.5
    return jnp.where(do, x[..., ::-1, :], x)


def make_pretrain_preprocess(cfg):
    """preprocess_fn(batch, rng) for the pretrain step: augment + normalize.

    Handles single-stream ('seq') and two-stream ('seq_rgb'+'seq_flow',
    params shared per clip unit by concatenating along the frame axis, the
    reference's doubled-seq_len trick: main_coclr.py:448)."""
    import os

    dtype = cfg.dtype
    order_mode = getattr(cfg, "aug_order", "shuffle")
    backend = getattr(cfg, "aug_backend", "auto")
    # COCLR_S2D_STEM=2: emit space-to-depth packed clips for the packed-input
    # stem (no on-device repack conv; see backbones/s3d.SpaceToDepthConv).
    # Only the S3D family has that stem — for other nets the knob is ignored
    # (emitting packed clips at a Cin=3 conv would die in an opaque XLA
    # shape error at trace time).
    emit_s2d = (os.environ.get("COCLR_S2D_STEM") == "2"
                and getattr(cfg, "net", "s3d") in ("s3d", "s3dg"))
    if os.environ.get("COCLR_S2D_STEM") == "2" and not emit_s2d:
        import warnings

        warnings.warn("COCLR_S2D_STEM=2 ignored: net %r has no s2d stem"
                      % getattr(cfg, "net", None))
    if backend == "auto":
        import jax as _jax

        backend = ("pallas" if _jax.default_backend() in ("tpu", "axon")
                   else "xla")

    def fn(batch, rng, sp_ctx=None):
        # sp_ctx=(t_global, t_offset): temporal sequence parallelism — the
        # batch holds a T chunk; per-clip draws are shape-independent (so
        # sp members of a data shard reproduce them from the shared key),
        # and the per-frame gray-channel draw reads the global frame
        # stream via augment_clips' frame_ctx, making chunked aug exact.
        out = dict(batch)
        if "seq" in batch:
            fctx = None
            if sp_ctx is not None:
                t_glob, off = sp_ctx
                fctx = (t_glob, off + jnp.arange(batch["seq"].shape[2]))
            out["seq"] = augment_clips(
                batch["seq"], batch["aug_base"], rng, dtype=dtype,
                order_mode=order_mode, backend=backend, normalize_out=True,
                emit_s2d=emit_s2d, frame_ctx=fctx)
        else:
            t = batch["seq_rgb"].shape[2]
            both = jnp.concatenate([batch["seq_rgb"], batch["seq_flow"]],
                                   axis=2)  # [B, 2, 2T, S, S, 3]
            fctx = None
            if sp_ctx is not None:
                # local frames [0,t) are global rgb frames off+i; local
                # [t,2t) are global flow frames t_glob+off+i of the
                # doubled-seq_len stream
                t_glob, off = sp_ctx
                idx = off + jnp.arange(t)
                fctx = (2 * t_glob, jnp.concatenate([idx, t_glob + idx]))
            both = augment_clips(both, batch["aug_base"], rng, dtype=dtype,
                                 order_mode=order_mode, backend=backend,
                                 normalize_out=True, emit_s2d=emit_s2d,
                                 frame_ctx=fctx)
            out["seq_rgb"], out["seq_flow"] = both[:, :, :t], both[:, :, t:]
        out.pop("aug_base", None)
        return out

    return fn
