"""On-device augmentation: numerics vs PIL/torch conventions + policy flags."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coclr_tpu.ops import augment


def rand_img(shape=(2, 8, 8, 3), seed=0):
    return jnp.asarray(np.random.RandomState(seed).rand(*shape).astype(np.float32))


def test_brightness_contrast_saturation():
    x = rand_img()
    np.testing.assert_allclose(np.asarray(augment.adjust_brightness(x, 1.0)),
                               np.asarray(x))
    np.testing.assert_allclose(np.asarray(augment.adjust_saturation(x, 1.0)),
                               np.asarray(x))
    np.testing.assert_allclose(np.asarray(augment.adjust_contrast(x, 1.0)),
                               np.asarray(x), atol=1e-6)
    # brightness 0 -> black; saturation 0 -> grayscale
    assert float(jnp.max(augment.adjust_brightness(x, 0.0))) == 0.0
    g = augment.adjust_saturation(x, 0.0)
    np.testing.assert_allclose(np.asarray(g[..., 0]), np.asarray(g[..., 1]),
                               atol=1e-6)


def test_hsv_roundtrip():
    x = rand_img(seed=3)
    h, s, v = augment.rgb_to_hsv(x)
    back = augment.hsv_to_rgb(h, s, v)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)
    # hue shift by 0 is identity
    same = augment.adjust_hue(x, 0.0)
    np.testing.assert_allclose(np.asarray(same), np.asarray(x), atol=1e-5)


def test_gaussian_blur():
    x = rand_img(shape=(1, 16, 16, 3), seed=1)
    # identity when not applied
    y = augment.gaussian_blur(x, 1.5, jnp.bool_(False))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)
    # applied: mean preserved (interior), variance reduced
    y = augment.gaussian_blur(x, 1.5, jnp.bool_(True))
    assert float(jnp.var(y)) < float(jnp.var(x))
    np.testing.assert_allclose(float(jnp.mean(y[:, 6:10, 6:10])),
                               float(jnp.mean(x)), atol=0.15)


def test_null_clip_only_flips():
    """aug_base=0 must leave the clip untouched up to a horizontal flip."""
    u8 = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (1, 1, 4, 8, 8, 3),
                                         dtype=np.uint8))
    for seed in range(6):
        out = augment.augment_clips(u8, jnp.zeros((1, 1)), jax.random.PRNGKey(seed))
        ref = np.asarray(u8[0, 0]).astype(np.float32) / 255.0
        got = np.asarray(out[0, 0])
        ok = (np.allclose(got, ref, atol=1e-6)
              or np.allclose(got, ref[:, :, ::-1, :], atol=1e-6))
        assert ok


def test_base_clip_changes_pixels():
    u8 = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (1, 1, 4, 8, 8, 3),
                                         dtype=np.uint8))
    changed = 0
    for seed in range(8):
        out = augment.augment_clips(u8, jnp.ones((1, 1)), jax.random.PRNGKey(seed))
        ref = np.asarray(u8[0, 0]).astype(np.float32) / 255.0
        got = np.asarray(out[0, 0])
        if not (np.allclose(got, ref, atol=1e-3)
                or np.allclose(got, ref[:, :, ::-1, :], atol=1e-3)):
            changed += 1
    assert changed >= 6  # jitter/gray/blur fire nearly always across 8 seeds


def test_normalize_roundtrip():
    x = rand_img(shape=(2, 4, 4, 3))
    y = augment.normalize(x, dtype=jnp.float32)
    mean = np.asarray(augment.IMAGENET_MEAN)
    std = np.asarray(augment.IMAGENET_STD)
    np.testing.assert_allclose(np.asarray(y), (np.asarray(x) - mean) / std,
                               rtol=1e-5)


def test_torchvision_parity_color_ops():
    """Compare against torchvision-free torch formulas (blend semantics)."""
    torch = pytest.importorskip("torch")
    x = rand_img(shape=(1, 8, 8, 3), seed=7)
    xt = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)  # [1,3,H,W]

    # saturation blend: img*f + gray*(1-f)
    f = 1.3
    luma = (0.299 * xt[:, 0] + 0.587 * xt[:, 1] + 0.114 * xt[:, 2])[:, None]
    ref = torch.clamp(xt * f + luma * (1 - f), 0, 1).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(augment.adjust_saturation(x, f)),
                               ref, atol=1e-5)

    f = 0.7
    mean = luma.mean()
    ref = torch.clamp(xt * f + mean * (1 - f), 0, 1).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(augment.adjust_contrast(x, f)),
                               ref, atol=1e-5)


def test_two_stream_shared_params():
    """rgb and flow of the same clip must get identical aug params: feed
    identical pixels, expect identical outputs."""
    from coclr_tpu.config import PretrainConfig

    cfg = PretrainConfig(compute_dtype="float32")
    pre = augment.make_pretrain_preprocess(cfg)
    u8 = np.random.RandomState(0).randint(0, 255, (2, 2, 4, 8, 8, 3),
                                          dtype=np.uint8)
    batch = {"seq_rgb": jnp.asarray(u8), "seq_flow": jnp.asarray(u8),
             "aug_base": jnp.ones((2, 2))}
    for seed in range(4):
        out = pre(batch, jax.random.PRNGKey(seed))
        a, b = np.asarray(out["seq_rgb"]), np.asarray(out["seq_flow"])
        if np.allclose(a, b, atol=1e-5):
            continue
        # the only per-frame draw is the RandomGray channel choice
        # (augmentation.py:211-216): frames that differ must be grayscale
        mean = np.asarray(augment.IMAGENET_MEAN)
        std = np.asarray(augment.IMAGENET_STD)
        diff_frames = ~np.isclose(a, b, atol=1e-5)
        diff_frames = diff_frames.reshape(a.shape[:3] + (-1,)).any(-1)
        for arr in (a, b):
            arr = arr * std + mean  # denormalize
            sel = arr[diff_frames]  # [n_diff_frames, H, W, C]
            np.testing.assert_allclose(sel[..., 0], sel[..., 1], atol=1e-4)
            np.testing.assert_allclose(sel[..., 0], sel[..., 2], atol=1e-4)


def test_draw_orders_per_clip():
    """'shuffle' draws an independent valid permutation per clip unit
    (the reference shuffles the 4 jitter ops once per clip,
    augmentation.py:272-293); 'fixed' is the b->c->s->h code."""
    codes = np.asarray(augment.draw_orders(jax.random.PRNGKey(0), 1000,
                                           "shuffle"))
    decoded = np.stack([(codes >> (2 * p)) & 3 for p in range(4)], axis=1)
    for row in decoded:
        assert sorted(row.tolist()) == [0, 1, 2, 3]
    # all 24 permutations show up across 1000 draws
    assert len(np.unique(codes)) == 24
    fixed = np.asarray(augment.draw_orders(jax.random.PRNGKey(0), 3, "fixed"))
    np.testing.assert_array_equal(fixed, augment.FIXED_ORDER_CODE)
    np.testing.assert_array_equal(
        np.asarray(augment.pack_orders(jnp.asarray([[0, 1, 2, 3]]))),
        [augment.FIXED_ORDER_CODE])


def test_kernel_order_matches_sequential_application():
    """fused_jitter_normalize with explicit per-frame orders must equal
    applying adjust_* sequentially in that order (f32, hue last vs first
    etc. genuinely change the output)."""
    from coclr_tpu.ops.pallas_aug import fused_jitter_normalize

    rng = np.random.RandomState(9)
    F, S = 4, 16
    x = rng.randint(0, 256, (F, S, S, 3), np.uint8)
    fb = np.float32([1.3, 0.8, 1.0, 1.2])
    fc = np.float32([0.7, 1.2, 1.0, 0.9])
    fs = np.float32([1.4, 0.6, 1.0, 1.1])
    fh = np.float32([0.05, -0.08, 0.0, 0.1])
    perms = np.asarray([[3, 2, 1, 0], [1, 0, 3, 2], [0, 1, 2, 3],
                        [2, 3, 0, 1]], np.int32)
    orders = augment.pack_orders(jnp.asarray(perms))

    xp = jnp.asarray(np.transpose(x, (0, 3, 1, 2)))
    got = np.asarray(fused_jitter_normalize(
        xp, jnp.asarray(fb), jnp.asarray(fc), jnp.asarray(fs),
        jnp.asarray(fh), -jnp.ones((F,), jnp.int32), orders,
        out_dtype=jnp.float32, mean=(0, 0, 0), std=(1, 1, 1)))
    got = np.transpose(got, (0, 2, 3, 1))

    ops = [augment.adjust_brightness, augment.adjust_contrast,
           augment.adjust_saturation, augment.adjust_hue]
    factors = [fb, fc, fs, fh]
    for f in range(F):
        ref = jnp.asarray(x[f:f + 1].astype(np.float32) / 255.0)
        for op_idx in perms[f]:
            ref = ops[op_idx](ref, jnp.float32(factors[op_idx][f]))
        np.testing.assert_allclose(got[f], np.asarray(ref)[0], atol=2e-5,
                                   err_msg=f"frame {f} order {perms[f]}")

    # order genuinely matters for these factors: frame 0 (reversed order)
    # must differ from the fixed-order application
    ref_fixed = jnp.asarray(x[0:1].astype(np.float32) / 255.0)
    for op_idx in range(4):
        ref_fixed = ops[op_idx](ref_fixed, jnp.float32(factors[op_idx][0]))
    assert np.abs(got[0] - np.asarray(ref_fixed)[0]).max() > 1e-3


def test_pallas_backend_matches_xla():
    """The fused pallas kernel (interpret mode on CPU) must agree with the
    jnp chain: same rng -> same parameters; numerics may differ only by
    reduction-order ULPs, which can flip HSV branch ties on clipped pixels
    (sub-percent of pixels)."""
    import jax
    import jax.numpy as jnp
    from coclr_tpu.ops.augment import augment_clips

    rng = np.random.RandomState(3)
    seq = jnp.asarray(rng.randint(0, 256, (3, 2, 4, 128, 128, 3), np.uint8))
    base = jnp.asarray([[1, 1], [1, 0], [0, 1]], np.uint8)
    key = jax.random.PRNGKey(11)
    # hue disabled -> the whole chain is branch-free and must match to
    # float tolerance everywhere
    strict = dict(dtype=jnp.float32, normalize_out=True,
                  strength=(0.4, 0.4, 0.4, 0.0))
    a = np.asarray(augment_clips(seq, base, key, backend="xla", **strict))
    b = np.asarray(augment_clips(seq, base, key, backend="pallas", **strict))
    assert np.abs(a - b).max() < 1e-4, np.abs(a - b).max()

    # full strength: contrast/saturation clipping creates exact-tie channel
    # maxima whose HSV branch flips on reduction-order ULPs (~1% of pixels),
    # and the 13-tap blur smears each flipped pixel over its neighborhood —
    # so compare statistically
    a = np.asarray(augment_clips(seq, base, key, dtype=jnp.float32,
                                 backend="xla", normalize_out=True))
    b = np.asarray(augment_clips(seq, base, key, dtype=jnp.float32,
                                 backend="pallas", normalize_out=True))
    d = np.abs(a - b)
    assert np.median(d) < 1e-4, np.median(d)
    assert d.mean() < 3e-3, d.mean()
    assert d.max() < 3.0, d.max()


def test_pallas_backend_null_path_exact():
    """Null clips (aug_base=0) take flip-only: both backends must agree to
    float tolerance everywhere (no branchy hue, no clipping)."""
    import jax
    import jax.numpy as jnp
    from coclr_tpu.ops.augment import augment_clips

    rng = np.random.RandomState(4)
    seq = jnp.asarray(rng.randint(0, 256, (2, 2, 4, 64, 64, 3), np.uint8))
    base = jnp.zeros((2, 2), jnp.uint8)
    key = jax.random.PRNGKey(5)
    a = np.asarray(augment_clips(seq, base, key, dtype=jnp.float32,
                                 backend="xla", normalize_out=True))
    b = np.asarray(augment_clips(seq, base, key, dtype=jnp.float32,
                                 backend="pallas", normalize_out=True))
    assert np.abs(a - b).max() < 1e-4, np.abs(a - b).max()


def test_eval_color_jitter_semantics():
    """eval_color_jitter (retrieval/probe feature-extraction front-end):
    p=0 and zero strength are identity; applied clips share one set of
    factors across frames; equals a sequential per-clip reference
    evaluated in the drawn op order."""
    x = rand_img((3, 4, 8, 8, 3), seed=1)
    key = jax.random.PRNGKey(7)

    # zero strength: every op degenerates to identity regardless of p/order
    y = augment.eval_color_jitter(x, key, p=1.0, strength=(0, 0, 0, 0))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=2e-6)

    # p -> 0: apply mask all-false -> factors pinned to identity
    y = augment.eval_color_jitter(x, key, p=0.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=2e-6)

    # reproduce the exact draw stream and check against a sequential
    # application in the drawn per-clip order
    m, L = x.shape[0], x.shape[1]
    kp, kb, kc, ks, kh, ko = jax.random.split(key, 6)
    do = jax.random.uniform(kp, (m,)) < 1.0

    def factor(k, spread):
        f = jax.random.uniform(k, (m,), minval=max(0.0, 1.0 - spread),
                               maxval=1.0 + spread)
        return jnp.where(do, f, 1.0)

    fb, fc, fs = factor(kb, 0.4), factor(kc, 0.4), factor(ks, 0.4)
    fh = jnp.where(do, jax.random.uniform(kh, (m,), minval=-0.1, maxval=0.1),
                   0.0)
    perms = jax.vmap(lambda k: jax.random.permutation(k, 4))(
        jax.random.split(ko, m))
    y = augment.eval_color_jitter(x, key, p=1.0, strength=(0.4, 0.4, 0.4, 0.1))
    for ci in range(m):
        ref = x[ci]
        for op in np.asarray(perms[ci]):
            if op == 0:
                ref = augment.adjust_brightness(ref, fb[ci])
            elif op == 1:
                ref = augment.adjust_contrast(ref, fc[ci])
            elif op == 2:
                ref = augment.adjust_saturation(ref, fs[ci])
            else:
                ref = augment.adjust_hue(ref, fh[ci][None, None])
        np.testing.assert_allclose(np.asarray(y[ci]), np.asarray(ref),
                                   atol=1e-5)
