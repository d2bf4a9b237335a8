"""Space-to-depth stem pipeline: packed aug emission and packed-input stem.

The 2x2 space-to-depth stem (backbones/s3d.SpaceToDepthConv) is an exact
re-expression of the reference's stride-2 RGB stem conv
(/root/reference/backbone/s3dg.py:143-147); COCLR_S2D_STEM=2 additionally has
the aug pipeline emit pre-packed clips (ops/augment.py emit_s2d) so the
on-device repack conv disappears. These tests pin both halves:

- emit_s2d output == numpy-packed unpacked output (both backends);
- SpaceToDepthConv == the plain stride-2 conv, for raw AND pre-packed input.
"""

import jax
import jax.numpy as jnp
import numpy as np

from coclr_tpu.backbones.s3d import SpaceToDepthConv
from coclr_tpu.ops import augment


def np_pack(x):
    """[..., H, W, C] -> [..., H/2, W/2, 4C], channel (ph*2+pw)*C + c."""
    *lead, h, w, c = x.shape
    y = x.reshape(*lead, h // 2, 2, w // 2, 2, c)
    y = np.moveaxis(y, (-4, -2), (-3, -2))  # [..., h/2, w/2, ph, pw, c]
    return y.reshape(*lead, h // 2, w // 2, 4 * c)


def _aug_inputs(seed=0, b=2, n=2, L=4, S=16):
    u8 = jnp.asarray(np.random.RandomState(seed).randint(
        0, 255, (b, n, L, S, S, 3), dtype=np.uint8))
    base = jnp.asarray(np.random.RandomState(seed + 1).randint(0, 2, (b, n)))
    return u8, base


def test_emit_s2d_matches_numpy_packing_xla():
    u8, base = _aug_inputs()
    for seed in range(3):
        rng = jax.random.PRNGKey(seed)
        plain = augment.augment_clips(u8, base, rng, backend="xla",
                                      normalize_out=True)
        packed = augment.augment_clips(u8, base, rng, backend="xla",
                                       normalize_out=True, emit_s2d=True)
        np.testing.assert_allclose(np.asarray(packed),
                                   np_pack(np.asarray(plain)), atol=1e-5)


def test_emit_s2d_matches_numpy_packing_pallas():
    u8, base = _aug_inputs(seed=7)
    rng = jax.random.PRNGKey(11)
    plain = augment.augment_clips(u8, base, rng, backend="pallas",
                                  normalize_out=True)
    packed = augment.augment_clips(u8, base, rng, backend="pallas",
                                   normalize_out=True, emit_s2d=True)
    np.testing.assert_allclose(np.asarray(packed),
                               np_pack(np.asarray(plain)), atol=1e-5)


def _reference_stem(x, kernel, p):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 2, 2),
        padding=[(0, 0), (p, p), (p, p)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def test_s2d_conv_exact_raw_and_packed():
    k, p = 7, 3
    x = jnp.asarray(np.random.RandomState(0).rand(2, 3, 32, 32, 3)
                    .astype(np.float32))
    mod = SpaceToDepthConv(8, k, p, dtype=jnp.float32, in_channels=3)
    params = mod.init(jax.random.PRNGKey(0), x)
    kernel = params["params"]["kernel"]

    want = _reference_stem(x, kernel, p)
    got_raw = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(got_raw), np.asarray(want),
                               atol=2e-5)

    xp = jnp.asarray(np_pack(np.asarray(x)))
    got_packed = mod.apply(params, xp)
    assert got_packed.shape == want.shape
    np.testing.assert_allclose(np.asarray(got_packed), np.asarray(want),
                               atol=2e-5)


def test_s3d_accepts_packed_input():
    """Full S3D forward parity: packed input + s2d stem == raw input + plain
    stem, same canonical parameters (checkpoint compatibility)."""
    from coclr_tpu.backbones.s3d import S3D

    x = jnp.asarray(np.random.RandomState(1).rand(1, 8, 64, 64, 3)
                    .astype(np.float32))
    plain = S3D(dtype=jnp.float32)
    s2d = S3D(dtype=jnp.float32, s2d_stem=True)
    params = plain.init(jax.random.PRNGKey(0), x, train=False)
    want = plain.apply(params, x, train=False)
    xp = jnp.asarray(np_pack(np.asarray(x)))
    got = s2d.apply(params, xp, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-4)
