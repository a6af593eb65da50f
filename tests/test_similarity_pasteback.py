"""Similarity-decomposed paste-back vs the direct-gather reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from ghost_tpu.ops.warp import warp_and_blend, warp_and_blend_similarity


def similarity_m(s, theta, tx, ty):
    c, si = s * np.cos(theta), s * np.sin(theta)
    return np.array([[c, -si, tx], [si, c, ty]], dtype=np.float32)


def smooth_image(h, w, c=3):
    ys, xs = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                         indexing="ij")
    base = np.stack([ys, xs, 0.5 * (ys + xs)], axis=-1)[..., :c]
    return (base * 255).astype(np.float32)


@pytest.mark.parametrize("theta", [0.0, 0.15, -0.3])
def test_similarity_pasteback_matches_reference(theta):
    b, h, w, cs = 2, 128, 160, 64
    frame = np.stack([smooth_image(h, w) for _ in range(b)])
    swap = np.stack([smooth_image(cs, cs) * 0.5 for _ in range(b)])
    # smooth radial mask
    yy, xx = np.meshgrid(np.arange(cs), np.arange(cs), indexing="ij")
    r = np.sqrt((yy - cs / 2) ** 2 + (xx - cs / 2) ** 2)
    mask = np.clip(1.5 - r / (cs / 3), 0, 1).astype(np.float32)[None, :, :, None]
    mask = np.tile(mask, (b, 1, 1, 1))
    m = np.stack([similarity_m(0.5, theta, -20.0, -10.0)] * b)

    ref = np.asarray(warp_and_blend(jnp.asarray(frame), jnp.asarray(swap),
                                    jnp.asarray(mask), jnp.asarray(m)))
    fast = np.asarray(warp_and_blend_similarity(
        jnp.asarray(frame), jnp.asarray(swap), jnp.asarray(mask),
        jnp.asarray(m), grid=128))
    # one extra bilinear resample of smooth content: small low-pass error
    err = np.abs(ref - fast)
    assert err.mean() < 0.5, err.mean()
    assert np.quantile(err, 0.99) < 3.0


def test_similarity_pasteback_identity_and_present():
    b, h, w, cs = 2, 64, 64, 32
    # integer-valued frames: the blend runs bf16 end-to-end, which is
    # exact for uint8-scale integers (production frames ARE uint8) but
    # quantizes fractional f32 test values by up to 0.5
    frame = np.round(np.stack([smooth_image(h, w) for _ in range(b)]))
    swap = np.full((b, cs, cs, 3), 200.0, np.float32)
    mask = np.ones((b, cs, cs, 1), np.float32)
    m = np.stack([similarity_m(1.0, 0.0, 0.0, 0.0)] * b)
    present = jnp.asarray([True, False])
    out = np.asarray(warp_and_blend_similarity(
        jnp.asarray(frame), jnp.asarray(swap), jnp.asarray(mask),
        jnp.asarray(m), present=present, grid=64))
    # inside the crop footprint the swap replaces the frame
    np.testing.assert_allclose(out[0, 5:25, 5:25], 200.0, atol=1.0)
    # outside: original
    np.testing.assert_allclose(out[0, 40:, 40:], frame[0, 40:, 40:], atol=1.0)
    # absent face: untouched
    np.testing.assert_allclose(out[1], frame[1], atol=1e-3)


@pytest.mark.parametrize("theta", [0.15, -0.3])
def test_nearest_rot_subpix_close(theta):
    """Production blend path: single-tap nearest rotation resample from
    a 2x einsum-upsampled [swap|mask] — must stay within a gray level
    of the direct-gather reference on smooth content."""
    b, h, w, cs = 1, 128, 160, 64
    frame = np.stack([smooth_image(h, w) for _ in range(b)])
    swap = np.stack([smooth_image(cs, cs) * 0.5 for _ in range(b)])
    yy, xx = np.meshgrid(np.arange(cs), np.arange(cs), indexing="ij")
    r = np.sqrt((yy - cs / 2) ** 2 + (xx - cs / 2) ** 2)
    mask = np.clip(1.5 - r / (cs / 3), 0, 1).astype(np.float32)[None, :, :, None]
    m = np.stack([similarity_m(0.5, theta, -20.0, -10.0)] * b)
    ref = np.asarray(warp_and_blend(jnp.asarray(frame), jnp.asarray(swap),
                                    jnp.asarray(mask), jnp.asarray(m)))
    fast = np.asarray(warp_and_blend_similarity(
        jnp.asarray(frame), jnp.asarray(swap), jnp.asarray(mask),
        jnp.asarray(m), grid=128, rot_subpix=2))
    err = np.abs(ref - fast)
    assert err.mean() < 0.8, err.mean()
    assert np.quantile(err, 0.99) < 5.0
