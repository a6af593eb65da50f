"""Geometry op parity vs cv2 (the reference's host-side implementations)."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from ghost_tpu.ops.mask import face_mask_batch, soft_face_mask
from ghost_tpu.ops.umeyama import (
    ARCFACE_TEMPLATE,
    estimate_norm,
    transform_points,
    umeyama_similarity,
)
from ghost_tpu.ops.warp import invert_affine, warp_affine, warp_and_blend


def random_similarity(rng, scale_range=(0.5, 2.0)):
    s = rng.uniform(*scale_range)
    th = rng.uniform(-np.pi, np.pi)
    tx, ty = rng.uniform(-20, 20, 2)
    return np.array(
        [
            [s * np.cos(th), -s * np.sin(th), tx],
            [s * np.sin(th), s * np.cos(th), ty],
        ],
        dtype=np.float32,
    )


def test_umeyama_exact_recovery(rng):
    src = rng.uniform(0, 100, (5, 2)).astype(np.float32)
    m_true = random_similarity(rng)
    dst = src @ m_true[:, :2].T + m_true[:, 2]
    m_est = np.asarray(umeyama_similarity(src, dst))
    np.testing.assert_allclose(m_est, m_true, rtol=1e-4, atol=1e-4)


def test_umeyama_batched(rng):
    src = rng.uniform(0, 100, (7, 5, 2)).astype(np.float32)
    ms = [random_similarity(rng) for _ in range(7)]
    dst = np.stack([s @ m[:, :2].T + m[:, 2] for s, m in zip(src, ms)])
    est = np.asarray(umeyama_similarity(src, dst))
    np.testing.assert_allclose(est, np.stack(ms), rtol=1e-3, atol=1e-3)


def test_umeyama_vs_cv2_lstsq(rng):
    """cv2.estimateAffinePartial2D(LMEDS) solves the same least-squares
    similarity fit on noisy data."""
    src = rng.uniform(0, 200, (5, 2)).astype(np.float32)
    m_true = random_similarity(rng)
    dst = (src @ m_true[:, :2].T + m_true[:, 2]).astype(np.float32)
    dst += rng.normal(0, 0.5, dst.shape).astype(np.float32)
    m_cv, _ = cv2.estimateAffinePartial2D(src, dst, method=cv2.LMEDS)
    m_est = np.asarray(umeyama_similarity(src, dst))
    np.testing.assert_allclose(m_est, m_cv, rtol=5e-2, atol=5e-1)


def test_estimate_norm_maps_template_to_itself():
    """Keypoints already at the template should give ~identity."""
    kps = ARCFACE_TEMPLATE * (224.0 / 112.0)
    m = np.asarray(estimate_norm(kps, 224))
    np.testing.assert_allclose(m, np.array([[1, 0, 0], [0, 1, 0]]), atol=1e-3)


def test_estimate_norm_projects_kps_onto_template(rng):
    m_true = random_similarity(rng, scale_range=(0.8, 1.2))
    tpl = ARCFACE_TEMPLATE * 2.0  # 224 sizing
    inv = cv2.invertAffineTransform(m_true)
    kps = tpl @ inv[:, :2].T + inv[:, 2]
    m = estimate_norm(kps.astype(np.float32), 224)
    proj = np.asarray(transform_points(jnp.asarray(kps, jnp.float32), m))
    np.testing.assert_allclose(proj, tpl, atol=0.2)


def test_invert_affine_vs_cv2(rng):
    m = random_similarity(rng)
    ours = np.asarray(invert_affine(jnp.asarray(m)))
    ref = cv2.invertAffineTransform(m)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("border", ["constant", "replicate"])
def test_warp_affine_vs_cv2(rng, border):
    img = rng.uniform(0, 255, (64, 80, 3)).astype(np.float32)
    m = random_similarity(rng, scale_range=(0.6, 1.5))
    mode = cv2.BORDER_CONSTANT if border == "constant" else cv2.BORDER_REPLICATE
    ref = cv2.warpAffine(img, m, (48, 40), flags=cv2.INTER_LINEAR, borderMode=mode)
    ours = np.asarray(warp_affine(jnp.asarray(img), m, (40, 48), border=border))
    # cv2 uses 5-bit fixed-point interpolation weights -> ~2/32 quantization
    mism = np.abs(ours - ref)
    assert np.quantile(mism, 0.99) < 4.0
    assert np.mean(mism) < 1.0


def test_warp_and_blend_matches_two_pass(rng):
    frame = rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32)
    swap = rng.uniform(0, 255, (1, 24, 24, 3)).astype(np.float32)
    mask = rng.uniform(0, 1, (1, 24, 24, 1)).astype(np.float32)
    m = np.array([[0.5, 0.0, -8.0], [0.0, 0.5, -4.0]], dtype=np.float32)[None]

    fused = np.asarray(warp_and_blend(frame, swap, mask, m))

    # two-pass reference: warp swap & mask to frame space with M^-1, blend
    m_inv = np.asarray(invert_affine(jnp.asarray(m[0])))
    swap_t = np.asarray(warp_affine(jnp.asarray(swap[0]), m_inv, (64, 64)))
    mask_t = np.asarray(warp_affine(jnp.asarray(mask[0]), m_inv, (64, 64)))
    ref = mask_t * swap_t + (1 - mask_t) * frame[0]
    np.testing.assert_allclose(fused[0], ref, rtol=1e-3, atol=1e-2)


def test_warp_and_blend_respects_present_mask(rng):
    frame = rng.uniform(0, 255, (2, 32, 32, 3)).astype(np.float32)
    swap = rng.uniform(0, 255, (2, 16, 16, 3)).astype(np.float32)
    mask = np.ones((2, 16, 16, 1), np.float32)
    m = np.tile(np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32), (2, 1, 1))
    present = jnp.asarray([True, False])
    out = np.asarray(warp_and_blend(frame, swap, mask, m, present=present))
    assert not np.allclose(out[0], frame[0])
    np.testing.assert_allclose(out[1], frame[1])


def test_soft_face_mask_sanity():
    """Circle of landmarks -> high mask inside, zero at borders, smooth."""
    th = np.linspace(0, 2 * np.pi, 106, endpoint=False)
    lm = np.stack([112 + 60 * np.cos(th), 112 + 60 * np.sin(th)], axis=1)
    mask = np.asarray(soft_face_mask(jnp.asarray(lm, jnp.float32), 224,
                                     erode=5.0, sigma_x=5.0, sigma_y=5.0,
                                     eyebrow_mod=0.0))
    assert mask.shape == (224, 224)
    assert mask[112, 112] > 0.95
    assert mask[0, :].max() == 0.0 and mask[:, 0].max() == 0.0
    assert mask[112, 40] < 0.05  # outside the circle
    # smooth transition: gradient bounded by blur
    assert np.max(np.abs(np.diff(mask[112]))) < 0.2


def test_face_mask_batch_shape():
    th = np.linspace(0, 2 * np.pi, 106, endpoint=False)
    lm = np.stack([112 + 50 * np.cos(th), 112 + 50 * np.sin(th)], axis=1)
    out = np.asarray(face_mask_batch(np.tile(lm[None], (3, 1, 1)), 224))
    assert out.shape == (3, 224, 224, 1)
    assert out.max() <= 1.0 and out.min() >= 0.0
