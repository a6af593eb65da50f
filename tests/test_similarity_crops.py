"""warp_affine_similarity vs the cv2-parity gather warp.

The similarity-decomposed crop extractor (ops/warp.py) must agree with
warp_affine (itself torch/cv2-parity tested) on the similarity matrices
the pipeline actually produces (estimate_norm outputs). Pure
scale+translate matrices hit grid points exactly; rotations add one
sub-pixel resample which must stay within a fraction of a gray level on
smooth content. Mirrors the methodology of test_similarity_pasteback.py
for the blend direction.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ghost_tpu.ops.umeyama import estimate_norm
from ghost_tpu.ops.warp import warp_affine, warp_affine_similarity


def _smooth_image(rng, h, w, c=3):
    """Low-frequency random image in [0, 255] (bilinear upsample of
    coarse noise) so sub-pixel resample differences stay tiny."""
    coarse = rng.uniform(0, 255, (1, h // 16, w // 16, c)).astype(np.float32)
    from ghost_tpu.nn.layers import resize

    return np.asarray(resize(jnp.asarray(coarse), (h, w), method="bilinear"))[0]


def _scale_matrix(s, tx, ty):
    return np.array([[s, 0.0, tx], [0.0, s, ty]], np.float32)


def _rot_matrix(s, theta, tx, ty):
    c, sn = s * np.cos(theta), s * np.sin(theta)
    return np.array([[c, -sn, tx], [sn, c, ty]], np.float32)


class TestWarpAffineSimilarity:
    def test_pure_scale_exact_f32(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 255, (2, 128, 160, 3)).astype(np.float32))
        m = np.stack([_scale_matrix(0.7, -20.0, 5.0),
                      _scale_matrix(1.3, 10.0, -8.0)])
        ref = warp_affine(img, jnp.asarray(m), (64, 64))
        got = warp_affine_similarity(img, jnp.asarray(m)[:, None], 64,
                                     compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-2, rtol=0)

    def test_rotation_close_on_smooth(self):
        """In-frame rotated crop: the q-grid quantization error shrinks
        ~quadratically with subpix (measured on this content: max 8.7 at
        subpix=1 -> 4.0 at subpix=2)."""
        rng = np.random.default_rng(1)
        img = jnp.asarray(_smooth_image(rng, 256, 320))[None]
        # translation chosen so the whole 96-crop maps inside the frame
        m = _rot_matrix(0.6, 0.35, -15.8, -57.1)
        ref = warp_affine(img, jnp.asarray(m)[None], (96, 96))
        d1 = np.abs(np.asarray(warp_affine_similarity(
            img, jnp.asarray(m)[None, None], 96,
            compute_dtype=jnp.float32)) - np.asarray(ref))
        d2 = np.abs(np.asarray(warp_affine_similarity(
            img, jnp.asarray(m)[None, None], 96,
            compute_dtype=jnp.float32, subpix=2)) - np.asarray(ref))
        assert d1.mean() < 0.5
        assert d2.max() < 0.6 * d1.max() + 1e-3
        assert d2.mean() < 0.15

    def test_estimate_norm_matrices_bf16(self):
        """The production stage-B path: bf16 compute, subpix=2, on
        estimate_norm output (in-frame face)."""
        rng = np.random.default_rng(2)
        img = jnp.asarray(_smooth_image(rng, 270, 480))[None]
        base = np.array([[200.0, 100.0], [260.0, 98.0], [232.0, 140.0],
                         [208.0, 170.0], [255.0, 172.0]], np.float32)
        kps = base[None] + rng.normal(0, 2.0, (1, 5, 2)).astype(np.float32)
        m = estimate_norm(jnp.asarray(kps), 112)
        ref = warp_affine(img, m, (112, 112))
        got = warp_affine_similarity(img, m[:, None], 112, subpix=2)
        diff = np.abs(np.asarray(got) - np.asarray(ref))
        assert diff.max() < 6.0  # measured 4.0 on this content
        assert np.mean(diff) < 0.5

    def test_multi_face_layout_matches_repeat(self):
        """(B,T) matrices produce the b-major, t-minor order of
        jnp.repeat(frames, T) + flat matrices."""
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.uniform(0, 255, (2, 96, 96, 3)).astype(np.float32))
        m = np.stack([
            [_scale_matrix(0.5, 1.0, 2.0), _scale_matrix(0.8, -3.0, 4.0)],
            [_scale_matrix(1.1, 5.0, -2.0), _scale_matrix(0.9, 0.0, 0.0)],
        ]).astype(np.float32)  # (B=2, T=2, 2, 3)
        got = warp_affine_similarity(img, jnp.asarray(m), 48,
                                     compute_dtype=jnp.float32)
        rep = jnp.repeat(img, 2, axis=0)
        ref = warp_affine(rep, jnp.asarray(m.reshape(4, 2, 3)), (48, 48))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-2, rtol=0)

    def test_uint8_frames_accepted(self):
        rng = np.random.default_rng(4)
        img = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3), dtype=np.uint8))
        m = jnp.asarray(_scale_matrix(1.0, 0.0, 0.0))[None, None]
        out = warp_affine_similarity(img, m, 32, compute_dtype=jnp.float32)
        ref = warp_affine(img.astype(jnp.float32), m[:, 0], (32, 32))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-2)

    def test_degenerate_matrix_yields_zeros(self):
        """Masked face lanes produce ~zero matrices; the crop must come
        back finite (all zeros), not NaN."""
        img = jnp.ones((1, 64, 64, 3), jnp.float32) * 100.0
        m = jnp.zeros((1, 1, 2, 3), jnp.float32)
        out = warp_affine_similarity(img, m, 32, compute_dtype=jnp.float32)
        assert np.isfinite(np.asarray(out)).all()


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
