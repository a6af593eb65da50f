"""Umeyama similarity alignment (insightface `estimate_norm` parity).

The reference aligns faces by fitting a similarity transform from the
detector's 5 keypoints to the ArcFace template via
insightface.utils.face_align.estimate_norm (called with mode='None',
reference utils/inference/video_processing.py:133 and
image_processing.py:18). With mode='None' insightface tries five
canonical pose templates and keeps the transform with the smallest
residual; the templates are the public arcface src points defined for a
112x112 canvas, scaled to the requested crop size.

This module implements the closed-form Umeyama solve in pure JAX,
vectorized over a batch of keypoint sets, so alignment runs on-device
inside the swap megastep instead of per-face on the host (the
reference's per-frame cv2 hot loop, SURVEY.md §3.1 HOT LOOP #1).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# The canonical 5-point templates for a 112x112 crop, x then y, as
# published by insightface (deepinsight/insightface face_align.py, MIT):
# five head poses (left profile ... right profile); mode='None' selects
# the best-fitting one. Template index 2 is the frontal "arcface" set.
_SRC_112 = np.array(
    [
        [  # left profile
            [51.642, 50.115], [57.617, 49.990], [35.740, 69.007],
            [51.157, 89.050], [57.025, 89.702],
        ],
        [  # left
            [45.031, 50.118], [65.568, 50.872], [39.677, 68.111],
            [45.177, 86.190], [64.246, 86.758],
        ],
        [  # frontal (arcface_dst)
            [39.730, 51.138], [72.270, 51.138], [56.000, 68.493],
            [42.463, 87.010], [69.537, 87.010],
        ],
        [  # right
            [46.845, 50.872], [67.382, 50.118], [72.737, 68.111],
            [48.167, 86.758], [67.236, 86.190],
        ],
        [  # right profile
            [54.796, 49.990], [60.771, 50.115], [76.673, 69.007],
            [55.388, 89.702], [61.257, 89.050],
        ],
    ],
    dtype=np.float32,
)

ARCFACE_TEMPLATE = _SRC_112[2]


def umeyama_similarity(src, dst):
    """Least-squares similarity transform src -> dst.

    src, dst: (..., N, 2). Returns (..., 2, 3) affine matrices.

    Closed form for the proper-rotation case (the complex least-squares
    / cv2.estimateAffinePartial2D solution): with centered point sets,
    a = sum(sc.dc)/sum|sc|^2, b = sum(sc x dc)/sum|sc|^2 give
    M = [[a,-b],[b,a]]. This equals the Umeyama SVD solution whenever no
    reflection is optimal — always true for face keypoints matched to
    same-orientation templates — and avoids jnp.linalg.svd, which lowers
    to an iterative eigensolver that measured ~1000x slower on TPU.
    """
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.asarray(dst, jnp.float32)

    mu_s = jnp.mean(src, axis=-2, keepdims=True)
    mu_d = jnp.mean(dst, axis=-2, keepdims=True)
    sc = src - mu_s
    dc = dst - mu_d

    den = jnp.maximum(jnp.sum(sc * sc, axis=(-2, -1)), 1e-12)  # (...,)
    dot = jnp.sum(sc * dc, axis=(-2, -1))  # sx*dx + sy*dy
    cross = jnp.sum(sc[..., 0] * dc[..., 1] - sc[..., 1] * dc[..., 0],
                    axis=-1)
    a = dot / den
    b = cross / den
    row0 = jnp.stack([a, -b], axis=-1)
    row1 = jnp.stack([b, a], axis=-1)
    r = jnp.stack([row0, row1], axis=-2)  # (...,2,2) scale*rotation
    t = mu_d[..., 0, :] - jnp.einsum("...ij,...j->...i", r, mu_s[..., 0, :])
    return jnp.concatenate([r, t[..., :, None]], axis=-1)  # (...,2,3)


def estimate_norm(kps, crop_size: int = 224, mode: str = "None"):
    """insightface estimate_norm parity, batched.

    kps: (..., 5, 2) detector keypoints.
    Returns (..., 2, 3) matrices mapping image -> crop_size x crop_size.

    mode='arcface': frontal template only (requires the 112-multiple
    scaling insightface applies). mode='None': best of the 5 pose
    templates by keypoint residual, matching the reference call sites.
    """
    kps = jnp.asarray(kps, jnp.float32)
    # insightface scales templates as src * (crop/112) with an x-shift of
    # 8*(crop/112) applied only for the 128-ish 'arcface' sizing; for the
    # mode='None' path used by the reference, plain uniform scaling.
    templates = jnp.asarray(_SRC_112) * (crop_size / 112.0)  # (5,5,2)

    def solve(template):
        m = umeyama_similarity(kps, jnp.broadcast_to(template, kps.shape))
        ones = jnp.ones_like(kps[..., :1])
        pts_h = jnp.concatenate([kps, ones], axis=-1)  # (...,5,3)
        proj = jnp.einsum("...ij,...nj->...ni", m, pts_h)
        err = jnp.sum(jnp.linalg.norm(proj - template, axis=-1), axis=-1)
        return m, err

    ms, errs = jax.vmap(solve)(templates)  # (5,...,2,3), (5,...)
    if mode == "arcface":
        return ms[2]
    best = jnp.argmin(errs, axis=0)
    return jnp.take_along_axis(
        ms, best[None, ..., None, None], axis=0
    )[0]


def transform_points(pts, m):
    """Apply (...,2,3) affines to (...,N,2) points (reference
    coordinate_reg/image_infer.py:62-71 semantics, batched)."""
    ones = jnp.ones_like(pts[..., :1])
    pts_h = jnp.concatenate([pts, ones], axis=-1)
    return jnp.einsum("...ij,...nj->...ni", m, pts_h)
