"""Quality metrics for swap outputs: id-sim, PSNR, perceptual distance.

BASELINE.md's quality targets are (a) ArcFace id-sim within 0.01 of the
reference pipeline and (b) LPIPS parity. This module is the measurement
harness: all metrics are jittable and batched.

  * id_similarity: cosine between ArcFace embeddings of two aligned
    face crops (the reference's own identity metric, train.py:311);
  * psnr: pixel-space sanity metric;
  * perceptual_distance: LPIPS-style normalized-VGG-feature distance
    (Zhang et al. 2018). With `lin_weights=None` it degrades to the
    unit-weighted variant (VGG-space distance); pass the published
    LPIPS linear weights for exact LPIPS.

Driven by scripts/quality_eval.py against real checkpoints when
present.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp

from ghost_tpu.nn.layers import resize


def id_similarity(arc_apply: Callable, crop_a_pm1, crop_b_pm1):
    """Cosine similarity of ArcFace embeddings; crops (B,S,S,3) in
    [-1,1], any S (area-resized to 112 like the reference embed path)."""
    ea = arc_apply(resize(crop_a_pm1, (112, 112), method="area"))
    eb = arc_apply(resize(crop_b_pm1, (112, 112), method="area"))
    ea = ea / jnp.maximum(jnp.linalg.norm(ea, axis=-1, keepdims=True), 1e-12)
    eb = eb / jnp.maximum(jnp.linalg.norm(eb, axis=-1, keepdims=True), 1e-12)
    return jnp.sum(ea * eb, axis=-1)


def psnr(a_u8, b_u8):
    a = a_u8.astype(jnp.float32)
    b = b_u8.astype(jnp.float32)
    mse = jnp.mean(jnp.square(a - b), axis=tuple(range(1, a.ndim)))
    return 10.0 * jnp.log10(255.0 ** 2 / jnp.maximum(mse, 1e-12))


def perceptual_distance(
    vgg_features: Callable,
    img_a_pm1,
    img_b_pm1,
    lin_weights: Optional[Sequence] = None,
):
    """LPIPS-style distance: unit-normalize each VGG feature map along
    channels, average squared differences spatially, weight per layer.

    vgg_features: imgs -> list of feature maps (e.g.
    models.sr.vgg.VGG19Features at the relu slices). lin_weights: per-
    layer (C,) weights (the published LPIPS 'lin' heads); None = 1/C.
    """
    fa = vgg_features(img_a_pm1)
    fb = vgg_features(img_b_pm1)
    total = 0.0
    for k, (a, b) in enumerate(zip(fa, fb)):
        a = a / jnp.maximum(
            jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
        b = b / jnp.maximum(
            jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
        d = jnp.square(a - b)
        if lin_weights is not None:
            d = d * jnp.asarray(lin_weights[k]).reshape(1, 1, 1, -1)
        else:
            d = d / a.shape[-1]
        total = total + jnp.mean(jnp.sum(d, axis=-1), axis=(1, 2))
    return total
