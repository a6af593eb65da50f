"""SR training losses: GANLoss variants, VGG perceptual, feature match,
KLD, multi-scale perceptual color loss.

Parity targets:
  * GANLoss ls/original/hinge/wgan with per-scale list handling
    (reference models/networks/loss.py:16-98);
  * VGGLoss with weights [1/32,1/16,1/8,1/4,1] (loss.py:102-116);
  * KLDLoss (loss.py:120-122);
  * GAN feature-matching L1 over intermediate D features
    (reference models/pix2pix_model.py:71-97 uses it when not no_ganFeat);
  * MultiScalePerceptualColorLoss: 4-scale MSE + VGG feature MSE
    (reference models/MultiScalePerceptualColorLoss.py:6-37).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from ghost_tpu.nn.layers import resize


def _gan_loss_single(logits, target_real: bool, mode: str, for_D: bool):
    x = logits.astype(jnp.float32)
    if mode == "ls":
        t = 1.0 if target_real else 0.0
        return jnp.mean(jnp.square(x - t))
    if mode == "original":
        t = jnp.ones_like(x) if target_real else jnp.zeros_like(x)
        return jnp.mean(
            -(t * jax.nn.log_sigmoid(x) + (1 - t) * jax.nn.log_sigmoid(-x))
        )
    if mode == "hinge":
        if for_D:
            if target_real:
                return -jnp.mean(jnp.minimum(x - 1.0, 0.0))
            return -jnp.mean(jnp.minimum(-x - 1.0, 0.0))
        assert target_real, "hinge G loss expects target_real"
        return -jnp.mean(x)
    if mode in ("w", "wgan"):
        return -jnp.mean(x) if target_real else jnp.mean(x)
    raise ValueError(mode)


def gan_loss(d_outputs, target_real: bool, mode: str = "hinge",
             for_discriminator: bool = True):
    """Multiscale-aware GAN loss (loss.py:79-98): d_outputs is a list
    over scales; each element a list whose last entry is the logits."""
    if isinstance(d_outputs, (list, tuple)):
        total = 0.0
        for out in d_outputs:
            pred = out[-1] if isinstance(out, (list, tuple)) else out
            total = total + _gan_loss_single(pred, target_real, mode,
                                             for_discriminator)
        return total / len(d_outputs)
    return _gan_loss_single(d_outputs, target_real, mode, for_discriminator)


def feature_matching_loss(d_fake_feats, d_real_feats):
    """L1 over intermediate D features, averaged over scales
    (pix2pix_model.py GANFeat_loss semantics)."""
    num_d = len(d_fake_feats)
    total = 0.0
    for fake, real in zip(d_fake_feats, d_real_feats):
        for f, r in zip(fake[:-1], real[:-1]):
            total = total + jnp.mean(
                jnp.abs(f.astype(jnp.float32)
                        - jax.lax.stop_gradient(r).astype(jnp.float32))
            )
    return total / num_d


VGG_SLICE_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)


def vgg_loss(vgg_apply: Callable, x, y):
    """Weighted L1 over the 5 VGG slices (loss.py:102-116)."""
    fx = vgg_apply(x)
    fy = vgg_apply(y)
    total = 0.0
    for w, a, b in zip(VGG_SLICE_WEIGHTS, fx, fy):
        total = total + w * jnp.mean(
            jnp.abs(a.astype(jnp.float32)
                    - jax.lax.stop_gradient(b).astype(jnp.float32))
        )
    return total


def kld_loss(mu, logvar):
    """-0.5 * sum(1 + logvar - mu^2 - exp(logvar)) (loss.py:120-122)."""
    return -0.5 * jnp.sum(1 + logvar - jnp.square(mu) - jnp.exp(logvar))


def multiscale_perceptual_color_loss(vgg_apply: Callable | None, x, y,
                                     scales: Sequence[float] = (1.0, 0.5,
                                                                0.25, 0.125)):
    """4-scale image MSE + optional VGG feature MSE (reference
    models/MultiScalePerceptualColorLoss.py:6-37)."""
    total = 0.0
    for s in scales:
        h = max(int(x.shape[1] * s), 1)
        w = max(int(x.shape[2] * s), 1)
        xs = resize(x, (h, w), method="bilinear")
        ys = resize(y, (h, w), method="bilinear")
        total = total + jnp.mean(jnp.square(
            xs.astype(jnp.float32) - ys.astype(jnp.float32)))
    total = total / len(scales)
    if vgg_apply is not None:
        fx = vgg_apply(x)
        fy = vgg_apply(y)
        feat = sum(jnp.mean(jnp.square(a.astype(jnp.float32)
                                       - b.astype(jnp.float32)))
                   for a, b in zip(fx, fy)) / len(fx)
        total = total + feat
    return total
