"""Auxiliary training regimes: D pretrain, upsampler-in-the-loop, mask.

Parity targets:
  * `make_discriminator_pretrain_step` — train-discriminator.py:60-199:
    D alone learns real(Xs) vs fake(teacher output), hinge, lossD
    heavily weighted (x1000 at :185);
  * `make_upsampler_finetune_step` — train-upsampler.py:45-225: G
    fine-tuned to match an upscaled version of its own output
    (`upsample_loss` MSE x30000 :110-135) plus multi-scale perceptual
    color loss (:91). The upscaler is pluggable: the reference uses
    GFPGAN/RealESRGAN singletons (utils/training/upsampler.py:20-120);
    the TPU-native default is the LIPSPADE SR generator, with the
    external-tool path gated;
  * `make_mask_train_step` — train-mask.py:236-324: AEI-Net repurposed
    to predict soft face masks, MSE x10000 against precomputed targets
    (the reference prompts SAM with 5 face kps; here targets come from
    ops.mask hull masks or user-provided SAM exports).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ghost_tpu.models.sr.losses import multiscale_perceptual_color_loss
from ghost_tpu.train.optimizers import ghost_adam


def make_discriminator_pretrain_step(disc_mod, lr: float = 4e-4,
                                     loss_mult: float = 1000.0):
    """(d_params, d_opt, fake, real) -> updated params/opt + loss."""
    tx = ghost_adam(lr)

    def loss_fn(d_params, fake, real):
        d_fake = disc_mod.apply({"params": d_params}, fake)
        d_real = disc_mod.apply({"params": d_params}, real)
        loss = 0.0
        for df, dr in zip(d_fake, d_real):
            loss = loss + jnp.mean(jnp.maximum(1.0 + df[-1], 0.0))
            loss = loss + jnp.mean(jnp.maximum(1.0 - dr[-1], 0.0))
        return loss_mult * loss

    def step(d_params, d_opt, fake, real):
        loss, grads = jax.value_and_grad(loss_fn)(d_params, fake, real)
        updates, d_opt = tx.update(grads, d_opt, d_params)
        return optax.apply_updates(d_params, updates), d_opt, loss

    return step, tx


def make_upsampler_finetune_step(
    gen_mod,
    upscale_fn: Callable,
    vgg_apply: Optional[Callable] = None,
    lr: float = 4e-4,
    upsample_mult: float = 30000.0,
):
    """G fine-tune against upscaled self-outputs (train-upsampler.py).

    upscale_fn: (B,256,256,3) pm1 -> (B,256,256,3) pm1 enhanced target
    (stop-gradient applied here)."""
    tx = ghost_adam(lr)

    def loss_fn(g_params, g_stats, xt, embed):
        (y, _), updates = gen_mod.apply(
            {"params": g_params, "batch_stats": g_stats}, xt, embed,
            mutable=["batch_stats"],
        )
        target = jax.lax.stop_gradient(upscale_fn(y))
        l_up = jnp.mean(jnp.square(y - target)) * upsample_mult
        l_color = multiscale_perceptual_color_loss(vgg_apply, y, target)
        return l_up + l_color, (updates["batch_stats"],
                                {"upsample": l_up, "color": l_color})

    def step(g_params, g_stats, g_opt, xt, embed):
        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(g_params, g_stats, xt, embed)
        updates, g_opt = tx.update(grads, g_opt, g_params)
        g_params = optax.apply_updates(g_params, updates)
        metrics["loss"] = loss
        return g_params, new_stats, g_opt, metrics

    return step, tx


def make_mask_train_step(gen_mod, lr: float = 4e-4,
                         mask_mult: float = 10000.0):
    """AEI-Net -> mask predictor (train-mask.py:300-308): MSE between
    G(Xt, z)'s single-channel-ized output and the target mask."""
    tx = ghost_adam(lr)

    def loss_fn(g_params, g_stats, xt, embed, target_mask):
        (y, _), updates = gen_mod.apply(
            {"params": g_params, "batch_stats": g_stats}, xt, embed,
            mutable=["batch_stats"],
        )
        pred = jnp.mean(y * 0.5 + 0.5, axis=-1, keepdims=True)
        loss = jnp.mean(jnp.square(pred - target_mask)) * mask_mult
        return loss, updates["batch_stats"]

    def step(g_params, g_stats, g_opt, xt, embed, target_mask):
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(g_params, g_stats, xt, embed, target_mask)
        updates, g_opt = tx.update(grads, g_opt, g_params)
        return optax.apply_updates(g_params, updates), new_stats, g_opt, loss

    return step, tx


def sr_upscale_fn(sr_mod, sr_vars):
    """LIPSPADE-based `upscale` (the native replacement of
    utils/training/upsampler.py:107-120's GFPGAN/RealESRGAN round trip:
    tensor -> enhance -> back to 256 pm1)."""

    def upscale(y_pm1):
        extra = [k for k in sr_vars if k != "params"]
        if extra:
            out, _ = sr_mod.apply(sr_vars, y_pm1, mutable=extra)
        else:
            out = sr_mod.apply(sr_vars, y_pm1)
        return out

    return upscale


def external_upsampler_available() -> bool:
    """GFPGAN/RealESRGAN path (reference upsampler.py) is gated on those
    packages, which are CUDA-oriented and absent here."""
    try:
        import gfpgan  # noqa: F401
        import realesrgan  # noqa: F401

        return True
    except ImportError:
        return False
