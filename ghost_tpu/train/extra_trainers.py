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
    upscale_apply: Callable,
    vgg_apply: Optional[Callable] = None,
    lr: float = 4e-4,
    upsample_mult: float = 30000.0,
):
    """G fine-tune against upscaled self-outputs (train-upsampler.py).

    upscale_apply: (sr_vars, (B,256,256,3) pm1) -> (B,256,256,3) pm1
    enhanced target (stop-gradient applied here). The upscaler's
    variables ride through `step` as an argument so a jitted step does
    not embed them as HLO constants (the relay 413 rule — see
    SwapPipeline._vars)."""
    tx = ghost_adam(lr)

    def loss_fn(g_params, g_stats, sr_vars, xt, embed):
        (y, _), updates = gen_mod.apply(
            {"params": g_params, "batch_stats": g_stats}, xt, embed,
            mutable=["batch_stats"],
        )
        target = jax.lax.stop_gradient(upscale_apply(sr_vars, y))
        l_up = jnp.mean(jnp.square(y - target)) * upsample_mult
        l_color = multiscale_perceptual_color_loss(vgg_apply, y, target)
        return l_up + l_color, (updates["batch_stats"],
                                {"upsample": l_up, "color": l_color})

    def step(g_params, g_stats, g_opt, sr_vars, xt, embed):
        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(g_params, g_stats, sr_vars, xt, embed)
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


def sr_upscale_apply(sr_mod):
    """Two-argument `(sr_vars, y_pm1) -> y_pm1` LIPSPADE apply (the
    native replacement of utils/training/upsampler.py:107-120's
    GFPGAN/RealESRGAN round trip). Variables are an explicit argument
    so jitted callers pass them as device buffers instead of embedding
    ~M params as HLO constants (relay HTTP 413 rule)."""

    def upscale(sr_vars, y_pm1):
        extra = [k for k in sr_vars if k != "params"]
        if extra:
            out, _ = sr_mod.apply(sr_vars, y_pm1, mutable=extra)
        else:
            out = sr_mod.apply(sr_vars, y_pm1)
        return out

    return upscale


def sr_upscale_fn(sr_mod, sr_vars, jit: bool = False):
    """One-argument `y_pm1 -> y_pm1` upscale closure over `sr_vars`.
    With jit=True the variables still ride as jit ARGUMENTS (bound
    outside the compiled function), keeping the compile request small."""
    apply = sr_upscale_apply(sr_mod)
    fn = jax.jit(apply) if jit else apply
    return lambda y_pm1: fn(sr_vars, y_pm1)


def load_lipspade_vars(sr_mod, sr_path: str, ngf: int,
                       warn_context: str = "SR"):
    """LIPSPADE generator variables from a torch .pth (converted on
    load), a flax msgpack snapshot, or random init with a warning.
    Shared by cli/train.py (--teacher_upsample) and cli/train_extras.py
    (--mode upsampler)."""
    if sr_path and sr_path.endswith(".pth"):
        from ghost_tpu.convert.torch_loader import (
            convert_spade_generator_state_dict, load_torch_checkpoint)

        return jax.tree.map(jnp.asarray, convert_spade_generator_state_dict(
            load_torch_checkpoint(sr_path), ngf=ngf))
    if sr_path:
        from ghost_tpu.core.checkpoint import load_msgpack

        return load_msgpack(sr_path)
    print(f"WARNING: random SR weights ({warn_context})")
    return sr_mod.init(jax.random.key(2), jnp.zeros((1, 256, 256, 3)))


def external_upsampler_available() -> bool:
    """GFPGAN/RealESRGAN path (reference upsampler.py) is gated on those
    packages, which are CUDA-oriented and absent here."""
    try:
        import gfpgan  # noqa: F401
        import realesrgan  # noqa: F401

        return True
    except ImportError:
        return False
