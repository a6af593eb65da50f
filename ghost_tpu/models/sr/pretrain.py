"""Self-supervised LIP-encoder pretraining (SubAdd / Contrasive).

TPU-native equivalents of the reference's self-supervised SR trainers
(reference models/networks/generator.py:403-763):

  * `NoiseClassPredictor` / `NoiseIntensityPredictor` — small heads that
    read an encoder feature map and predict the corruption class /
    intensity (generator.py:403-489);
  * SubAdd scheme (`SubAddGenerator.update_E/update_D`,
    generator.py:581-621): the encoder is trained so clean/noisy
    features collapse (L1 x 10) while fooling an intensity adversary
    (MSE GAN); the adversary sees the feature RATIO noisy/clean and the
    all-ones "clean" reference, TTUR-style lrs (G lr/2, D lr — then
    D lr/2 again at the optimizer, generator.py:536-546);
  * Contrasive scheme (`ContrasiveGenerator.update_E`,
    generator.py:719-731): plain feature L1 between clean and noisy.

The reference couples these to its dataloader and .pth checkpointing
inside the nn.Module; here they are pure jitted step functions over
(params, opt_state, clean, noisy[, label]) — the loop, dataset and
checkpointing live with the caller (train/loop.py, core/checkpoint.py).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from ghost_tpu.core.precision import Policy, DEFAULT_POLICY
from ghost_tpu.nn.layers import BatchNorm, Conv, Dense, instance_norm, leaky_relu
from ghost_tpu.train.optimizers import ghost_adam


class NoiseIntensityPredictor(nn.Module):
    """Feature map -> scalar corruption intensity
    (reference generator.py:445-489): 1x1 conv to 256, BN+LReLU(0.2),
    stride-2 3x3 downs to 4x4, then Linear-BN-LReLU-Linear."""

    sw: int = 8
    outdim: int = 1
    policy: Policy = DEFAULT_POLICY
    train: bool = True
    bottleneck: int = 256
    middim: int = 256

    @nn.compact
    def __call__(self, x):
        cd = self.policy.compute_dtype
        pd = self.policy.param_dtype
        x = Conv(self.bottleneck, 1, dtype=cd, param_dtype=pd,
                 name="compact")(x)
        x = BatchNorm(use_running_average=not self.train, dtype=cd,
                      param_dtype=pd, name="bn0")(x)
        x = leaky_relu(x, 0.2)
        sw, i = self.sw, 0
        while sw > 4:
            sw //= 2
            x = Conv(self.bottleneck, 3, stride=2, padding=1, dtype=cd,
                     param_dtype=pd, name=f"down{i}")(x)
            x = BatchNorm(use_running_average=not self.train, dtype=cd,
                          param_dtype=pd, name=f"bn{i + 1}")(x)
            x = leaky_relu(x, 0.2)
            i += 1
        x = x.reshape(x.shape[0], -1)
        x = Dense(self.middim, dtype=cd, param_dtype=pd, name="fc0")(x)
        x = BatchNorm(use_running_average=not self.train, dtype=cd,
                      param_dtype=pd, name="fc_bn")(x)
        x = leaky_relu(x, 0.2)
        x = Dense(self.outdim, dtype=cd, param_dtype=pd, name="fc1")(x)
        return jnp.squeeze(x, -1) if self.outdim == 1 else x


class NoiseClassPredictor(nn.Module):
    """Feature map -> corruption-class logits
    (reference generator.py:403-442); InstanceNorm conv trunk variant."""

    sw: int = 8
    outdim: int = 2
    policy: Policy = DEFAULT_POLICY
    train: bool = True
    bottleneck: int = 256
    middim: int = 256

    @nn.compact
    def __call__(self, x):
        cd = self.policy.compute_dtype
        pd = self.policy.param_dtype
        x = Conv(self.bottleneck, 1, dtype=cd, param_dtype=pd,
                 name="compact")(x)
        x = instance_norm(x.astype(jnp.float32)).astype(cd)
        x = leaky_relu(x, 0.2)
        sw, i = self.sw, 0
        while sw > 4:
            sw //= 2
            x = Conv(self.bottleneck, 3, stride=2, padding=1, dtype=cd,
                     param_dtype=pd, name=f"down{i}")(x)
            x = instance_norm(x.astype(jnp.float32)).astype(cd)
            x = leaky_relu(x, 0.2)
            i += 1
        x = x.reshape(x.shape[0], -1)
        x = Dense(self.middim, dtype=cd, param_dtype=pd, name="fc0")(x)
        x = BatchNorm(use_running_average=not self.train, dtype=cd,
                      param_dtype=pd, name="fc_bn")(x)
        x = leaky_relu(x, 0.2)
        return Dense(self.outdim, dtype=cd, param_dtype=pd, name="fc1")(x)


def make_subadd_pretrain_steps(encoder_apply, disc_mod, lr: float = 2e-4,
                               no_ttur: bool = False, l1_mult: float = 10.0,
                               noise_dim: int = 1):
    """SubAdd scheme (reference generator.py:536-546,581-621).

    encoder_apply(params, x) -> feature map; disc_mod: a
    NoiseIntensityPredictor. Returns (e_step, d_step, e_tx, d_tx):

      e_step(e_params, e_opt, d_vars, clean, noisy)
          -> e_params, e_opt, {l1, gan_E, sum}
      d_step(d_vars, d_opt, e_params, clean, noisy, noise_label)
          -> d_vars, d_opt, {gan_D_real, gan_D_fake}
    """
    g_lr, d_lr = (lr, lr) if no_ttur else (lr / 2, lr * 2)
    e_tx = ghost_adam(g_lr)
    d_tx = ghost_adam(d_lr / 2)  # optimizer_D uses D_lr/2 (:545)

    def _apply_disc(d_vars, feats):
        out, updates = disc_mod.apply(d_vars, feats, mutable=["batch_stats"])
        return out, updates

    def e_loss(e_params, d_vars, clean, noisy):
        both = jnp.concatenate([clean, noisy], axis=0)
        feats = encoder_apply(e_params, both)
        nb = clean.shape[0]
        f_real, f_fake = feats[:nb], feats[nb:]
        pred_fake, _ = _apply_disc(d_vars, f_fake)
        loss_l1 = jnp.mean(jnp.abs(f_fake - f_real))
        loss_gan = jnp.mean((pred_fake - 1.0) ** 2)  # clean_label = 1
        return loss_l1 * l1_mult + loss_gan, (loss_l1, loss_gan)

    def e_step(e_params, e_opt, d_vars, clean, noisy):
        (loss, (l1, gan)), grads = jax.value_and_grad(
            e_loss, has_aux=True)(e_params, d_vars, clean, noisy)
        updates, e_opt = e_tx.update(grads, e_opt, e_params)
        e_params = optax.apply_updates(e_params, updates)
        return e_params, e_opt, {"l1": l1, "gan_E": gan, "sum": loss}

    def d_loss(d_params, d_stats, e_params, clean, noisy, noise_label):
        both = jnp.concatenate([clean, noisy], axis=0)
        feats = jax.lax.stop_gradient(encoder_apply(e_params, both))
        nb = clean.shape[0]
        # adversary sees the noisy/clean feature RATIO; "real" is all
        # ones (generator.py:603-606)
        f_fake = feats[nb:] / (feats[:nb] + 1e-6)
        f_real = jnp.ones_like(f_fake)
        d_vars = {"params": d_params, **d_stats}
        pred_real, upd = disc_mod.apply(d_vars, f_real,
                                        mutable=["batch_stats"])
        pred_fake, upd = disc_mod.apply({"params": d_params, **upd},
                                        f_fake, mutable=["batch_stats"])
        loss_real = jnp.mean((pred_real - 1.0) ** 2)
        loss_fake = jnp.mean((pred_fake - noise_label) ** 2)
        loss = (loss_real + loss_fake * noise_dim) / 2.0
        return loss, (loss_real, loss_fake, upd)

    def d_step(d_vars, d_opt, e_params, clean, noisy, noise_label):
        d_params = d_vars["params"]
        d_stats = {k: v for k, v in d_vars.items() if k != "params"}
        (_, (lr_, lf_, upd)), grads = jax.value_and_grad(
            d_loss, has_aux=True)(d_params, d_stats, e_params, clean,
                                  noisy, noise_label)
        updates, d_opt = d_tx.update(grads, d_opt, d_params)
        d_params = optax.apply_updates(d_params, updates)
        return ({"params": d_params, **upd}, d_opt,
                {"gan_D_real": lr_, "gan_D_fake": lf_})

    return e_step, d_step, e_tx, d_tx


def make_contrasive_pretrain_step(encoder_apply, lr: float = 2e-4):
    """Contrasive scheme (reference generator.py:719-731): encoder-only
    feature L1 between clean and noisy views."""
    e_tx = ghost_adam(lr)

    def loss_fn(e_params, clean, noisy):
        both = jnp.concatenate([clean, noisy], axis=0)
        feats = encoder_apply(e_params, both)
        nb = clean.shape[0]
        return jnp.mean(jnp.abs(feats[nb:] - feats[:nb]))

    def e_step(e_params, e_opt, clean, noisy):
        loss, grads = jax.value_and_grad(loss_fn)(e_params, clean, noisy)
        updates, e_opt = e_tx.update(grads, e_opt, e_params)
        return optax.apply_updates(e_params, updates), e_opt, loss

    return e_step, e_tx
