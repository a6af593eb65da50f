"""Pix2Pix SR model wrapper: mode-dispatched API + TTUR train steps.

Parity with reference models/pix2pix_model.py:
  * forward modes 'generator' (G losses), 'discriminator' (D losses),
    'inference'/'inference2' (plain G forward) (:42-62);
  * G objective: multiscale hinge GAN + feature matching + VGG
    perceptual (:71-97);
  * TTUR optimizers: G lr/2, D lr*2, Adam(0, 0.9) (:154-170).

TPU-native: the wrapper owns (module, variables) pairs and exposes
jitted train steps over a functional SRTrainState.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ghost_tpu.core.precision import Policy, DEFAULT_POLICY
from ghost_tpu.models.discriminator import MultiscaleDiscriminator
from ghost_tpu.models.sr.generator import LIPSPADEGenerator
from ghost_tpu.models.sr.losses import (
    feature_matching_loss,
    gan_loss,
    vgg_loss,
)


@dataclasses.dataclass(frozen=True)
class SRConfig:
    ngf: int = 48
    ndf: int = 64
    lr: float = 2e-4  # base; TTUR splits to G lr/2, D lr*2
    gan_mode: str = "hinge"
    lambda_feat: float = 10.0
    lambda_vgg: float = 10.0
    no_ganFeat_loss: bool = False
    no_vgg_loss: bool = False


class SRTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    g_extra: Any  # spectral/u + batch_stats collections
    d_params: Any
    g_opt: Any
    d_opt: Any


class Pix2PixSR:
    """Bundles LIPSPADE G + multiscale D (getIntermFeat=True)."""

    def __init__(self, cfg: SRConfig = SRConfig(),
                 policy: Policy = DEFAULT_POLICY,
                 vgg_apply: Optional[Callable] = None, train: bool = False):
        self.cfg = cfg
        self.policy = policy
        self.vgg_apply = vgg_apply
        self.gen = LIPSPADEGenerator(ngf=cfg.ngf, policy=policy, train=train)
        self.disc = MultiscaleDiscriminator(
            ndf=cfg.ndf, n_layers=4, num_D=2, norm="instance",
            get_interm_feat=True, policy=policy,
        )

    def init(self, key, image_hw=(256, 256)):
        x = jnp.zeros((1, *image_hw, 3))
        g_vars = self.gen.init(key, x)
        d_vars = self.disc.init(key, jnp.concatenate([x, x], axis=-1))
        g_tx, d_tx = self.optimizers()
        return SRTrainState(
            step=jnp.int32(0),
            g_params=g_vars["params"],
            g_extra={k: v for k, v in g_vars.items() if k != "params"},
            d_params=d_vars["params"],
            g_opt=g_tx.init(g_vars["params"]),
            d_opt=d_tx.init(d_vars["params"]),
        )

    def optimizers(self):
        """TTUR (pix2pix_model.py:154-170): G lr/2, D lr*2, betas (0, .9)."""
        g_tx = optax.adam(self.cfg.lr / 2, b1=0.0, b2=0.9)
        d_tx = optax.adam(self.cfg.lr * 2, b1=0.0, b2=0.9)
        return g_tx, d_tx

    # -------------------------------------------------------------- forward
    def generate(self, state_or_vars, degraded):
        """mode='inference'/'inference2' parity: plain G forward."""
        if isinstance(state_or_vars, SRTrainState):
            variables = {"params": state_or_vars.g_params,
                         **state_or_vars.g_extra}
        else:
            variables = state_or_vars
        extra = [k for k in variables if k != "params"]
        if extra:
            out, _ = self.gen.apply(variables, degraded, mutable=extra)
            return out
        return self.gen.apply(variables, degraded)

    def _discriminate(self, d_params, degraded, generated, real):
        """Joint fake/real pass like the reference (pix2pix_model.py
        concatenates fake+real batches so BN-type norms see both)."""
        fake_pair = jnp.concatenate([degraded, generated], axis=-1)
        real_pair = jnp.concatenate([degraded, real], axis=-1)
        both = jnp.concatenate([fake_pair, real_pair], axis=0)
        outs = self.disc.apply({"params": d_params}, both)
        b = degraded.shape[0]
        fake, real_o = [], []
        for scale in outs:
            fake.append([t[:b] for t in scale])
            real_o.append([t[b:] for t in scale])
        return fake, real_o

    # ---------------------------------------------------------- train steps
    def make_steps(self):
        cfg = self.cfg
        g_tx, d_tx = self.optimizers()

        def g_loss_fn(g_params, state, degraded, real):
            variables = {"params": g_params, **state.g_extra}
            if state.g_extra:
                generated, updates = self.gen.apply(
                    variables, degraded, mutable=list(state.g_extra.keys())
                )
            else:
                generated, updates = self.gen.apply(variables, degraded), {}
            fake_d, real_d = self._discriminate(state.d_params, degraded,
                                                generated, real)
            loss = gan_loss(fake_d, True, cfg.gan_mode, for_discriminator=False)
            metrics = {"GAN": loss}
            if not cfg.no_ganFeat_loss:
                lf = feature_matching_loss(fake_d, real_d) * cfg.lambda_feat
                loss = loss + lf
                metrics["GAN_Feat"] = lf
            if not cfg.no_vgg_loss and self.vgg_apply is not None:
                lv = vgg_loss(self.vgg_apply, generated, real) * cfg.lambda_vgg
                loss = loss + lv
                metrics["VGG"] = lv
            metrics["generated"] = generated
            metrics["g_extra"] = updates
            return loss, metrics

        def g_step(state: SRTrainState, degraded, real):
            (loss, metrics), grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(state.g_params, state, degraded, real)
            updates, new_opt = g_tx.update(grads, state.g_opt, state.g_params)
            new_params = optax.apply_updates(state.g_params, updates)
            new_extra = metrics.pop("g_extra") or state.g_extra
            generated = metrics.pop("generated")
            return state.replace(step=state.step + 1, g_params=new_params,
                                 g_extra=new_extra, g_opt=new_opt), \
                metrics, generated

        def d_loss_fn(d_params, state, degraded, generated, real):
            fake_d, real_d = self._discriminate(d_params, degraded,
                                                jax.lax.stop_gradient(generated),
                                                real)
            l_fake = gan_loss(fake_d, False, cfg.gan_mode, True)
            l_real = gan_loss(real_d, True, cfg.gan_mode, True)
            return l_fake + l_real

        def d_step(state: SRTrainState, degraded, generated, real):
            loss, grads = jax.value_and_grad(d_loss_fn)(
                state.d_params, state, degraded, generated, real)
            updates, new_opt = d_tx.update(grads, state.d_opt, state.d_params)
            new_params = optax.apply_updates(state.d_params, updates)
            return state.replace(d_params=new_params, d_opt=new_opt), loss

        return g_step, d_step
