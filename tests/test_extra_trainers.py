"""Auxiliary trainer smoke tests (narrow models)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ghost_tpu.core.precision import FULL_PRECISION
from ghost_tpu.models.aei import AEINet
from ghost_tpu.models.discriminator import MultiscaleDiscriminator
from ghost_tpu.train.extra_trainers import (
    make_discriminator_pretrain_step,
    make_mask_train_step,
    make_upsampler_finetune_step,
)


@pytest.fixture(scope="module")
def tiny_gen():
    gen = AEINet(backbone="unet", num_blocks=1, policy=FULL_PRECISION,
                 train=True, width=1 / 16)
    g_vars = gen.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)),
                      jnp.zeros((1, 512)))
    return gen, g_vars


def test_discriminator_pretrain(rng):
    disc = MultiscaleDiscriminator(ndf=8, n_layers=3, num_D=2,
                                   policy=FULL_PRECISION)
    d_vars = disc.init(jax.random.key(0), jnp.zeros((1, 128, 128, 3)))
    step, tx = make_discriminator_pretrain_step(disc)
    d_opt = tx.init(d_vars["params"])
    fake = jnp.asarray(rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32))
    real = jnp.asarray(rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32))
    new_params, d_opt, loss = jax.jit(step)(d_vars["params"], d_opt, fake, real)
    assert np.isfinite(float(loss))
    diff = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        d_vars["params"], new_params))
    assert max(diff) > 0


def test_upsampler_finetune(tiny_gen, rng):
    gen, g_vars = tiny_gen
    # stand-in enhancer; (sr_vars, y) contract — vars ride as jit args
    upscale = lambda v, y: jnp.clip(y * v["gain"], -1, 1)
    step, tx = make_upsampler_finetune_step(gen, upscale)
    g_opt = tx.init(g_vars["params"])
    sr_vars = {"gain": jnp.float32(1.1)}
    xt = jnp.asarray(rng.uniform(-1, 1, (2, 256, 256, 3)).astype(np.float32))
    emb = jnp.asarray(rng.standard_normal((2, 512)).astype(np.float32))
    params, stats, g_opt, metrics = jax.jit(step)(
        g_vars["params"], g_vars["batch_stats"], g_opt, sr_vars, xt, emb)
    assert np.isfinite(float(metrics["loss"]))


def test_mask_trainer(tiny_gen, rng):
    gen, g_vars = tiny_gen
    step, tx = make_mask_train_step(gen)
    g_opt = tx.init(g_vars["params"])
    xt = jnp.asarray(rng.uniform(-1, 1, (2, 256, 256, 3)).astype(np.float32))
    emb = jnp.asarray(rng.standard_normal((2, 512)).astype(np.float32))
    mask = jnp.ones((2, 256, 256, 1), jnp.float32) * 0.5
    params, stats, g_opt, loss = jax.jit(step)(
        g_vars["params"], g_vars["batch_stats"], g_opt, xt, emb, mask)
    assert np.isfinite(float(loss))
