"""SR losses + Pix2Pix TTUR train-step smoke tests (tiny sizes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ghost_tpu.core.precision import FULL_PRECISION
from ghost_tpu.models.sr.encoder import ConvEncoder
from ghost_tpu.models.sr.losses import (
    feature_matching_loss,
    gan_loss,
    kld_loss,
    multiscale_perceptual_color_loss,
)
from ghost_tpu.models.sr.pix2pix import Pix2PixSR, SRConfig
from ghost_tpu.models.sr.vgg import VGG19Features, convert_vgg19_features


@pytest.mark.parametrize("mode", ["ls", "original", "hinge", "w"])
def test_gan_loss_modes(rng, mode):
    logits = [[jnp.asarray(rng.standard_normal((2, 4, 4, 1),
                                               dtype=np.float32))]
              for _ in range(2)]
    for target in (True, False):
        ld = float(gan_loss(logits, target, mode, for_discriminator=True))
        assert np.isfinite(ld)
    lg = float(gan_loss(logits, True, mode, for_discriminator=False))
    assert np.isfinite(lg)


def test_gan_loss_hinge_formula(rng):
    x = rng.standard_normal((2, 3, 3, 1), dtype=np.float32)
    out = [[jnp.asarray(x)]]
    ref_real = -np.minimum(x - 1, 0).mean()
    ref_fake = -np.minimum(-x - 1, 0).mean()
    assert abs(float(gan_loss(out, True, "hinge", True)) - ref_real) < 1e-6
    assert abs(float(gan_loss(out, False, "hinge", True)) - ref_fake) < 1e-6
    assert abs(float(gan_loss(out, True, "hinge", False)) + x.mean()) < 1e-6


def test_kld_loss():
    mu = jnp.asarray([[0.0, 1.0]])
    logvar = jnp.asarray([[0.0, 0.0]])
    # -0.5 * sum(1 + 0 - mu^2 - 1) = 0.5 * sum(mu^2) = 0.5
    assert abs(float(kld_loss(mu, logvar)) - 0.5) < 1e-6


def test_feature_matching(rng):
    fake = [[jnp.asarray(rng.standard_normal((1, 4, 4, 2), dtype=np.float32))
             for _ in range(3)]]
    real = [[f + 1.0 for f in fake[0]]]
    lf = float(feature_matching_loss(fake, real))
    assert abs(lf - 2.0) < 1e-5  # 2 feature layers x L1 of 1.0, /1 scale


def test_multiscale_color_loss(rng):
    x = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    assert float(multiscale_perceptual_color_loss(None, x, x)) < 1e-10
    y = x + 0.5
    assert float(multiscale_perceptual_color_loss(None, x, y)) > 0.2


def test_conv_encoder_shapes():
    enc = ConvEncoder(ndf=8, z_dim=16, policy=FULL_PRECISION)
    x = jnp.zeros((2, 64, 64, 3))
    variables = enc.init(jax.random.key(0), x)
    mu, logvar = enc.apply(variables, x)
    assert mu.shape == (2, 16) and logvar.shape == (2, 16)


def test_vgg19_structure_and_converter(rng):
    model = VGG19Features(policy=FULL_PRECISION)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x)
    feats = model.apply(variables, x)
    assert len(feats) == 5
    assert feats[0].shape == (1, 64, 64, 64)
    assert feats[4].shape == (1, 4, 4, 512)

    # converter: build a synthetic torchvision-layout state_dict
    sd = {}
    torch_idx = 0
    cfg = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M")
    cin = 3
    for item in cfg:
        if item == "M":
            torch_idx += 1
            continue
        sd[f"features.{torch_idx}.weight"] = rng.standard_normal(
            (item, cin, 3, 3), dtype=np.float32)
        sd[f"features.{torch_idx}.bias"] = rng.standard_normal(
            item, dtype=np.float32)
        cin = item
        torch_idx += 2
    converted = convert_vgg19_features(sd)
    shapes_ref = jax.tree.map(lambda a: a.shape, variables["params"])
    shapes_got = jax.tree.map(lambda a: tuple(a.shape), converted["params"])
    assert shapes_ref == shapes_got


def test_pix2pix_sr_train_steps(rng):
    cfg = SRConfig(ngf=4, ndf=4, no_vgg_loss=True)
    model = Pix2PixSR(cfg, policy=FULL_PRECISION, train=True)
    state = model.init(jax.random.key(0), image_hw=(64, 64))
    g_step, d_step = model.make_steps()
    degraded = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    real = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    state, metrics, generated = jax.jit(g_step)(state, degraded, real)
    assert generated.shape == (2, 64, 64, 3)
    assert np.isfinite(float(metrics["GAN"]))
    state, loss_d = jax.jit(d_step)(state, degraded, generated, real)
    assert np.isfinite(float(loss_d))
    out = model.generate(state, degraded)
    assert out.shape == (2, 64, 64, 3)
