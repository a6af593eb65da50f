"""Shape/jit smoke tests for the model families (tiny inputs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ghost_tpu.core.precision import FULL_PRECISION
from ghost_tpu.models.aei import AEINet
from ghost_tpu.models.arcface import IResNet, normalize_embedding
from ghost_tpu.models.discriminator import MultiscaleDiscriminator


@pytest.mark.parametrize("backbone", ["unet", "linknet"])
def test_aei_shapes(backbone):
    model = AEINet(backbone=backbone, num_blocks=2, policy=FULL_PRECISION)
    xt = jnp.zeros((1, 256, 256, 3))
    zid = jnp.zeros((1, 512))
    variables = model.init(jax.random.key(0), xt, zid)
    y, attrs = model.apply(variables, xt, zid)
    assert y.shape == (1, 256, 256, 3)
    assert len(attrs) == 8
    # encoder pyramid: 2,4,...,256 spatial, coarse->fine
    expected_hw = [2, 4, 8, 16, 32, 64, 128, 256]
    expected_ch = (
        [1024, 2048, 1024, 512, 256, 128, 64, 64]
        if backbone == "unet"
        else [1024, 1024, 512, 256, 128, 64, 32, 32]
    )
    for a, hw, ch in zip(attrs, expected_hw, expected_ch):
        assert a.shape == (1, hw, hw, ch)
    # output bounded by tanh
    assert float(jnp.max(jnp.abs(y))) <= 1.0


def test_aei_jit_and_get_attr():
    model = AEINet(backbone="unet", num_blocks=2, policy=FULL_PRECISION)
    xt = jnp.zeros((2, 256, 256, 3))
    zid = jnp.zeros((2, 512))
    variables = model.init(jax.random.key(0), xt, zid)

    fwd = jax.jit(lambda v, x, z: model.apply(v, x, z)[0])
    y = fwd(variables, xt, zid)
    assert y.shape == (2, 256, 256, 3)

    attrs = model.apply(variables, xt, method=AEINet.get_attr)
    assert len(attrs) == 8


def test_discriminator_shapes():
    d = MultiscaleDiscriminator(n_layers=5, num_D=3, norm="instance",
                                policy=FULL_PRECISION)
    x = jnp.zeros((2, 256, 256, 3))
    variables = d.init(jax.random.key(0), x)
    outs = d.apply(variables, x)
    assert len(outs) == 3
    for scale_out in outs:
        assert scale_out[0].shape[-1] == 1  # logits map
    # pyramid: scales shrink (exact sizes follow torch's pad=2 conv math)
    h0 = outs[0][0].shape[1]
    h1 = outs[1][0].shape[1]
    h2 = outs[2][0].shape[1]
    assert h0 > h1 > h2


def test_arcface_tiny():
    # tiny depth plan to keep CPU time sane; same code path as iresnet100
    model = IResNet(layers=(1, 1, 1, 1), policy=FULL_PRECISION)
    x = jnp.zeros((2, 112, 112, 3))
    variables = model.init(jax.random.key(0), x)
    e = model.apply(variables, x)
    assert e.shape == (2, 512)
    n = normalize_embedding(jnp.ones((2, 512)))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(n), axis=1), 1.0, rtol=1e-6)


def test_aei_resnet_backbone_shapes():
    model = AEINet(backbone="resnet", num_blocks=2, policy=FULL_PRECISION)
    xt = jnp.zeros((1, 256, 256, 3))
    zid = jnp.zeros((1, 512))
    variables = model.init(jax.random.key(0), xt, zid)
    y, attrs = model.apply(variables, xt, zid)
    assert y.shape == (1, 256, 256, 3)
    assert len(attrs) == 8
