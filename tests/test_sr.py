"""SR stack tests: LIP pooling math, spectral norm, generator shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from ghost_tpu.core.precision import FULL_PRECISION
from ghost_tpu.models.sr.generator import (
    HiFaceGANGenerator,
    LIPSPADEGenerator,
    SPADEGenerator,
    lip2d,
)
from ghost_tpu.models.sr.spade import SPADE, SpectralConv


def test_lip2d_parity(rng):
    """lip2d == avgpool(x*exp(l)) / avgpool(exp(l)) with k3 s2 p1
    (reference models/networks/generator.py:313-315)."""
    x = rng.standard_normal((2, 8, 8, 4), dtype=np.float32)
    logit = rng.standard_normal((2, 8, 8, 4), dtype=np.float32)
    ours = np.asarray(lip2d(jnp.asarray(x), jnp.asarray(logit)))

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    lt = torch.from_numpy(logit.transpose(0, 3, 1, 2))
    w = lt.exp()
    ref = TF.avg_pool2d(xt * w, 3, 2, 1) / TF.avg_pool2d(w, 3, 2, 1)
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)


def test_spectral_conv_normalizes(rng):
    """After several power iterations the effective kernel's top singular
    value approaches 1."""
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 6), dtype=np.float32))
    mod = SpectralConv(4, 3, update_stats=True)
    variables = mod.init(jax.random.key(0), x)
    params, spectral = variables["params"], variables["spectral"]
    for _ in range(20):
        _, updates = mod.apply({"params": params, "spectral": spectral}, x,
                               mutable=["spectral"])
        spectral = updates["spectral"]
    # check sigma of the normalized kernel
    w = np.asarray(params["kernel"]).transpose(3, 0, 1, 2).reshape(4, -1)
    u = np.asarray(spectral["u"])
    v = w.T @ u / np.linalg.norm(w.T @ u)
    sigma_est = u @ (w @ v) / (np.linalg.norm(u) ** 2 + 1e-12)
    true_sigma = np.linalg.svd(w, compute_uv=False)[0]
    assert abs(sigma_est - true_sigma) / true_sigma < 0.05


def test_spade_shapes():
    mod = SPADE(norm_nc=16, param_free="instance", policy=FULL_PRECISION)
    x = jnp.zeros((2, 8, 8, 16))
    seg = jnp.zeros((2, 64, 64, 3))
    variables = mod.init(jax.random.key(0), x, seg)
    out = mod.apply(variables, x, seg)
    assert out.shape == x.shape


def test_lipspade_generator_shapes():
    gen = LIPSPADEGenerator(ngf=8, policy=FULL_PRECISION)
    x = jnp.zeros((1, 64, 64, 3))
    variables = gen.init(jax.random.key(0), x)
    y = gen.apply(variables, x)
    assert y.shape == (1, 64, 64, 3)
    assert float(jnp.max(jnp.abs(y))) <= 1.0


def test_spade_generator_shapes():
    gen = SPADEGenerator(ngf=8, policy=FULL_PRECISION)
    x = jnp.zeros((1, 64, 64, 3))
    variables = gen.init(jax.random.key(0), x)
    y = gen.apply(variables, x)
    assert y.shape == (1, 64, 64, 3)


def test_hifacegan_generator_shapes():
    gen = HiFaceGANGenerator(ngf=8, policy=FULL_PRECISION)
    x = jnp.zeros((1, 64, 64, 3))
    variables = gen.init(jax.random.key(0), x)
    y = gen.apply(variables, x)
    assert y.shape == (1, 64, 64, 3)
