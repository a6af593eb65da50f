"""Pallas kernels vs jnp golden references (interpret mode on CPU) —
the reference's kernel-vs-framework test pattern (reference
apex/apex/contrib/test/fmha/test_fmha.py, layer_norm/test_fast_layer_norm.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ghost_tpu.ops.pallas.attention import (
    flash_attention,
    flash_attention_reference,
)
from ghost_tpu.ops.pallas.layer_norm import fused_layer_norm, layer_norm_reference


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("seq,heads,dim", [(256, 2, 64), (128, 1, 128)])
def test_flash_attention_forward(rng, causal, seq, heads, dim):
    q = rng.standard_normal((1, heads, seq, dim), dtype=np.float32)
    k = rng.standard_normal((1, heads, seq, dim), dtype=np.float32)
    v = rng.standard_normal((1, heads, seq, dim), dtype=np.float32)
    out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          causal, None, 128, 128, True)
    ref = flash_attention_reference(jnp.asarray(q), jnp.asarray(k),
                                    jnp.asarray(v), causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_flash_attention_grad(rng):
    q = jnp.asarray(rng.standard_normal((1, 1, 128, 64), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((1, 1, 128, 64), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((1, 1, 128, 64), dtype=np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, False, None, 128, 128, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(flash_attention_reference(q, k, v) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_fused_layer_norm_forward(rng):
    x = rng.standard_normal((64, 256), dtype=np.float32)
    gamma = rng.standard_normal(256, dtype=np.float32)
    beta = rng.standard_normal(256, dtype=np.float32)
    out = fused_layer_norm(jnp.asarray(x), jnp.asarray(gamma),
                           jnp.asarray(beta), 1e-5, 32, True)
    ref = layer_norm_reference(jnp.asarray(x), jnp.asarray(gamma),
                               jnp.asarray(beta))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_layer_norm_grad(rng):
    x = jnp.asarray(rng.standard_normal((32, 128), dtype=np.float32))
    gamma = jnp.asarray(rng.standard_normal(128, dtype=np.float32))
    beta = jnp.asarray(rng.standard_normal(128, dtype=np.float32))

    def loss_fused(x, g, b):
        return jnp.sum(jnp.sin(fused_layer_norm(x, g, b, 1e-5, 16, True)))

    def loss_ref(x, g, b):
        return jnp.sum(jnp.sin(layer_norm_reference(x, g, b)))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, gamma, beta)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_fused_layer_norm_nd_input(rng):
    x = rng.standard_normal((2, 8, 8, 64), dtype=np.float32)
    gamma = np.ones(64, np.float32)
    beta = np.zeros(64, np.float32)
    out = fused_layer_norm(jnp.asarray(x), jnp.asarray(gamma),
                           jnp.asarray(beta), 1e-5, 128, True)
    ref = layer_norm_reference(jnp.asarray(x), jnp.asarray(gamma),
                               jnp.asarray(beta))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_flash_attention_grad_causal(rng):
    q = jnp.asarray(rng.standard_normal((1, 2, 256, 64), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((1, 2, 256, 64), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2, 256, 64), dtype=np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, True, None, 128, 128, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(flash_attention_reference(q, k, v, True) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)
