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


def test_fit_block_divides():
    """Tuned large defaults must fit down to any lane-quantum seqlen
    exactly as the old 128 defaults did."""
    from ghost_tpu.ops.pallas.attention import _fit_block
    from ghost_tpu.ops.pallas.layer_norm import _fit_rows

    for s in (128, 256, 384, 512, 640, 1024, 1920, 4096, 2568):
        for pref in (128, 512, 2048):
            b = _fit_block(pref, s)
            # never exceeds pref: s=2568 has no 128-quantum divisor and
            # must fall back to a sublane-aligned one (24), not a
            # whole-sequence VMEM-scale block
            assert s % b == 0 and b <= max(pref, 1), (s, pref, b)
    import pytest

    with pytest.raises(ValueError):
        _fit_block(512, 2561)  # odd seq: loud error, not an opaque 500
    for rows in (8, 120, 1000, 8192, 36, 2049):
        for pref in (128, 1024):
            b = _fit_rows(pref, rows)
            assert rows % b == 0 and b <= pref, (rows, pref, b)
    # VMEM cap: wide hidden shrinks the fitted row block so (br, h)
    # f32 tiles stay within budget (h=8192 -> br<=128)
    assert _fit_rows(1024, 8192, h=8192) <= 128
    assert _fit_rows(1024, 8192, h=1024) == 1024  # tuned default kept


def test_flash_attention_odd_seq_interpret(rng):
    """Seqlen 640 (not a multiple of the 512/2048 defaults) routes
    through _fit_block and still matches the reference."""
    q = rng.standard_normal((1, 1, 640, 64), dtype=np.float32)
    out = flash_attention(jnp.asarray(q), jnp.asarray(q), jnp.asarray(q),
                          False, None, 512, 2048, True)
    ref = flash_attention_reference(jnp.asarray(q), jnp.asarray(q),
                                    jnp.asarray(q), False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_flash_attention_causal_unequal_blocks(rng):
    """Causal with fitted bq=512/bk=1280 (S=2560 under the tuned
    512/2048 defaults): the k-block upper bound must be
    cdiv((q_idx+1)*bq, bk) — the old q_idx*bq//bk + cdiv(bq, bk)
    formula skipped in-window K/V blocks whenever bq does not divide
    bk, silently truncating the softmax (fwd) and dq (bwd)."""
    q = rng.standard_normal((1, 1, 2560, 64)).astype(np.float32) * 0.5
    k = rng.standard_normal((1, 1, 2560, 64)).astype(np.float32) * 0.5
    v = rng.standard_normal((1, 1, 2560, 64)).astype(np.float32)
    out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          True, None, 512, 2048, True)
    ref = flash_attention_reference(jnp.asarray(q), jnp.asarray(k),
                                    jnp.asarray(v), True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)

    def f_fl(q):
        return jnp.sum(flash_attention(q, jnp.asarray(k), jnp.asarray(v),
                                       True, None, 512, 2048, True)
                       .astype(jnp.float32) ** 2)

    def f_ref(q):
        return jnp.sum(flash_attention_reference(
            q, jnp.asarray(k), jnp.asarray(v), True)
            .astype(jnp.float32) ** 2)

    dq = jax.grad(f_fl)(jnp.asarray(q))
    dq_ref = jax.grad(f_ref)(jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref),
                               rtol=5e-3, atol=5e-3)


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


# ---------------------------------------------------------------------------
# Fused AAD modulate (ops/pallas/aad.py)
# ---------------------------------------------------------------------------


def test_aad_modulate_matches_reference(rng):
    from ghost_tpu.ops.pallas.aad import aad_modulate, aad_modulate_reference

    B, H, W, C = 2, 8, 16, 8
    h = jnp.asarray(rng.standard_normal((B, H, W, C), dtype=np.float32))
    ga = jnp.asarray(rng.standard_normal((B, H, W, C), dtype=np.float32))
    bb = jnp.asarray(rng.standard_normal((B, H, W, C), dtype=np.float32))
    idgb = jnp.asarray(rng.standard_normal((B, 2 * C), dtype=np.float32))
    mk = jnp.asarray(rng.standard_normal((1, 1, C, 1), dtype=np.float32))
    mb = jnp.asarray(rng.standard_normal((1,), dtype=np.float32))

    ref = aad_modulate_reference(h, ga, bb, idgb, mk, mb)
    out = aad_modulate(h, ga, bb, idgb, mk, mb, block_rows=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # bf16 path (the production dtype) stays within rounding noise
    cd = jnp.bfloat16
    ref16 = aad_modulate_reference(h.astype(cd), ga.astype(cd),
                                   bb.astype(cd), idgb, mk, mb)
    out16 = aad_modulate(h.astype(cd), ga.astype(cd), bb.astype(cd),
                         idgb, mk, mb, block_rows=32)
    np.testing.assert_allclose(np.asarray(out16, np.float32),
                               np.asarray(ref16, np.float32),
                               rtol=0.1, atol=0.1)


def test_aad_modulate_fits_non_multiple_rows(rng):
    """H*W that the block_rows default does not divide (48x32 = 1536)
    must FIT (largest sublane-aligned divisor) instead of asserting —
    the hardening the sibling attention/LN kernels already have."""
    from ghost_tpu.ops.pallas.aad import aad_modulate, aad_modulate_reference

    B, H, W, C = 1, 48, 32, 8
    h = jnp.asarray(rng.standard_normal((B, H, W, C), dtype=np.float32))
    ga = jnp.asarray(rng.standard_normal((B, H, W, C), dtype=np.float32))
    bb = jnp.asarray(rng.standard_normal((B, H, W, C), dtype=np.float32))
    idgb = jnp.asarray(rng.standard_normal((B, 2 * C), dtype=np.float32))
    mk = jnp.asarray(rng.standard_normal((1, 1, C, 1), dtype=np.float32))
    mb = jnp.asarray(rng.standard_normal((1,), dtype=np.float32))

    ref = aad_modulate_reference(h, ga, bb, idgb, mk, mb)
    out = aad_modulate(h, ga, bb, idgb, mk, mb, block_rows=1024)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_aad_layer_fused_equals_unfused(rng):
    """AADLayer(fused=True) == AADLayer(fused=False) on the SAME params
    (identical param tree by construction — converters untouched)."""
    from ghost_tpu.core.precision import FULL_PRECISION
    from ghost_tpu.models.aei import AADLayer

    B, H, W, C = 2, 8, 8, 8
    h = jnp.asarray(rng.standard_normal((B, H, W, C), dtype=np.float32))
    za = jnp.asarray(rng.standard_normal((B, H, W, C), dtype=np.float32))
    z = jnp.asarray(rng.standard_normal((B, 512), dtype=np.float32))

    plain = AADLayer(C, FULL_PRECISION)
    fused = AADLayer(C, FULL_PRECISION, fused=True)
    v1 = plain.init(jax.random.key(0), h, za, z)
    v2 = fused.init(jax.random.key(0), h, za, z)
    assert jax.tree.structure(v1) == jax.tree.structure(v2)
    for a, b in zip(jax.tree.leaves(v1), jax.tree.leaves(v2)):
        assert a.shape == b.shape

    out_plain = plain.apply(v1, h, za, z)
    out_fused = fused.apply(v1, h, za, z)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_plain),
                               rtol=1e-5, atol=1e-5)


def test_aad_generator_fused_gating_equals_unfused(rng):
    """AADGenerator(fused_aad=True) routes only the C>=128, k>=4 blocks
    through the Pallas kernel (interpret mode here) and must reproduce
    the jnp generator on the same params."""
    from ghost_tpu.core.precision import FULL_PRECISION
    from ghost_tpu.models.aei import AADGenerator, _scaled, _AAD_CATTR_UNET

    width = 0.25  # blk5 cin=128 stays fused-gated; finer blocks jnp
    plain = AADGenerator("unet", 512, 1, FULL_PRECISION, width)
    fused = AADGenerator("unet", 512, 1, FULL_PRECISION, width,
                         fused_aad=True)

    z = jnp.asarray(rng.standard_normal((1, 512), dtype=np.float32))
    attrs = []
    res = 2
    for k in range(8):
        ca = _scaled(_AAD_CATTR_UNET[k], width)
        attrs.append(jnp.asarray(
            rng.standard_normal((1, res, res, ca), dtype=np.float32)))
        if k < 7:
            res *= 2
    attrs = tuple(attrs)

    v = plain.init(jax.random.key(0), attrs, z)
    v2 = fused.init(jax.random.key(0), attrs, z)
    assert jax.tree.structure(v) == jax.tree.structure(v2)

    out_plain = plain.apply(v, attrs, z)
    out_fused = fused.apply(v, attrs, z)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_plain),
                               rtol=1e-4, atol=1e-4)
