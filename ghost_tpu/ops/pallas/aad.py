"""Fused AAD modulation (Pallas): InstanceNorm-apply + mask conv +
attentional blend in ONE VMEM pass.

The AAD layer (reference network/AADLayer.py:20-38) is the generator's
hot elementwise unit: normalize h, build A = gamma_attr*h_n + beta_attr
and I = gamma_id*h_n + beta_id, blend by M = sigmoid(conv1x1(h_n)).
Under XLA this costs ~3 extra full-tensor round trips beyond the
roofline (stats pass + mask pass + modulate pass each re-read h or
h_n, and h_n/m materialize between them; measured ~11 ms net per AAD
unit at chunk 64 @256^2/64ch vs ~4.6 ms of unavoidable traffic,
scripts/profile_chain.py). This kernel reads h, gamma/beta once and
writes the blended output once; the mask 1x1 conv is a per-row
channel reduction computed in-register from the normalized tile.

Layout: everything is reshaped to (B, H*W, C) rows-of-pixels and the
grid tiles (sample, row-block) — the same 3-D block pattern as the
flash-attention kernel (ops/pallas/attention.py), which Mosaic on this
jax handles well. Per-(sample, channel) instance statistics are
computed OUTSIDE (one XLA reduction pass over h) and ride in as a tiny
(B, 2, C) operand.

Numerics: statistics in f32 (exactly `nn.layers.instance_norm`);
normalized tensor in the compute dtype; modulation math in f32
in-register; output cast to the input dtype. Matches the jnp path to
bf16 rounding (tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def aad_modulate_reference(h, gamma_attr, beta_attr, id_gb, mask_kernel,
                           mask_bias, eps: float = 1e-5):
    """Pure-jnp reference: exactly the AADLayer math
    (ghost_tpu/models/aei.py AADLayer.__call__, minus the projections)."""
    mean = jnp.mean(h, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    xc = h - mean.astype(h.dtype)
    var = jnp.mean(jnp.square(xc), axis=(1, 2), keepdims=True,
                   dtype=jnp.float32)
    hn = xc * lax.rsqrt(var + eps).astype(h.dtype)
    c = h.shape[-1]
    gamma_id = id_gb[:, None, None, :c].astype(h.dtype)
    beta_id = id_gb[:, None, None, c:].astype(h.dtype)
    m = jax.nn.sigmoid(
        jnp.einsum("bhwc,co->bhwo", hn, mask_kernel[0, 0].astype(h.dtype))
        + mask_bias.astype(h.dtype))
    a = gamma_attr * hn + beta_attr
    i = gamma_id * hn + beta_id
    return (1.0 - m) * a + m * i


def _kernel(h_ref, ga_ref, bb_ref, st_ref, id_ref, mw_ref, mb_ref, o_ref):
    x = h_ref[0]                                   # (br, C) compute dtype
    mu = st_ref[0, 0]                              # (C,) f32
    rs = st_ref[0, 1]
    xn = (x - mu.astype(x.dtype)) * rs.astype(x.dtype)
    xf = xn.astype(jnp.float32)
    mw = mw_ref[0].astype(jnp.float32)             # (C,)
    mpre = jnp.sum(xf * mw[None, :], axis=-1, keepdims=True) \
        + mb_ref[0, 0]
    m = jax.nn.sigmoid(mpre)                       # (br, 1)
    ga = ga_ref[0].astype(jnp.float32)
    bb = bb_ref[0].astype(jnp.float32)
    gi = id_ref[0, 0][None, :]
    bi = id_ref[0, 1][None, :]
    out = (1.0 - m) * (ga * xf + bb) + m * (gi * xf + bi)
    o_ref[0] = out.astype(o_ref.dtype)


def aad_modulate(h, gamma_attr, beta_attr, id_gb, mask_kernel, mask_bias,
                 eps: float = 1e-5, block_rows: int = 1024,
                 interpret: bool | None = None):
    """Fused AAD modulation.

    h, gamma_attr, beta_attr: (B, H, W, C); id_gb: (B, 2C) packed
    [gamma_id | beta_id]; mask_kernel: (1, 1, C, 1) (the 1x1 conv
    kernel as stored in params); mask_bias: (1,).

    interpret=None auto-selects interpreter mode off-TPU (CPU tests).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, hh, ww, c = h.shape
    rows = hh * ww
    # fit the row block like the sibling kernels (attention._fit_block,
    # layer_norm._fit_rows) instead of asserting: non-multiple H*W
    # (e.g. 48x32 = 1536 rows under the 1024 default) fits down to the
    # largest sublane-aligned divisor. Power-of-two maps (every swap-
    # path shape) fit to exactly min(block_rows, rows) as before.
    from ghost_tpu.ops.pallas.tiling import (fit_divisor,
                                             largest_divisor_below)

    br = fit_divisor(block_rows, rows, 8)
    if br is None:
        br = largest_divisor_below(rows, min(block_rows, 7))

    mean = jnp.mean(h, axis=(1, 2), dtype=jnp.float32)       # (B, C)
    xc = h - mean[:, None, None, :].astype(h.dtype)
    var = jnp.mean(jnp.square(xc), axis=(1, 2), dtype=jnp.float32)
    stats = jnp.stack([mean, lax.rsqrt(var + eps)], axis=1)  # (B, 2, C)
    idgb = jnp.stack([id_gb[:, :c], id_gb[:, c:]], axis=1).astype(jnp.float32)

    h2 = h.reshape(b, rows, c)
    ga2 = gamma_attr.reshape(b, rows, c)
    bb2 = beta_attr.reshape(b, rows, c)
    mw = mask_kernel.reshape(1, c)
    mb = mask_bias.reshape(1, 1).astype(jnp.float32)

    out = pl.pallas_call(
        _kernel,
        grid=(b, rows // br),
        in_specs=[
            pl.BlockSpec((1, br, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, br, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, br, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, br, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rows, c), h.dtype),
        interpret=interpret,
    )(h2, ga2, bb2, stats, idgb, mw, mb)
    return out.reshape(b, hh, ww, c)
