"""Fused LayerNorm (Pallas) with custom VJP — apex fused_layer_norm parity.

The reference builds two CUDA LayerNorm stacks (reference
apex/csrc/layer_norm_cuda_kernel.cu:279,403 Welford fwd/bwd and the
hidden<=12k "fast" variant apex/apex/contrib/csrc/layer_norm/). XLA
already fuses a jnp layernorm well; this kernel exists for (a) apex
capability parity with a hand-tiled implementation and (b) epilogue
fusion freedom (residual add / activation can be folded into the same
VMEM pass). Forward computes mean/rstd per row and normalizes in one
VMEM pass; backward uses the saved (mean, rstd) with the standard
three-term gradient, also as one Pallas pass per row-block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def layer_norm_reference(x, gamma, beta, eps: float = 1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * gamma + beta


def _fwd_kernel(x_ref, g_ref, b_ref, o_ref, mean_ref, rstd_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = (x - mean) * rstd
    o_ref[:] = (y * g_ref[:].astype(jnp.float32)
                + b_ref[:].astype(jnp.float32)).astype(o_ref.dtype)
    mean_ref[:] = mean
    rstd_ref[:] = rstd


def _bwd_kernel(x_ref, g_ref, mean_ref, rstd_ref, dy_ref, dx_ref,
                dg_ref, db_ref):
    x = x_ref[:].astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    gamma = g_ref[:].astype(jnp.float32)
    mean = mean_ref[:]
    rstd = rstd_ref[:]
    xhat = (x - mean) * rstd
    wdy = dy * gamma
    c1 = jnp.mean(xhat * wdy, axis=-1, keepdims=True)
    c2 = jnp.mean(wdy, axis=-1, keepdims=True)
    dx_ref[:] = ((wdy - c2 - xhat * c1) * rstd).astype(dx_ref.dtype)
    # per-block partial reductions for dgamma/dbeta (grid accumulates)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dg_ref[:] = jnp.zeros_like(dg_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dg_ref[:] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    db_ref[:] += jnp.sum(dy, axis=0, keepdims=True)


# per-buffer VMEM budget for fitting the row block: the backward holds
# three (br, h) f32 blocks (x, dy, dx) at once, so 4 MB/buffer keeps
# the total well under the ~16 MB VMEM even at wide hidden sizes. At
# the tuned h=1024 this leaves the measured-best br=1024 untouched;
# h=8192 caps back to br=128 (the old default) instead of asking
# Mosaic for 32 MB tiles.
_VMEM_BYTES_PER_BUF = 4 << 20


def _fit_rows(pref: int, rows: int, quantum: int = 8,
              h: int | None = None) -> int:
    """Largest row block <= pref dividing rows (sublane steps, capped
    by the VMEM budget when `h` is given), so any row count that
    worked under the old 128 default keeps working under the tuned
    larger one."""
    from ghost_tpu.ops.pallas.tiling import fit_divisor, largest_divisor_below

    if h is not None:
        cap = max(quantum, (_VMEM_BYTES_PER_BUF // (4 * h)) // quantum
                  * quantum)
        pref = min(pref, cap)
    br = fit_divisor(pref, rows, quantum)
    if br is None:
        # no sublane-aligned divisor (odd row counts): any divisor
        # beats a whole-array block; 1 always divides
        br = largest_divisor_below(rows, min(pref, quantum - 1))
    return br


def _forward(x, gamma, beta, eps, block_rows, interpret):
    orig_shape = x.shape
    h = x.shape[-1]
    rows = x.size // h
    x2 = x.reshape(rows, h)
    br = _fit_rows(block_rows, rows, h=h)
    assert rows % br == 0, "row count must divide block_rows"

    out, mean, rstd = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(rows // br,),
        in_specs=[
            pl.BlockSpec((br, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((br, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, h), x.dtype),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x2, gamma.reshape(1, h), beta.reshape(1, h))
    return out.reshape(orig_shape), (x2, mean, rstd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_layer_norm(x, gamma, beta, eps: float = 1e-5,
                     block_rows: int = 1024, interpret: bool = False):
    """LayerNorm over the last axis with saved-stat backward.

    block_rows=1024 measured best on v5e (~10% over 128 at 8192x1024,
    fwd and bwd; both sit at the same memory wall as XLA's fused LN —
    the kernel's value is the guaranteed single pass + saved stats)."""
    out, _ = _forward(x, gamma, beta, eps, block_rows, interpret)
    return out


def _ln_fwd(x, gamma, beta, eps, block_rows, interpret):
    out, (x2, mean, rstd) = _forward(x, gamma, beta, eps, block_rows, interpret)
    return out, (x2, gamma, mean, rstd, x.shape)


def _ln_bwd(eps, block_rows, interpret, res, g):
    x2, gamma, mean, rstd, orig_shape = res
    rows, h = x2.shape
    br = _fit_rows(block_rows, rows, h=h)
    dy = g.reshape(rows, h)

    dx, dgamma, dbeta = pl.pallas_call(
        _bwd_kernel,
        grid=(rows // br,),
        in_specs=[
            pl.BlockSpec((br, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((br, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, h), dy.dtype),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
        ],
        interpret=interpret,
    )(x2, gamma.reshape(1, h), mean, rstd, dy)
    return (dx.reshape(orig_shape), dgamma[0].astype(gamma.dtype),
            dbeta[0].astype(gamma.dtype))


fused_layer_norm.defvjp(_ln_fwd, _ln_bwd)
