"""Fused paste-back blend as a Pallas TPU kernel.

The paste-back hot loop (reference utils/inference/video_processing.py:
225-235: invert affine, warp swap, warp mask, blend, per frame per
identity on alternating devices) is the last HBM-bound stage of the
swap pipeline. The pure-jnp version (ops/warp.py) lowers to gathers
over the whole frame; this kernel instead tiles the OUTPUT frame and,
per tile, computes the source coordinates analytically — the crop is
small enough (224x224x4ch) to sit in VMEM for the whole kernel, so each
output tile does: affine -> in-crop bilinear taps from VMEM -> blend
with the frame tile streamed from HBM -> write. One pass over the
frame, zero intermediate full-frame buffers.

Grid: (B, H/tile). Block shapes: frame rows (tile, W, 3); swap+mask are
broadcast blocks (whole crop per program).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 128


def _pasteback_kernel(m_ref, frame_ref, swapmask_ref, out_ref, *,
                      tile_h: int, crop: int):
    """m_ref: (B, 8) [a,b,tx,c,d,ty,present,_] in SMEM (full array,
    indexed by program id); frame_ref/out_ref: (1, tile_h, W, 3);
    swapmask_ref: (1, crop, crop, 4)."""
    frame = frame_ref[0].astype(jnp.float32)  # (tile_h, W, 3)
    w = frame.shape[1]
    bi = pl.program_id(0)
    a = m_ref[bi, 0]
    b = m_ref[bi, 1]
    tx = m_ref[bi, 2]
    c = m_ref[bi, 3]
    d = m_ref[bi, 4]
    ty = m_ref[bi, 5]
    present = m_ref[bi, 6]

    row0 = pl.program_id(1) * tile_h
    ys = (row0 + jax.lax.broadcasted_iota(jnp.float32, (tile_h, w), 0))
    xs = jax.lax.broadcasted_iota(jnp.float32, (tile_h, w), 1)
    # crop coordinates of each output pixel: M @ (x, y, 1)
    cx = a * xs + b * ys + tx
    cy = c * xs + d * ys + ty

    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    wx = (cx - x0)[..., None]
    wy = (cy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # flatten the crop to 2-D and gather with 1-D indices — the only
    # gather pattern Mosaic lowers (2-D operand, flat index vector)
    sm = swapmask_ref[0].astype(jnp.float32).reshape(crop * crop, 4)
    th, w_ = tile_h, w

    def tap(yi, xi):
        valid = (yi >= 0) & (yi < crop) & (xi >= 0) & (xi < crop)
        yc = jnp.clip(yi, 0, crop - 1)
        xc = jnp.clip(xi, 0, crop - 1)
        lin = (yc * crop + xc).reshape(th * w_)
        vals = jnp.take(sm, lin, axis=0).reshape(th, w_, 4)
        return jnp.where(valid[..., None], vals, 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    blended = top * (1 - wy) + bot * wy  # (tile_h, W, 4)

    swap_t = blended[..., :3]
    mask_t = blended[..., 3:4] * present
    out = mask_t * swap_t + (1.0 - mask_t) * frame
    out_ref[0] = jnp.clip(out, 0.0, 255.0).astype(out_ref.dtype)


def pasteback_pallas(frame, swap, mask, m_crop, present=None,
                     tile_h: int = TILE_H, interpret: bool = False):
    """Fused paste-back (same contract as ops.warp.warp_and_blend).

    frame (B,H,W,3) uint8/float; swap (B,cs,cs,3) float [0,255];
    mask (B,cs,cs,1) float [0,1]; m_crop (B,2,3) frame->crop maps.
    """
    b, h, w, _ = frame.shape
    crop = swap.shape[1]
    assert h % tile_h == 0 or h < tile_h, "pad frames to a tile multiple"
    th = min(tile_h, h)

    # pack per-image scalars: [a,b,tx,c,d,ty,present,pad]
    m = jnp.asarray(m_crop, jnp.float32).reshape(b, 6)
    pres = (jnp.ones((b,), jnp.float32) if present is None
            else present.astype(jnp.float32))
    scalars = jnp.concatenate(
        [m, pres[:, None], jnp.zeros((b, 1), jnp.float32)], axis=1
    )
    swapmask = jnp.concatenate(
        [swap.astype(jnp.float32), mask.astype(jnp.float32)], axis=-1
    )

    kernel = functools.partial(_pasteback_kernel, tile_h=th, crop=crop)
    out = pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((b, 8), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, th, w, 3), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, crop, crop, 4), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, 3), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, 3), frame.dtype),
        interpret=interpret,
    )(scalars, frame, swapmask)
    return out
