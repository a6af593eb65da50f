"""Batched affine warp + fused paste-back blend (cv2/kornia parity).

Replaces the reference's CPU/GPU ping-pong around geometry:
  * cv2.warpAffine crops (reference utils/inference/video_processing.py:134,163)
  * kornia.invert_affine_transform + warp_affine paste-back
    (reference utils/inference/video_processing.py:230-233)
  * cv2.invertAffineTransform image path (reference
    utils/inference/image_processing.py:69-75)

Semantics: matrices are FORWARD maps src->dst in cv2 convention (pixel
centers at integer coordinates); like cv2.warpAffine we invert
internally and sample the source at M^-1 @ dst. Bilinear taps that fall
outside the source resolve to the border value ('constant') or the
clamped edge pixel ('replicate'), matching cv2 BORDER_CONSTANT /
BORDER_REPLICATE.

Everything is pure jnp (gathers + FMAs) so XLA fuses it with neighboring
ops; `warp_and_blend` additionally fuses the two warps + mask blend of
the reference paste-back into a single pass over the output frame. A
Pallas implementation of the same contract lives in
ops/pallas/warp_kernel.py for the 1080p hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def invert_affine(m):
    """Invert (..., 2, 3) affine matrices (cv2.invertAffineTransform)."""
    a = m[..., :2]  # (...,2,2)
    t = m[..., 2]  # (...,2)
    det = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    inv_det = 1.0 / det
    inv = jnp.stack(
        [
            jnp.stack([a[..., 1, 1] * inv_det, -a[..., 0, 1] * inv_det], axis=-1),
            jnp.stack([-a[..., 1, 0] * inv_det, a[..., 0, 0] * inv_det], axis=-1),
        ],
        axis=-2,
    )
    new_t = -jnp.einsum("...ij,...j->...i", inv, t)
    return jnp.concatenate([inv, new_t[..., None]], axis=-1)


def _sample_bilinear(img, xs, ys, border: str, border_value: float):
    """img (H,W,C); xs, ys (h,w) float source coords -> (h,w,C)."""
    h_in, w_in = img.shape[0], img.shape[1]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = (xs - x0)[..., None]
    wy = (ys - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        if border == "replicate":
            yc = jnp.clip(yi, 0, h_in - 1)
            xc = jnp.clip(xi, 0, w_in - 1)
            return img[yc, xc]
        valid = (yi >= 0) & (yi < h_in) & (xi >= 0) & (xi < w_in)
        yc = jnp.clip(yi, 0, h_in - 1)
        xc = jnp.clip(xi, 0, w_in - 1)
        v = img[yc, xc]
        return jnp.where(valid[..., None], v, jnp.asarray(border_value, v.dtype))

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _dst_to_src_coords(m_fwd, out_hw):
    """Forward matrix -> per-dst-pixel source coords (h,w) x2."""
    m_inv = invert_affine(m_fwd)
    h, w = out_hw
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    sx = m_inv[0, 0] * xs + m_inv[0, 1] * ys + m_inv[0, 2]
    sy = m_inv[1, 0] * xs + m_inv[1, 1] * ys + m_inv[1, 2]
    return sx, sy


def warp_affine(
    img,
    m,
    out_hw: tuple[int, int],
    border: str = "constant",
    border_value: float = 0.0,
):
    """cv2.warpAffine parity, batched.

    img: (B,H,W,C) or (H,W,C); m: matching (B,2,3) or (2,3) forward maps.
    Returns (B,out_h,out_w,C) (or unbatched).
    """
    batched = img.ndim == 4
    if not batched:
        img, m = img[None], jnp.asarray(m)[None]

    def one(image, mat):
        sx, sy = _dst_to_src_coords(mat, out_hw)
        return _sample_bilinear(image, sx, sy, border, border_value)

    out = jax.vmap(one)(img, jnp.asarray(m, jnp.float32))
    return out if batched else out[0]


def warp_and_blend(frame, swap, mask, m_crop, present=None):
    """Fused paste-back: one pass over the full frame.

    frame: (B,H,W,C) original frames;
    swap:  (B,h,w,C) swapped crops (already at crop resolution);
    mask:  (B,h,w,1) soft blend masks in [0,1];
    m_crop: (B,2,3) the frame->crop alignment matrices (as produced by
        estimate_norm) — i.e. sampling coordinate of frame pixel p in
        crop space is M @ p, which is exactly the reference's
        "invert then warp with the inverse" composition
        (reference video_processing.py:230-233) without materializing
        intermediate full-frame warps;
    present: optional (B,) bool — frames with no face pass through.

    Returns blended frames (B,H,W,C).
    """
    h, w = frame.shape[1:3]

    def one(fr, sw, mk, mat):
        ys, xs = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32),
            jnp.arange(w, dtype=jnp.float32),
            indexing="ij",
        )
        cx = mat[0, 0] * xs + mat[0, 1] * ys + mat[0, 2]
        cy = mat[1, 0] * xs + mat[1, 1] * ys + mat[1, 2]
        sw_t = _sample_bilinear(sw, cx, cy, "constant", 0.0)
        mk_t = _sample_bilinear(mk, cx, cy, "constant", 0.0)
        return mk_t * sw_t + (1.0 - mk_t) * fr.astype(sw_t.dtype)

    out = jax.vmap(one)(frame, swap, mask, jnp.asarray(m_crop, jnp.float32))
    if present is not None:
        keep = present.reshape(-1, 1, 1, 1)
        out = jnp.where(keep, out, frame.astype(out.dtype))
    return out
