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
the reference paste-back into a single pass over the output frame. The
1080p hot paths use the similarity-decomposed variants below (MXU tent
matmuls + a small rotation resample) — measured ~25x faster than
full-frame gathers on v5e.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


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


def _sample_bilinear_batch(imgs, xs, ys, border: str, border_value: float):
    """Batched bilinear sampling via flat linear-index takes.

    imgs (B,H,W,C); xs, ys (B, ...) float source coords in each image's
    own frame -> (B, ..., C).

    TPU note: XLA lowers 2-D advanced indexing (`img[yi, xi]`) to a slow
    row-wise gather (~70x slower measured); a single `jnp.take` over the
    flattened (B*H*W, C) array with precomputed linear indices hits the
    fast gather path.
    """
    b, h_in, w_in, c = imgs.shape
    out_shape = xs.shape  # (B, ...)
    flat = imgs.reshape(b * h_in * w_in, c)
    bidx = jnp.arange(b, dtype=jnp.int32).reshape(
        (b,) + (1,) * (xs.ndim - 1)
    )

    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = (xs - x0)[..., None]
    wy = (ys - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        yc = jnp.clip(yi, 0, h_in - 1)
        xc = jnp.clip(xi, 0, w_in - 1)
        lin = (bidx * h_in + yc) * w_in + xc
        v = jnp.take(flat, lin.reshape(-1), axis=0).reshape(*out_shape, c)
        if border == "replicate":
            return v
        valid = (yi >= 0) & (yi < h_in) & (xi >= 0) & (xi < w_in)
        return jnp.where(valid[..., None], v,
                         jnp.asarray(border_value, v.dtype))

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _batched_dst_to_src(m_fwd, out_hw):
    """(B,2,3) forward matrices -> per-dst-pixel source coords (B,h,w) x2."""
    m_inv = invert_affine(m_fwd)  # (B,2,3)
    h, w = out_hw
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    sx = (m_inv[:, 0, 0, None, None] * xs + m_inv[:, 0, 1, None, None] * ys
          + m_inv[:, 0, 2, None, None])
    sy = (m_inv[:, 1, 0, None, None] * xs + m_inv[:, 1, 1, None, None] * ys
          + m_inv[:, 1, 2, None, None])
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
    m = jnp.asarray(m, jnp.float32)
    sx, sy = _batched_dst_to_src(m, out_hw)
    out = _sample_bilinear_batch(img, sx, sy, border, border_value)
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
    m = jnp.asarray(m_crop, jnp.float32)
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    cx = (m[:, 0, 0, None, None] * xs + m[:, 0, 1, None, None] * ys
          + m[:, 0, 2, None, None])
    cy = (m[:, 1, 0, None, None] * xs + m[:, 1, 1, None, None] * ys
          + m[:, 1, 2, None, None])
    # sample swap+mask together: one gather of 4 channels
    sm = jnp.concatenate([swap, mask.astype(swap.dtype)], axis=-1)
    sm_t = _sample_bilinear_batch(sm, cx, cy, "constant", 0.0)
    sw_t = sm_t[..., :3]
    mk_t = sm_t[..., 3:4]
    out = mk_t * sw_t + (1.0 - mk_t) * frame.astype(sw_t.dtype)
    if present is not None:
        keep = present.reshape(-1, 1, 1, 1)
        out = jnp.where(keep, out, frame.astype(out.dtype))
    return out


# ---------------------------------------------------------------------------
# Similarity-decomposed paste-back: MXU matmuls instead of full-frame gathers
# ---------------------------------------------------------------------------


def _tent_matrix(positions, grid: int):
    """positions (B, N) float -> (B, N, grid) linear-interp weights.

    Row r is the 2-tap tent kernel centered at positions[r]; rows whose
    position falls outside [0, grid-1] get (partially) zero weight, so
    out-of-window samples decay to 0 exactly like a zero border.
    """
    k = jnp.arange(grid, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(positions[..., None] - k))


def _sample_nearest_batch(imgs, xs, ys):
    """Single-tap nearest sampling via flat linear-index take.

    One gather tap per output pixel instead of bilinear's four — the
    gather is the measured bottleneck of the similarity warps on TPU
    (~10 ns/tap), so pairing nearest taps with a subpix-oversampled
    source grid is both faster AND more accurate than bilinear taps on
    a coarse grid."""
    b, h_in, w_in, c = imgs.shape
    out_shape = xs.shape
    flat = imgs.reshape(b * h_in * w_in, c)
    bidx = jnp.arange(b, dtype=jnp.int32).reshape((b,) + (1,) * (xs.ndim - 1))
    xi = jnp.clip(jnp.round(xs).astype(jnp.int32), 0, w_in - 1)
    yi = jnp.clip(jnp.round(ys).astype(jnp.int32), 0, h_in - 1)
    lin = (bidx * h_in + yi) * w_in + xi
    v = jnp.take(flat, lin.reshape(-1), axis=0).reshape(*out_shape, c)
    valid = (jnp.round(xs) >= 0) & (jnp.round(xs) < w_in) & \
        (jnp.round(ys) >= 0) & (jnp.round(ys) < h_in)
    return jnp.where(valid[..., None], v, jnp.asarray(0.0, v.dtype))


def warp_affine_similarity(frames, m, out_size: int, grid: int | None = None,
                           compute_dtype=jnp.bfloat16, subpix: int = 1,
                           interp: str = "bilinear"):
    """Crop extraction for SIMILARITY matrices, gather-free on the frame.

    The inverse of a similarity M = s*R + t is itself a similarity:
    M^-1 p = (1/s) R^T (p - t). Factoring through q = R^T p_crop (a pure
    rotation of the CROP coordinates), the frame sampling position is
    axis-aligned in q: f(q) = (1/s) q + t2 with t2 = -(1/s) R^T t. So:

      1. evaluate the axis-aligned part as two dense tent-matrix einsums
         over the frame (the tent rows ARE bilinear interpolation, and
         positions outside [0, H-1] decay exactly like a zero border);
      2. resample the small (grid x grid) intermediate under the pure
         rotation R^T — a gather over a table ~30x smaller than the
         frame (the expensive direction on TPU is gathering from the
         large frame, measured in ops/warp.py header notes).

    This is the crop-direction mirror of `warp_and_blend_similarity`
    (same window-coverage argument: grid/2 >= out_size/sqrt(2) makes the
    centered q-window contain the rotated crop for every angle).

    frames: (B, H, W, C); m: (B, T, 2, 3) forward frame->crop similarity
    matrices — T faces per frame share the frame WITHOUT replicating it
    (the einsum contracts each frame against T row matrices).
    Returns (B*T, out_size, out_size, C) float32 crops, frame-major like
    jnp.repeat(frames, T) would produce.

    Numerics: one extra bilinear resample versus cv2.warpAffine — for
    pure-scale matrices the intermediate lands on exact grid points and
    the result matches warp_affine to compute_dtype precision
    (tests/test_similarity_crops.py). Under rotation the intermediate
    quantizes sample positions to the q-grid (spacing 1 crop px);
    `subpix` oversamples the q-grid by that integer factor, shrinking
    the interpolation error ~quadratically at linear einsum cost — use
    subpix=2 on quality-bearing paths. Near the frame border the 1-px
    constant-border transition of cv2 widens to ~1/s px (the tent decay
    happens in frame space before the rotation resample).
    """
    b, h, w, c = frames.shape
    m = jnp.asarray(m, jnp.float32)
    if m.ndim == 3:
        m = m[:, None]
    t_faces = m.shape[1]
    if grid is None:
        grid = int(np.ceil(out_size * np.sqrt(2) / 32.0)) * 32
    assert grid / 2 >= out_size / 2 * np.sqrt(2) - 1e-3, (grid, out_size)

    a = m[..., 0, 0]  # (B,T)
    bb = m[..., 1, 0]
    t = m[..., :, 2]  # (B,T,2) [tx, ty]
    s = jnp.sqrt(a * a + bb * bb)
    inv_s = 1.0 / jnp.maximum(s, 1e-12)
    cos = a * inv_s
    sin = bb * inv_s

    q0 = (out_size - grid) / 2.0  # window centered on the crop
    # rotate about the CROP CENTER pc, not the origin: q = pc + R^T(p-pc).
    # Only then does the centered window cover the rotated crop for
    # every angle (|q - pc| <= (out/2)*sqrt(2) < grid/2); rotation about
    # the origin sweeps q across [-out/sqrt(2), out*sqrt(2)] over angles.
    pc = (out_size - 1) / 2.0
    # frame position of q: f(q) = (1/s) R^T (p - t) with p = pc + R(q-pc)
    #                    = (1/s) q + (1/s) (R^T(pc - t) - pc)
    t2x = ((cos * (pc - t[..., 0]) + sin * (pc - t[..., 1])) - pc) * inv_s
    t2y = ((-sin * (pc - t[..., 0]) + cos * (pc - t[..., 1])) - pc) * inv_s

    n_q = grid * subpix
    qs = jnp.arange(n_q, dtype=jnp.float32) / subpix + q0  # (g*subpix,)
    # frame positions of the q-grid lines (B,T,g*subpix)
    row_pos = inv_s[..., None] * qs + t2y[..., None]  # into H
    col_pos = inv_s[..., None] * qs + t2x[..., None]  # into W
    row_w = _tent_matrix(row_pos, h).astype(compute_dtype)  # (B,T,g,H)
    col_w = _tent_matrix(col_pos, w).astype(compute_dtype)  # (B,T,g,W)

    fr = frames.astype(compute_dtype)
    # contract W first: the (B,T,H,n_q,C) intermediate is smaller than
    # (B,T,n_q,W,C) whenever n_q < W, and the second contraction is
    # then over H < W — less HBM and fewer FLOPs for the same result
    # (separable linear resamples commute)
    inter = jnp.einsum("btkw,bhwc->bthkc", col_w, fr,
                       preferred_element_type=jnp.float32)
    inter = inter.astype(compute_dtype)
    inter = jnp.einsum("btgh,bthkc->btgkc", row_w, inter,
                       preferred_element_type=jnp.float32)
    inter = inter.astype(compute_dtype)
    # inter[b,t,j,k,c] = image at q = (q0+k/sub, q0+j/sub)  (k~x, j~y)
    inter = inter.reshape(b * t_faces, n_q, n_q, c)

    # rotation resample: crop[y,x] = inter at (q(p) - q0)*subpix, q = R^T p
    ys, xs = jnp.meshgrid(
        jnp.arange(out_size, dtype=jnp.float32),
        jnp.arange(out_size, dtype=jnp.float32),
        indexing="ij",
    )
    cosf = cos.reshape(-1)[:, None, None]
    sinf = sin.reshape(-1)[:, None, None]
    qx = (cosf * (xs - pc) + sinf * (ys - pc) + pc - q0) * subpix
    qy = (-sinf * (xs - pc) + cosf * (ys - pc) + pc - q0) * subpix
    if interp == "nearest":
        out = _sample_nearest_batch(inter, qx, qy)
    else:
        out = _sample_bilinear_batch(inter, qx, qy, "constant", 0.0)
    return out.astype(jnp.float32)


def warp_and_blend_similarity(frame, swap, mask, m_crop, present=None,
                              grid: int = 320, rot_subpix: int = 1,
                              rot_interp: str = "bilinear"):
    """Paste-back for SIMILARITY alignment matrices, gather-free on the
    full frame.

    Exploits that estimate_norm produces exact similarities
    A = s*R(theta): p_crop = A p_frame + t factors through an
    axis-aligned intermediate u = pc + R^-1 (A p_frame + t - pc) with
    p_crop = pc + R (u - pc), where pc is the crop center — rotating
    about the crop center (not the origin) is what makes the centered
    u-window cover the crop for EVERY angle. So:
      1. resample the crop under the pure rotation R onto a static
         (grid x grid) u-window (a small gather: grid^2 pixels per face
         instead of H*W per frame — ~30x fewer);
      2. evaluate the axis-aligned part as two dense tent-matrix
         matmuls RowW @ crop_rot @ ColW^T on the MXU (the tent rows ARE
         the bilinear interpolation);
      3. blend with the frame.

    The u-window [u0, u0+grid) is centered on the crop; with
    grid/2 >= crop/sqrt(2) (320/2 = 160 > 224*0.7071 = 158.4) the window
    contains the rotated crop for EVERY angle, so coverage is exact.
    Measured ~25x faster than `warp_and_blend` at 1080p.

    Numerics: one extra bilinear resample versus the reference's single
    warp — a sub-pixel low-pass difference the blend mask absorbs
    (tested against warp_and_blend on smooth content).
    """
    b, h, w, _ = frame.shape
    crop = swap.shape[1]
    m = jnp.asarray(m_crop, jnp.float32)
    a = m[:, 0, 0]
    bb = m[:, 1, 0]
    t = m[:, :, 2]  # (B,2) [tx, ty] in crop units

    s = jnp.sqrt(a * a + bb * bb)
    cos = a / jnp.maximum(s, 1e-12)
    sin = bb / jnp.maximum(s, 1e-12)

    u0 = (crop - grid) / 2.0  # center the window on the crop
    pc = (crop - 1) / 2.0  # rotation center: the crop center

    # ---- step 1: rotation resample of [swap|mask] onto the u-grid
    uu, vv = jnp.meshgrid(
        jnp.arange(grid, dtype=jnp.float32) + u0 - pc,
        jnp.arange(grid, dtype=jnp.float32) + u0 - pc,
        indexing="xy",
    )  # uu: x-coords relative to pc (grid,grid), vv: y-coords
    # p_crop = pc + R (u - pc):
    #   x_c = pc + cos*(u-pc) - sin*(v-pc); y_c = pc + sin*(u-pc) + cos*(v-pc)
    xc = cos[:, None, None] * uu - sin[:, None, None] * vv + pc
    yc = sin[:, None, None] * uu + cos[:, None, None] * vv + pc
    sm = jnp.concatenate([swap, mask.astype(swap.dtype)], axis=-1)
    if rot_subpix > 1 or rot_interp == "nearest":
        # gathers cost ~10 ns/tap on this TPU: nearest taps from an
        # einsum-upsampled source beat 4-tap bilinear from the original
        # in both speed (1 tap) and accuracy (error ~1/(2*subpix) px)
        if rot_subpix > 1:
            from ghost_tpu.nn.layers import resize as _resize

            sm = _resize(sm.astype(jnp.bfloat16),
                         (crop * rot_subpix, crop * rot_subpix),
                         method="bilinear")
            # out pixel o of the upsample sits at source (o+.5)/s-.5
            xc = (xc + 0.5) * rot_subpix - 0.5
            yc = (yc + 0.5) * rot_subpix - 0.5
        crop_rot = _sample_nearest_batch(sm, xc, yc)
    else:
        crop_rot = _sample_bilinear_batch(sm, xc, yc, "constant", 0.0)

    # ---- step 2: axis-aligned tent matmuls
    # u(p_f) = pc + R^-1 (s R p_f + t - pc) = s*p_f + pc + R^-1 (t - pc)
    cx = cos * (t[:, 0] - pc) + sin * (t[:, 1] - pc) + pc
    cy = -sin * (t[:, 0] - pc) + cos * (t[:, 1] - pc) + pc
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    row_pos = s[:, None] * ys[None, :] + cy[:, None] - u0  # (B,H)
    col_pos = s[:, None] * xs[None, :] + cx[:, None] - u0  # (B,W)
    # bf16 operands + f32 accumulation: the tents/crop values need ~8
    # mantissa bits (uint8-grade imagery), the MXU runs 2x faster
    row_w = _tent_matrix(row_pos, grid).astype(jnp.bfloat16)  # (B,H,grid)
    col_w = _tent_matrix(col_pos, grid).astype(jnp.bfloat16)  # (B,W,grid)
    crop_rot16 = crop_rot.astype(jnp.bfloat16)

    tmp = jnp.einsum("byj,bjic->byic", row_w, crop_rot16,
                     preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    # keep the full-frame warped buffer in bf16: at chunk 64 the f32
    # (B,H,W,4) intermediate alone is 2.1 GB and exhausts HBM; bf16
    # halves every full-frame buffer in the blend and the sums behind it
    # are <= 4-term tent combinations of uint8-scale values (exact f32
    # accumulation on the MXU, only the final store is rounded)
    warped = jnp.einsum("byic,bxi->byxc", tmp, col_w,
                        preferred_element_type=jnp.float32)
    warped = warped.astype(jnp.bfloat16)  # (B,H,W,4)

    sw_t = warped[..., :3]
    mk_t = jnp.clip(warped[..., 3:4], 0.0, 1.0)
    out = mk_t * sw_t + (1.0 - mk_t) * frame.astype(sw_t.dtype)
    if present is not None:
        keep = present.reshape(-1, 1, 1, 1)
        out = jnp.where(keep, out, frame.astype(out.dtype))
    return out
