"""Output enhancement: GFPGAN face restore + Real-ESRGAN background.

TPU-native redesign of the reference's `upsample()` post-pass
(reference utils/training/upsampler.py:92-106: GFPGANer.enhance with
paste_back=True over an optional RealESRGANer background upsampler).
The reference round-trips every frame through two external torch
packages with their own cv2 detection/alignment; here the whole pass is
ONE jitted program per chunk:

  detect (SCRFD, shared decode) -> FFHQ-template similarity align to
  512 crops -> GFPGANClean -> soft-mask paste-back, over an optional
  RRDBNet-upsampled base frame.

Fixed-capacity face lanes (max_faces, presence-masked) keep shapes
static under jit, matching the swap pipeline's design. Output stays at
input resolution (the upstream helper returns up_by-scaled frames;
resolution-preserving enhancement is the serving-relevant case — pass
the RRDB output through unresized if the x4 canvas is wanted).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ghost_tpu.models.scrfd import decode_detections, preprocess_frames
from ghost_tpu.nn.layers import resize
from ghost_tpu.ops.umeyama import umeyama_similarity
from ghost_tpu.ops.warp import warp_affine, warp_and_blend

# facexlib FaceRestoreHelper's canonical 5-point template for a
# 512x512 FFHQ-aligned face crop (public constants; the reference's
# GFPGANer aligns to exactly these points before enhancing).
FFHQ_TEMPLATE_512 = np.array(
    [[192.98138, 239.94708], [318.90277, 240.1936],
     [256.63416, 314.01935], [201.26117, 371.41043],
     [313.08905, 371.15118]], np.float32)


def _soft_border_mask(size: int, border_frac: float = 0.1):
    """Static soft paste mask: 1 inside, cosine falloff to 0 at the
    crop border (the upstream helper erodes + blurs an all-ones warp;
    a fixed falloff is its shape-static equivalent)."""
    border = max(1, int(size * border_frac))
    ramp = 0.5 - 0.5 * np.cos(np.pi * (np.arange(border) + 0.5) / border)
    prof = np.ones((size,), np.float32)
    prof[:border] = ramp
    prof[-border:] = ramp[::-1]
    return jnp.asarray((prof[:, None] * prof[None, :])[None, :, :, None])


class FaceEnhancer:
    """GFPGAN face restoration (+ optional RRDB background) as one
    jitted chunk program. All model variables ride as jit arguments
    (relay HTTP-413 rule, see SwapPipeline)."""

    def __init__(self, det, gfpgan, bg=None, det_size: int = 640,
                 det_thresh: float = 0.5, max_faces: int = 4,
                 crop_size: int = 512):
        self.det_mod, det_vars = det
        self.gfp_mod, gfp_vars = gfpgan
        self.bg_mod, bg_vars = bg if bg is not None else (None, None)
        self.det_size = det_size
        self.det_thresh = det_thresh
        self.max_faces = max_faces
        self.crop_size = crop_size
        self._vars = {"det": det_vars, "gfp": gfp_vars, "bg": bg_vars}
        self._mask = _soft_border_mask(crop_size)
        self._enhance_j = jax.jit(self._enhance_impl,
                                  static_argnames=("use_bg",))

    def _enhance_impl(self, variables, frames_u8, use_bg: bool):
        b, h, w, _ = frames_u8.shape
        canvas, scale = preprocess_frames(frames_u8, self.det_size)
        outs = self.det_mod.apply(variables["det"], canvas)
        scores, _boxes, kps = decode_detections(
            outs, input_size=self.det_size,
            score_thresh=self.det_thresh, max_faces=self.max_faces)
        kps = kps / scale  # (B,F,5,2) frame coords
        f = kps.shape[1]

        template = jnp.asarray(FFHQ_TEMPLATE_512) * (self.crop_size / 512.0)
        m = umeyama_similarity(
            kps.reshape(b * f, 5, 2),
            jnp.broadcast_to(template, (b * f, 5, 2)))  # frame->crop

        rep = jnp.repeat(frames_u8.astype(jnp.float32), f, axis=0)
        crops = warp_affine(rep, m, (self.crop_size, self.crop_size))
        x = crops / 127.5 - 1.0
        restored, _ = self.gfp_mod.apply(variables["gfp"], x)
        restored = jnp.clip(restored.astype(jnp.float32), -1.0, 1.0)
        restored = (restored + 1.0) * 127.5

        if use_bg:
            # RRDB x4 then area-resize back: resolution-preserving
            # background cleanup (the x4 canvas case returns `up`)
            up = self.bg_mod.apply(
                variables["bg"], frames_u8.astype(jnp.float32) / 255.0)
            up = jnp.clip(up.astype(jnp.float32), 0.0, 1.0) * 255.0
            base = resize(up, (h, w), method="area")
        else:
            base = frames_u8.astype(jnp.float32)

        present = scores > 0  # (B,F)
        mask = jnp.broadcast_to(
            self._mask, (b, self.crop_size, self.crop_size, 1))
        for lane in range(f):
            # repeat layout: row (b, lane) lives at index b*f + lane
            base = warp_and_blend(
                base, restored[lane::f], mask,
                m.reshape(b, f, 2, 3)[:, lane],
                present=present[:, lane])
        return jnp.clip(base, 0.0, 255.0).astype(jnp.uint8)

    def enhance(self, frames_rgb_u8: np.ndarray) -> np.ndarray:
        """frames (B,H,W,3) RGB uint8 -> enhanced frames, same shape."""
        frames = jnp.asarray(np.ascontiguousarray(frames_rgb_u8))
        out = self._enhance_j(self._vars, frames,
                              use_bg=self.bg_mod is not None)
        return np.asarray(out)
