"""SCRFD-style face detector as one batched XLA graph.

The reference detects faces with insightface's scrfd_10g_bnkps ONNX
session, one frame at a time on the host (reference
insightface_func/face_detect_crop_multi.py:22-93, the per-frame hot
loop of SURVEY.md §3.1). This is a from-scratch TPU-native detector
with the same contract:

  input : (B, 640, 640, 3) frames (RGB, normalized (x-127.5)/128)
  output: (B, MAX_FACES) scores (padded with -1) and
          (B, MAX_FACES, 5, 2) keypoints, sorted by score.

Architecture: anchor-free SCRFD family — a residual backbone, a
PAFPN-style neck, and a shared head predicting per-location score,
bbox distances (distance2bbox) and 5-point kps offsets (distance2kps)
at strides {8, 16, 32} with 2 anchor centers per cell. This class is
the throughput-bench graph (I/O-compatible with the SCRFD family, but
its backbone plan is NOT checkpoint-verified); for REAL weights use
models/scrfd_v1e.SCRFDV1e, whose mmdet topology loads the reference's
model_25GF.pth checkpoint and detects real faces
(tests/test_scrfd_real_weights.py). Post-processing below (threshold,
top-k, NMS) is fixed-capacity and fully on-device, shared by both
detector graphs: no dynamic shapes, so the whole detect->align->swap
chain jits as one program.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ghost_tpu.core.precision import Policy, DEFAULT_POLICY
from ghost_tpu.nn.layers import BatchNorm, Conv

STRIDES = (8, 16, 32)
NUM_ANCHORS = 2


class ConvBlock(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    policy: Policy = DEFAULT_POLICY
    train: bool = False

    @nn.compact
    def __call__(self, x):
        x = Conv(self.features, self.kernel_size, self.stride,
                 padding=self.kernel_size // 2, use_bias=False,
                 dtype=self.policy.compute_dtype,
                 param_dtype=self.policy.param_dtype, name="conv")(x)
        x = BatchNorm(use_running_average=not self.train,
                      dtype=self.policy.compute_dtype,
                      param_dtype=self.policy.param_dtype, name="bn")(x)
        return nn.relu(x)


class ResBlock(nn.Module):
    features: int
    stride: int = 1
    policy: Policy = DEFAULT_POLICY
    train: bool = False

    @nn.compact
    def __call__(self, x):
        h = ConvBlock(self.features, 3, self.stride, self.policy, self.train,
                      name="c1")(x)
        h = Conv(self.features, 3, 1, padding=1, use_bias=False,
                 dtype=self.policy.compute_dtype,
                 param_dtype=self.policy.param_dtype, name="c2")(h)
        h = BatchNorm(use_running_average=not self.train,
                      dtype=self.policy.compute_dtype,
                      param_dtype=self.policy.param_dtype, name="bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = Conv(self.features, 1, self.stride, use_bias=False,
                     dtype=self.policy.compute_dtype,
                     param_dtype=self.policy.param_dtype, name="ds")(x)
            x = BatchNorm(use_running_average=not self.train,
                          dtype=self.policy.compute_dtype,
                          param_dtype=self.policy.param_dtype, name="ds_bn")(x)
        return nn.relu(h + x)


class SCRFDBackbone(nn.Module):
    """Residual backbone emitting stride-8/16/32 features."""

    widths: Sequence[int] = (56, 88, 88, 224)
    depths: Sequence[int] = (3, 4, 2, 3)
    policy: Policy = DEFAULT_POLICY
    train: bool = False

    @nn.compact
    def __call__(self, x):
        x = ConvBlock(28, 3, 2, self.policy, self.train, name="stem0")(x)
        x = ConvBlock(28, 3, 1, self.policy, self.train, name="stem1")(x)
        outs = []
        for s, (w, d) in enumerate(zip(self.widths, self.depths)):
            for b in range(d):
                x = ResBlock(w, stride=2 if b == 0 else 1, policy=self.policy,
                             train=self.train, name=f"stage{s}_block{b}")(x)
            if s >= 1:  # strides 8, 16, 32
                outs.append(x)
        return outs


class PAFPN(nn.Module):
    """Top-down + bottom-up feature pyramid (SCRFD neck)."""

    out_ch: int = 56
    policy: Policy = DEFAULT_POLICY
    train: bool = False

    @nn.compact
    def __call__(self, feats):
        cd = self.policy.compute_dtype
        pd = self.policy.param_dtype
        lat = [
            Conv(self.out_ch, 1, dtype=cd, param_dtype=pd, name=f"lat{i}")(f)
            for i, f in enumerate(feats)
        ]
        # top-down
        td = [None] * len(lat)
        td[-1] = lat[-1]
        for i in range(len(lat) - 2, -1, -1):
            up = jax.image.resize(td[i + 1], lat[i].shape, method="nearest")
            td[i] = lat[i] + up
        td = [
            ConvBlock(self.out_ch, 3, 1, self.policy, self.train, name=f"td{i}")(t)
            for i, t in enumerate(td)
        ]
        # bottom-up
        bu = [td[0]]
        for i in range(1, len(td)):
            down = ConvBlock(self.out_ch, 3, 2, self.policy, self.train,
                             name=f"bu{i}")(bu[-1])
            bu.append(td[i] + down)
        return bu


class SCRFDHead(nn.Module):
    """Shared head: score(NA), bbox(4*NA), kps(10*NA) per location."""

    width: int = 80
    stacked: int = 2
    policy: Policy = DEFAULT_POLICY
    train: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.stacked):
            x = ConvBlock(self.width, 3, 1, self.policy, self.train,
                          name=f"tower{i}")(x)
        cd = self.policy.compute_dtype
        pd = self.policy.param_dtype
        score = Conv(NUM_ANCHORS, 3, padding=1, dtype=cd, param_dtype=pd,
                     name="score")(x)
        bbox = Conv(4 * NUM_ANCHORS, 3, padding=1, dtype=cd, param_dtype=pd,
                    name="bbox")(x)
        kps = Conv(10 * NUM_ANCHORS, 3, padding=1, dtype=cd, param_dtype=pd,
                   name="kps")(x)
        return score, bbox, kps


class SCRFD(nn.Module):
    """Full detector graph. Returns raw per-stride predictions; decoding
    lives in `decode_detections` so it can fuse into the pipeline jit."""

    policy: Policy = DEFAULT_POLICY
    train: bool = False

    @nn.compact
    def __call__(self, x):
        feats = SCRFDBackbone(policy=self.policy, train=self.train,
                              name="backbone")(x)
        pyr = PAFPN(policy=self.policy, train=self.train, name="neck")(feats)
        head = SCRFDHead(policy=self.policy, train=self.train, name="head")
        outs = []
        for level, f in enumerate(pyr):
            outs.append(head(f))
        return outs  # [(score, bbox, kps) per stride]


def _anchor_centers(size: int, stride: int):
    n = size // stride
    ys, xs = jnp.meshgrid(
        jnp.arange(n, dtype=jnp.float32) * stride,
        jnp.arange(n, dtype=jnp.float32) * stride,
        indexing="ij",
    )
    centers = jnp.stack([xs, ys], axis=-1).reshape(-1, 2)  # (n*n, 2)
    return jnp.repeat(centers, NUM_ANCHORS, axis=0)  # (n*n*NA, 2)


def decode_detections(
    outs,
    input_size: int = 640,
    score_thresh: float = 0.5,
    max_faces: int = 16,
    pre_nms: int = 256,
    iou_thresh: float = 0.4,
):
    """Raw head outputs -> fixed-capacity (scores, bboxes, kps).

    All static shapes: per stride take the pre_nms highest scores, concat
    across strides, greedy NMS over the fixed candidate set, then top
    max_faces (scores below threshold padded to -1). Matches the
    decode+NMS semantics of insightface's SCRFD postproc (threshold,
    distance2bbox/kps, IoU suppression) but batched and jittable.
    """
    batch = outs[0][0].shape[0]
    all_scores, all_boxes, all_kps = [], [], []
    for (score, bbox, kps), stride in zip(outs, STRIDES):
        centers = _anchor_centers(input_size, stride)
        s = jax.nn.sigmoid(score.reshape(batch, -1).astype(jnp.float32))
        b = bbox.reshape(batch, -1, 4).astype(jnp.float32) * stride
        k = kps.reshape(batch, -1, 5, 2).astype(jnp.float32) * stride
        # distance2bbox: l,t,r,b distances from the center
        x1 = centers[None, :, 0] - b[..., 0]
        y1 = centers[None, :, 1] - b[..., 1]
        x2 = centers[None, :, 0] + b[..., 2]
        y2 = centers[None, :, 1] + b[..., 3]
        boxes = jnp.stack([x1, y1, x2, y2], axis=-1)
        # distance2kps: offsets from the center
        pts = centers[None, :, None, :] + k
        # per-stride top-k
        take = min(pre_nms, s.shape[1])
        top_s, top_i = jax.lax.top_k(s, take)
        all_scores.append(top_s)
        all_boxes.append(jnp.take_along_axis(boxes, top_i[..., None], axis=1))
        all_kps.append(jnp.take_along_axis(pts, top_i[..., None, None], axis=1))

    scores = jnp.concatenate(all_scores, axis=1)
    boxes = jnp.concatenate(all_boxes, axis=1)
    kps = jnp.concatenate(all_kps, axis=1)
    scores = jnp.where(scores >= score_thresh, scores, -1.0)
    return _batched_nms(scores, boxes, kps, max_faces, iou_thresh)


def _iou_matrix(boxes):
    """(N,4) xyxy -> (N,N) IoU."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    lt = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    rb = jnp.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def _nms_single(scores, boxes, kps, max_faces: int, iou_thresh: float,
                exact_rounds: int = 4):
    """Parallel matrix NMS over score-sorted candidates.

    Starts from the fully-parallel "fast NMS" relaxation (suppress i if
    ANY higher-scored j overlaps it) and then runs a few fixed-point
    rounds of the exact greedy rule (suppress i only if a higher-scored
    *survivor* overlaps it): keep = f(keep) where
    f(keep)[i] = score[i]>0 and no j<i with keep[j] and IoU>thr.
    Greedy NMS is the unique fixed point; suppression chains longer than
    `exact_rounds` are vanishingly rare for faces (requires 4+ mutually
    chained overlaps), and every round is one masked matmul-shaped
    reduction instead of a 768-step sequential scan."""
    order = jnp.argsort(-scores)
    scores = scores[order]
    boxes = boxes[order]
    kps = kps[order]
    n = scores.shape[0]
    iou = _iou_matrix(boxes)
    higher = jnp.arange(n)[None, :] < jnp.arange(n)[:, None]  # j < i
    overlap = (iou > iou_thresh) & higher  # (i, j): j could suppress i

    keep = scores > 0
    for _ in range(exact_rounds):
        suppressed = jnp.any(overlap & keep[None, :], axis=1)
        keep = (scores > 0) & ~suppressed

    kept_scores = jnp.where(keep, scores, -1.0)
    top_s, top_i = jax.lax.top_k(kept_scores, max_faces)
    return top_s, boxes[top_i], kps[top_i]


def _batched_nms(scores, boxes, kps, max_faces: int, iou_thresh: float):
    fn = lambda s, b, k: _nms_single(s, b, k, max_faces, iou_thresh)
    return jax.vmap(fn)(scores, boxes, kps)


def preprocess_frames(frames_rgb_uint8, det_size: int = 640):
    """(B,H,W,3) RGB uint8 -> (normalized (B,S,S,3), scale) with
    top-left aspect-preserving letterboxing (reference
    coordinate_reg/image_infer.py:17-29 square_crop semantics)."""
    b, h, w, _ = frames_rgb_uint8.shape
    scale = det_size / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    from ghost_tpu.nn.layers import resize

    # bf16 end-to-end: the u8->f32 cast of a full 1080p chunk is a
    # 1.6 GB HBM buffer at chunk 64; bf16 halves it and the detector
    # computes in bf16 anyway
    x = resize(frames_rgb_uint8.astype(jnp.bfloat16), (nh, nw),
               method="bilinear")
    canvas = jnp.zeros((b, det_size, det_size, 3), jnp.bfloat16)
    canvas = canvas.at[:, :nh, :nw, :].set(x)
    return (canvas - 127.5) / 128.0, scale
