"""106-point facial landmark network (coordinate_reg / 2d106det parity).

The reference runs an MXNet '2d106det' model on a fixed 192x192 warp of
each crop, producing 212 values in [-1, 1] which map to 106 (x, y)
points via (p + 1) * 96 followed by the fixed inverse affine IM
(reference coordinate_reg/image_infer.py:13-14,141-157). The fixed
forward warp is M = [[4/7, 0, 32], [0, 4/7, 32]] (224-crop -> 192 net
input) and IM its inverse.

This is a from-scratch TPU-native landmarker with the same I/O
contract, batched: a depthwise-separable conv trunk (MXU-friendly,
everything stride-2 to 6x6) + global average pool + FC(212). The
`landmarks_from_crops` wrapper fuses warp -> net -> coordinate mapping
into one jittable function, replacing the reference's per-face
host/MXNet round-trip in the paste-back loop
(reference utils/inference/video_processing.py:218-220, HOT LOOP #3).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ghost_tpu.core.precision import Policy, DEFAULT_POLICY
from ghost_tpu.nn.layers import BatchNorm, Conv, PReLU, resize
from ghost_tpu.ops.warp import warp_affine

# fixed 224-crop -> 192 input warp and its inverse
# (reference coordinate_reg/image_infer.py:13-14)
LMK_M = np.array([[192.0 / 336.0, 0.0, 32.0], [0.0, 192.0 / 336.0, 32.0]],
                 dtype=np.float32)
LMK_IM = np.array([[1.75, 0.0, -56.0], [0.0, 1.75, -56.0]], dtype=np.float32)
NET_SIZE = 192
NUM_POINTS = 106


class SepBlock(nn.Module):
    """Depthwise 3x3 (stride s) + pointwise 1x1, BN + PReLU after each."""

    features: int
    stride: int = 1
    policy: Policy = DEFAULT_POLICY
    train: bool = False

    @nn.compact
    def __call__(self, x):
        cd = self.policy.compute_dtype
        pd = self.policy.param_dtype
        cin = x.shape[-1]
        x = Conv(cin, 3, self.stride, padding=1, use_bias=False,
                 feature_group_count=cin, dtype=cd, param_dtype=pd, name="dw")(x)
        x = BatchNorm(use_running_average=not self.train, dtype=cd,
                      param_dtype=pd, name="dw_bn")(x)
        x = PReLU(param_dtype=pd, name="dw_act")(x)
        x = Conv(self.features, 1, use_bias=False, dtype=cd, param_dtype=pd,
                 name="pw")(x)
        x = BatchNorm(use_running_average=not self.train, dtype=cd,
                      param_dtype=pd, name="pw_bn")(x)
        return PReLU(param_dtype=pd, name="pw_act")(x)


class Landmark106(nn.Module):
    """(B,192,192,3) raw-pixel RGB -> (B,106,2) in [-1,1] net coords."""

    width: int = 64
    policy: Policy = DEFAULT_POLICY
    train: bool = False

    @nn.compact
    def __call__(self, x):
        cd = self.policy.compute_dtype
        pd = self.policy.param_dtype
        x = x.astype(cd)
        w = self.width
        x = Conv(w // 2, 3, 2, padding=1, use_bias=False, dtype=cd,
                 param_dtype=pd, name="stem")(x)  # 96
        x = BatchNorm(use_running_average=not self.train, dtype=cd,
                      param_dtype=pd, name="stem_bn")(x)
        x = PReLU(param_dtype=pd, name="stem_act")(x)
        x = SepBlock(w, 2, self.policy, self.train, name="b1")(x)      # 48
        x = SepBlock(w, 1, self.policy, self.train, name="b2")(x)
        x = SepBlock(w * 2, 2, self.policy, self.train, name="b3")(x)  # 24
        x = SepBlock(w * 2, 1, self.policy, self.train, name="b4")(x)
        x = SepBlock(w * 4, 2, self.policy, self.train, name="b5")(x)  # 12
        x = SepBlock(w * 4, 1, self.policy, self.train, name="b6")(x)
        x = SepBlock(w * 8, 2, self.policy, self.train, name="b7")(x)  # 6
        x = jnp.mean(x, axis=(1, 2))  # GAP
        x = nn.Dense(NUM_POINTS * 2, dtype=jnp.float32, param_dtype=pd,
                     name="fc")(x.astype(jnp.float32))
        return jnp.tanh(x).reshape(-1, NUM_POINTS, 2)


def landmarks_from_crops(apply_fn, variables, crops_rgb, crop_size: int = 224):
    """Fused crop -> 106 landmarks in crop coordinates.

    crops_rgb: (B, crop, crop, 3) float RGB in [0, 255].
    Mirrors Handler.get_without_detection_without_transform
    (reference image_infer.py:141-157): fixed warp to 192, net forward,
    (p+1)*96, then the inverse warp IM back to crop coords. For
    crop_size != 224 the fixed matrices scale accordingly.
    """
    b = crops_rgb.shape[0]
    s = crop_size / 224.0
    m = LMK_M.copy()
    m[:, :2] = m[:, :2] / s
    im = LMK_IM.copy()
    im[:, :2] = im[:, :2] * s
    im[:, 2] = im[:, 2] * s

    net_in = warp_affine(crops_rgb, jnp.tile(jnp.asarray(m)[None], (b, 1, 1)),
                         (NET_SIZE, NET_SIZE))
    pred = apply_fn(variables, net_in)  # (B,106,2) in [-1,1]
    pts = (pred + 1.0) * (NET_SIZE // 2)
    ones = jnp.ones_like(pts[..., :1])
    pts_h = jnp.concatenate([pts, ones], axis=-1)
    return jnp.einsum("ij,bnj->bni", jnp.asarray(im), pts_h)
