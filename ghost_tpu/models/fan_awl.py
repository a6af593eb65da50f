"""AdaptiveWingLoss FAN — the exact WFLW_4HG.pth architecture.

The reference's eye loss loads `WFLW_4HG.pth` from the AdaptiveWingLoss
project (reference download_models.sh:20, utils/training/detector.py;
the vendored submodule directory is empty, so the layer plan here
follows the public AdaptiveWingLoss `core/models.py` +
`core/coord_conv.py` sources that checkpoint was trained with):
a CoordConv stem (x/y/r coordinate channels appended before the 7x7
conv), three ConvBlocks, then `num_modules` hourglasses whose 1x1
CoordConv also appends boundary-masked coordinate channels derived
from the previous stack's 99th (boundary) heatmap channel. Each stack
emits `num_landmarks + 1` heatmaps (98 WFLW points + 1 boundary).

`models/fan.py` stays the TPU-native redesign used by the training
loop by default; this module exists so the real checkpoint is loadable
(`convert_fan_awl_state_dict`, convert/torch_loader.py) and is a
drop-in heatmap source for `eye_heatmaps` (channels 0..97 are the same
WFLW points).

NHWC throughout; coordinate channels are built with broadcast iota —
no host work. Eval-mode BatchNorm (running stats), like every serving
module here.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ghost_tpu.core.precision import DEFAULT_POLICY, Policy
from ghost_tpu.nn.layers import BatchNorm, Conv, resize


def add_coords(x, with_r: bool, boundary_heatmap=None):
    """coord_conv.AddCoordsTh parity, NHWC: append xx (H-axis index,
    normalized to [-1,1]), yy (W-axis index), optional rr
    (sqrt(xx^2+yy^2)/max), and — when a boundary heatmap is given —
    xx/yy masked to where clamp(heatmap[..., -1], 0, 1) > 0.05.

    Orientation note: AWL's AddCoordsTh is NOT the standard uber
    CoordConv — it documents its input as (batch, c, x_dim, y_dim) and
    permutes the (1, y_dim, x_dim, 1) matmul-built xx map with
    (0, 3, 2, 1), landing x_dim on the FIRST spatial axis: xx varies
    along H, then yy along W, which is what this function emits. Every
    map here is square, so a convention mismatch would equal a
    coordinate transpose — instantly visible as transposed landmarks
    once the real WFLW_4HG.pth runs; re-verify against the upstream
    source then."""
    b, h, w, _ = x.shape
    dt = x.dtype
    xx = jnp.broadcast_to(
        (jnp.arange(h, dtype=dt) / (h - 1) * 2 - 1)[None, :, None, None],
        (b, h, w, 1))
    yy = jnp.broadcast_to(
        (jnp.arange(w, dtype=dt) / (w - 1) * 2 - 1)[None, None, :, None],
        (b, h, w, 1))
    chans = [x, xx, yy]
    if with_r:
        rr = jnp.sqrt(xx * xx + yy * yy)
        chans.append(rr / jnp.max(rr))
    if boundary_heatmap is not None:
        bc = jnp.clip(boundary_heatmap[..., -1:], 0.0, 1.0)
        keep = bc > 0.05
        chans.append(jnp.where(keep, xx, 0.0))
        chans.append(jnp.where(keep, yy, 0.0))
    return jnp.concatenate(chans, axis=-1)


class CoordConv(nn.Module):
    """coord_conv.CoordConvTh parity: AddCoords then a conv."""

    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    with_r: bool = True
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, boundary_heatmap=None):
        x = add_coords(x, self.with_r, boundary_heatmap)
        return Conv(self.features, self.kernel, self.stride,
                    padding=self.padding, dtype=self.policy.compute_dtype,
                    param_dtype=self.policy.param_dtype, name="conv")(x)


class ConvBlockAWL(nn.Module):
    """models.ConvBlock parity: bn-relu-conv chains at c/2, c/4, c/4,
    concatenated; bn-relu-1x1 downsample when widths differ."""

    features: int
    policy: Policy = DEFAULT_POLICY
    train: bool = False

    @nn.compact
    def __call__(self, x):
        cd = self.policy.compute_dtype
        pd = self.policy.param_dtype
        ura = not self.train
        c = self.features

        def brc(h, out, k, name):
            h = BatchNorm(use_running_average=ura, dtype=cd, param_dtype=pd,
                          name=f"bn_{name}")(h)
            h = nn.relu(h)
            return Conv(out, k, padding=k // 2, use_bias=False, dtype=cd,
                        param_dtype=pd, name=f"conv_{name}")(h)

        o1 = brc(x, c // 2, 3, "1")
        o2 = brc(o1, c // 4, 3, "2")
        o3 = brc(o2, c // 4, 3, "3")
        out = jnp.concatenate([o1, o2, o3], axis=-1)
        if x.shape[-1] != c:
            x = brc(x, c, 1, "ds")
        return out + x


class HourGlassAWL(nn.Module):
    """models.HourGlass parity: a 1x1 boundary-aware CoordConv, then
    the recursive b1/b2/b2_plus/b3 pyramid with nearest-x2 upsamples.
    `first_one` stacks get no boundary channels (heatmap is None)."""

    depth: int = 4
    features: int = 256
    first_one: bool = False
    policy: Policy = DEFAULT_POLICY
    train: bool = False

    @nn.compact
    def __call__(self, x, heatmap=None):
        x = CoordConv(self.features, 1, with_r=True, policy=self.policy,
                      name="coordconv")(
            x, None if self.first_one else heatmap)

        def block(name):
            return ConvBlockAWL(self.features, self.policy, self.train,
                                name=name)

        def recurse(level, inp):
            up1 = block(f"b1_{level}")(inp)
            low = nn.avg_pool(inp, (2, 2), (2, 2))
            low = block(f"b2_{level}")(low)
            if level > 1:
                low = recurse(level - 1, low)
            else:
                low = block(f"b2_plus_{level}")(low)
            low = block(f"b3_{level}")(low)
            up2 = resize(low, (low.shape[1] * 2, low.shape[2] * 2),
                         method="nearest")
            return up1 + up2

        return recurse(self.depth, x)


class FANAWL(nn.Module):
    """(B,256,256,3) in [0,1] -> list of num_modules (B,64,64,
    num_landmarks+1) heatmaps (WFLW_4HG: 4 stacks, 98+1 channels)."""

    num_modules: int = 4
    num_landmarks: int = 98
    features: int = 256
    mid_features: int = 128  # conv2/conv3 width (models.py FAN.__init__)
    depth: int = 4
    end_relu: bool = False
    policy: Policy = DEFAULT_POLICY
    train: bool = False

    @nn.compact
    def __call__(self, x):
        cd = self.policy.compute_dtype
        pd = self.policy.param_dtype
        ura = not self.train
        x = x.astype(cd)
        x = CoordConv(64, 7, 2, padding=3, with_r=True, policy=self.policy,
                      name="conv1")(x)
        x = BatchNorm(use_running_average=ura, dtype=cd, param_dtype=pd,
                      name="bn1")(x)
        x = nn.relu(x)
        x = ConvBlockAWL(self.mid_features, self.policy, self.train,
                         name="conv2")(x)
        x = nn.avg_pool(x, (2, 2), (2, 2))
        x = ConvBlockAWL(self.mid_features, self.policy, self.train,
                         name="conv3")(x)
        x = ConvBlockAWL(self.features, self.policy, self.train,
                         name="conv4")(x)

        outputs = []
        prev, tmp_out = x, None
        for i in range(self.num_modules):
            hg = HourGlassAWL(self.depth, self.features, first_one=(i == 0),
                              policy=self.policy, train=self.train,
                              name=f"m{i}")(prev, tmp_out)
            ll = ConvBlockAWL(self.features, self.policy, self.train,
                              name=f"top_m_{i}")(hg)
            ll = Conv(self.features, 1, dtype=cd, param_dtype=pd,
                      name=f"conv_last{i}")(ll)
            ll = BatchNorm(use_running_average=ura, dtype=cd, param_dtype=pd,
                           name=f"bn_end{i}")(ll)
            ll = nn.relu(ll)
            tmp_out = Conv(self.num_landmarks + 1, 1, dtype=cd,
                           param_dtype=pd, name=f"l{i}")(ll)
            if self.end_relu:
                tmp_out = nn.relu(tmp_out)
            outputs.append(tmp_out.astype(self.policy.output_dtype))
            if i < self.num_modules - 1:
                prev = prev + Conv(self.features, 1, dtype=cd, param_dtype=pd,
                                   name=f"bl{i}")(ll) + Conv(
                    self.features, 1, dtype=cd, param_dtype=pd,
                    name=f"al{i}")(tmp_out)
        return outputs
