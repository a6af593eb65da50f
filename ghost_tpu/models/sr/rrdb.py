"""RRDBNet — the Real-ESRGAN x4plus background upsampler, TPU-native.

The reference enhances swap outputs with `RealESRGANer(model=RRDBNet(
num_in_ch=3, num_out_ch=3, num_feat=64, num_block=23, num_grow_ch=32,
scale=4), ...)` from external pip packages (reference
utils/training/upsampler.py:25-47,112-124). This is a from-scratch NHWC
flax implementation of that architecture (layer plan per the public
basicsr `rrdbnet_arch.py`): dense residual blocks with 0.2-scaled
residuals, a 23-block trunk, and two nearest-2x conv upsample stages.
`convert_rrdbnet_state_dict` (convert/torch_loader.py) maps the
official checkpoint names (`conv_first`, `body.N.rdbM.convK`, ...)
so RealESRGAN_x4plus.pth loads unchanged.

TPU notes: channel concats along the lane axis are free-ish (layout
only); every conv is 3x3 dense on the MXU; nearest x2 is a
broadcast-reshape (no gather). Whole net is one jittable function,
bf16-capable via Policy.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ghost_tpu.core.precision import DEFAULT_POLICY, Policy
from ghost_tpu.nn.layers import Conv


def _lrelu(x):
    return nn.leaky_relu(x, 0.2)


def nearest_up2(x):
    """F.interpolate(scale_factor=2, mode='nearest') parity, NHWC."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def pixel_unshuffle(x, factor: int):
    """Space-to-depth (torch pixel_unshuffle parity): NHWC
    (B, H, W, C) -> (B, H/f, W/f, C*f*f) with torch's channel order
    (c-major, then row offset, then col offset)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    # torch orders output channels as (c, fy, fx)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // factor, w // factor, c * factor * factor)


class ResidualDenseBlock(nn.Module):
    """5-conv dense block: conv_k sees [x, y1..y_{k-1}]; 0.2 residual."""

    num_feat: int = 64
    num_grow_ch: int = 32
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        cd = self.policy.compute_dtype
        pd = self.policy.param_dtype
        feats = [x]
        for k in range(1, 5):
            y = Conv(self.num_grow_ch, 3, padding=1, dtype=cd,
                     param_dtype=pd, name=f"conv{k}")(
                         jnp.concatenate(feats, axis=-1))
            feats.append(_lrelu(y))
        y5 = Conv(self.num_feat, 3, padding=1, dtype=cd, param_dtype=pd,
                  name="conv5")(jnp.concatenate(feats, axis=-1))
        return y5 * 0.2 + x


class RRDB(nn.Module):
    num_feat: int = 64
    num_grow_ch: int = 32
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch,
                                 self.policy, name="rdb1")(x)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch,
                                 self.policy, name="rdb2")(out)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch,
                                 self.policy, name="rdb3")(out)
        return out * 0.2 + x


class RRDBNet(nn.Module):
    """x4 (default), x2, or x1 SR: sub-unit scales pixel-unshuffle the
    input so the trunk always runs at 1/4 output resolution."""

    num_out_ch: int = 3
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32
    scale: int = 4
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        cd = self.policy.compute_dtype
        pd = self.policy.param_dtype
        x = x.astype(cd)
        if self.scale == 2:
            x = pixel_unshuffle(x, 2)
        elif self.scale == 1:
            x = pixel_unshuffle(x, 4)
        feat = Conv(self.num_feat, 3, padding=1, dtype=cd, param_dtype=pd,
                    name="conv_first")(x)
        body = feat
        for i in range(self.num_block):
            body = RRDB(self.num_feat, self.num_grow_ch, self.policy,
                        name=f"body_{i}")(body)
        body = Conv(self.num_feat, 3, padding=1, dtype=cd, param_dtype=pd,
                    name="conv_body")(body)
        feat = feat + body
        feat = _lrelu(Conv(self.num_feat, 3, padding=1, dtype=cd,
                           param_dtype=pd, name="conv_up1")(nearest_up2(feat)))
        feat = _lrelu(Conv(self.num_feat, 3, padding=1, dtype=cd,
                           param_dtype=pd, name="conv_up2")(nearest_up2(feat)))
        feat = _lrelu(Conv(self.num_feat, 3, padding=1, dtype=cd,
                           param_dtype=pd, name="conv_hr")(feat))
        return Conv(self.num_out_ch, 3, padding=1, dtype=cd,
                    param_dtype=pd, name="conv_last")(feat)


def rrdb_forward_pipelined(net: RRDBNet, variables, x, *, mesh,
                           num_microbatches: int | None = None,
                           axis: str = "pipe", remat: bool = False,
                           batch_axis: str | None = None):
    """RRDBNet forward with the 23-block trunk pipelined over a mesh.

    The trunk is the FLOP wall of the reference's background enhancer
    (reference utils/training/upsampler.py:25-47: RealESRGAN x4plus is
    ~33 MFLOP/px — ~1.4 fps/chip roofline at 1080p, BENCH_EXTRA_r03);
    data parallelism cannot help a single latency-bound stream, so this
    runs the homogeneous blocks through `parallel.pp.pipeline_apply`
    (GPipe schedule: stage s holds blocks [s*ceil(N/S), ...), microbatch
    wavefront hops stages via ppermute over ICI). Head/tail convs
    (conv_first/body/up/hr/last, <5% of trunk FLOPs) run replicated.

    Numerically identical to `net.apply` (tested on the 8-device CPU
    mesh, incl. the 23%S!=0 identity-padding path). `x` batch must be
    divisible by num_microbatches (default: the stage count).
    """
    p = variables["params"]
    cd = net.policy.compute_dtype
    pd = net.policy.param_dtype

    def conv(name, h, feats=None, act=False):
        y = Conv(feats or net.num_feat, 3, padding=1, dtype=cd,
                 param_dtype=pd).apply({"params": p[name]}, h)
        return _lrelu(y) if act else y

    x = x.astype(cd)
    if net.scale == 2:
        x = pixel_unshuffle(x, 2)
    elif net.scale == 1:
        x = pixel_unshuffle(x, 4)
    feat = conv("conv_first", x)

    from ghost_tpu.parallel.pp import pipeline_apply, stack_block_params

    block = RRDB(net.num_feat, net.num_grow_ch, net.policy)
    stacked = stack_block_params(
        [p[f"body_{i}"] for i in range(net.num_block)])
    body = pipeline_apply(
        lambda bp, h: block.apply({"params": bp}, h), stacked, feat,
        mesh=mesh, axis=axis, num_microbatches=num_microbatches,
        remat=remat, batch_axis=batch_axis)

    feat = feat + conv("conv_body", body)
    feat = conv("conv_up1", nearest_up2(feat), act=True)
    feat = conv("conv_up2", nearest_up2(feat), act=True)
    feat = conv("conv_hr", feat, act=True)
    return conv("conv_last", feat, feats=net.num_out_ch)
