"""SRVGGNetCompact — the realesr-general-x4v3 fast upsampler, TPU-native.

The reference ships this weight alongside the RRDB background upsampler
(reference Dockerfile:65-68, utils/training/upsampler.py:6 imports
`realesrgan.archs.srvgg_arch.SRVGGNetCompact`). It is the "general"
Real-ESRGAN model: a plain conv+PReLU VGG-style trunk at input
resolution, a pixel-shuffle x`upscale` head, and a nearest-upsampled
input skip. From-scratch NHWC flax implementation of that layer plan
(public srvgg_arch.py); `convert_srvgg_state_dict`
(convert/torch_loader.py) maps the official `body.N` checkpoint names
so realesr-general-x4v3.pth loads unchanged.

TPU notes: the whole trunk is dense 3x3 convs on the MXU at constant
(num_feat) width — no concats, no norms; pixel-shuffle is a
reshape/transpose (layout only); the nearest skip is a broadcast.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ghost_tpu.core.precision import DEFAULT_POLICY, Policy
from ghost_tpu.nn.layers import Conv, resize

from .rrdb import nearest_up2


def pixel_shuffle(x, factor: int):
    """torch nn.PixelShuffle parity, NHWC: (B, H, W, C*f*f) ->
    (B, H*f, W*f, C) where input channel c*f*f + dy*f + dx feeds
    output channel c at spatial offset (dy, dx)."""
    b, h, w, cff = x.shape
    c = cff // (factor * factor)
    x = x.reshape(b, h, w, c, factor, factor)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * factor, w * factor, c)


def nearest_up(x, factor: int):
    """Integer-factor nearest upsample (torch F.interpolate parity for
    integer scale_factor). Power-of-two factors keep the measured
    doubling path; other factors (upscale=3 variants) pixel-repeat —
    the doubling loop alone silently produced 2^floor(log2(f)) and the
    skip-add failed with an opaque broadcast error."""
    if factor & (factor - 1) == 0:
        for _ in range(factor.bit_length() - 1):
            x = nearest_up2(x)
        return x
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


class SRVGGNetCompact(nn.Module):
    """realesr-general-x4v3 layout: body = [conv, act] + num_conv x
    [conv, act] + [conv to out*upscale^2], then pixel-shuffle and add
    the nearest-upsampled input."""

    num_out_ch: int = 3
    num_feat: int = 64
    num_conv: int = 32
    upscale: int = 4
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        cd = self.policy.compute_dtype
        pd = self.policy.param_dtype
        x = x.astype(cd)
        out = x
        for i in range(self.num_conv + 1):
            out = Conv(self.num_feat, 3, padding=1, dtype=cd,
                       param_dtype=pd, name=f"conv_{i}")(out)
            alpha = self.param(f"prelu_{i}", nn.initializers.constant(0.25),
                               (self.num_feat,), pd).astype(cd)
            out = jnp.where(out >= 0, out, alpha * out)
        out = Conv(self.num_out_ch * self.upscale ** 2, 3, padding=1,
                   dtype=cd, param_dtype=pd, name="conv_last")(out)
        out = pixel_shuffle(out, self.upscale)
        return out + nearest_up(x, self.upscale)


def srvgg_from_variables(variables, policy: Policy = DEFAULT_POLICY,
                         num_out_ch: int = 3) -> SRVGGNetCompact:
    """Rebuild the SRVGGNetCompact module matching a saved variables
    tree (e.g. a `cli/distill_enhancer` student msgpack) by reading the
    hyperparameters off the parameter shapes: num_feat from conv_0's
    output width, num_conv from the body conv count, upscale from
    conv_last's pixel-shuffle width. Avoids the silent shape-mismatch
    class of bug where CLI flags must be repeated to match a checkpoint.
    """
    p = variables["params"] if "params" in variables else variables
    try:
        num_feat = int(p["conv_0"]["Conv_0"]["kernel"].shape[-1])
        body = [k for k in p if k.startswith("conv_") and k != "conv_last"]
        num_conv = len(body) - 1
        cff = int(p["conv_last"]["Conv_0"]["kernel"].shape[-1])
    except (KeyError, TypeError) as e:
        raise ValueError(
            "checkpoint is not an SRVGG student tree (missing "
            f"{e!s} — likely a wrong --sr_model/--sr_path pairing, "
            "e.g. a LIPSPADE checkpoint passed with srvgg_student)"
        ) from e
    upscale = int(round((cff // num_out_ch) ** 0.5))
    if num_out_ch * upscale * upscale != cff:
        raise ValueError(
            f"conv_last emits {cff} channels — not num_out_ch="
            f"{num_out_ch} x square upscale^2; not an SRVGG student tree")
    return SRVGGNetCompact(num_out_ch=num_out_ch, num_feat=num_feat,
                           num_conv=num_conv, upscale=upscale,
                           policy=policy)


class SRVGGStudentSeat:
    """Swap-pipeline SR-seat adapter serving a distilled SRVGG student.

    The SwapPipeline SR seat contract (pipeline/swap.py `sr_lane`) is
    [-1,1] in -> [-1,1] out at the swapped-crop resolution. The
    distilled student (`cli/distill_enhancer`, DISTILL_VALUE_r04.json)
    is an x`upscale` super-resolver in [0,1], so the seat area-
    downscales the crop by the student's factor, super-resolves back to
    native resolution, and clips: the quality pass runs at 1/upscale^2
    of the crop's pixel count. Measured through the production program
    at T=2 identities this serves 97.3 fps all-lanes-present vs the
    LIPSPADE seat's roofline-walled 65.3 (BENCH_EXTRA_r04.json) — the
    quality path that can reach the >=120 north star. Reference
    counterpart of the seat it replaces: reference inference.py:42-48
    (`--use_sr` face enhancement on every swapped crop).
    """

    def __init__(self, student: SRVGGNetCompact):
        self.student = student

    def apply(self, variables, y_pm1):
        h, w = int(y_pm1.shape[1]), int(y_pm1.shape[2])
        f = int(self.student.upscale)
        if h % f or w % f:
            raise ValueError(
                f"generator/SR resolution {h}x{w} not divisible by the "
                f"student's upscale={f}; the seat runs on the generator "
                "output (SwapConfig.gen_size, 256 by default), so train "
                "a student whose upscale divides it")
        y01 = y_pm1 * 0.5 + 0.5
        lq = resize(y01, (h // f, w // f), method="area")
        out = self.student.apply(variables, lq)
        return jnp.clip(out, 0.0, 1.0) * 2.0 - 1.0
