"""GFPGAN v1 'clean' face restorer — TPU-native implementation.

The reference enhances swapped faces with `GFPGANer(model_path=
'GFPGANv1.4.pth', arch='clean', channel_multiplier=2, ...)` from the
external gfpgan pip package (reference utils/training/upsampler.py:
39-46,78-85). This file is a from-scratch NHWC flax implementation of
that architecture (layer plan per the public `gfpganv1_clean_arch.py` /
`stylegan2_clean_arch.py`): a U-Net degradation encoder producing
per-resolution SFT conditions + a w-latent, and a StyleGAN2 decoder
(clean variant: plain ops, no fused CUDA kernels) modulated by both.

TPU-first notes:
  * ModulatedConv2d's per-sample grouped conv is algebraically
    diagonal: scale the input channels by the style, run ONE dense
    conv shared across the batch, then scale outputs by the demod
    factor. No groups=b conv (which XLA would unroll), same math.
  * Noise inputs default to zeros (deterministic serving, jit-static);
    pass `noises` to reproduce a stored-buffer or random-noise run.
  * Bilinear 2x/0.5x resamples are the dense-matrix `resize` (MXU).

Converter: `convert_gfpgan_state_dict` (convert/torch_loader.py) maps
the official GFPGANv1.4.pth key names. Golden: tests/test_enhancers.py
against a torch replica with the official state_dict layout.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ghost_tpu.core.precision import DEFAULT_POLICY, Policy
from ghost_tpu.nn.layers import Conv, Dense, resize


def _lrelu(x):
    return nn.leaky_relu(x, 0.2)


def _half(x, method="bilinear"):
    b, h, w, c = x.shape
    return resize(x, (h // 2, w // 2), method=method, align_corners=False)


def _double(x, method="bilinear"):
    b, h, w, c = x.shape
    return resize(x, (2 * h, 2 * w), method=method, align_corners=False)


def unet_channels(channel_multiplier: int = 2, narrow: float = 1.0):
    n = narrow * 0.5  # GFPGAN halves the unet width vs the decoder
    return {
        4: int(512 * n), 8: int(512 * n), 16: int(512 * n),
        32: int(512 * n), 64: int(256 * channel_multiplier * n),
        128: int(128 * channel_multiplier * n),
        256: int(64 * channel_multiplier * n),
        512: int(32 * channel_multiplier * n),
        1024: int(16 * channel_multiplier * n),
    }


def decoder_channels(channel_multiplier: int = 2, narrow: float = 1.0):
    return {
        4: int(512 * narrow), 8: int(512 * narrow), 16: int(512 * narrow),
        32: int(512 * narrow), 64: int(256 * channel_multiplier * narrow),
        128: int(128 * channel_multiplier * narrow),
        256: int(64 * channel_multiplier * narrow),
        512: int(32 * channel_multiplier * narrow),
        1024: int(16 * channel_multiplier * narrow),
    }


class CleanResBlock(nn.Module):
    """gfpgan clean ResBlock: conv1 -> resample -> conv2, + 1x1-skip of
    the resampled input. mode: 'down' (bilinear 0.5) or 'up' (2x)."""

    features: int
    mode: str = "down"
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        cd, pd = self.policy.compute_dtype, self.policy.param_dtype
        cin = x.shape[-1]
        res = _lrelu(Conv(cin, 3, padding=1, dtype=cd, param_dtype=pd,
                          name="conv1")(x))
        resample = _half if self.mode == "down" else _double
        res = resample(res)
        res = _lrelu(Conv(self.features, 3, padding=1, dtype=cd,
                          param_dtype=pd, name="conv2")(res))
        skip = Conv(self.features, 1, use_bias=False, dtype=cd,
                    param_dtype=pd, name="skip")(resample(x))
        return res + skip


class ModulatedConv(nn.Module):
    """StyleGAN2 modulated conv (clean): x*(style scale) -> dense conv
    -> per-sample demod scale. Equivalent to torch's groups=b conv."""

    features: int
    kernel_size: int = 3
    demodulate: bool = True
    sample_mode: Optional[str] = None  # None | 'upsample' | 'downsample'
    eps: float = 1e-8
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, style):
        cd, pd = self.policy.compute_dtype, self.policy.param_dtype
        cin = x.shape[-1]
        k = self.kernel_size
        # torch: self.modulation = Linear(num_style_feat, cin)
        s = Dense(cin, dtype=cd, param_dtype=pd,
                  name="modulation")(style.astype(cd))  # (b, cin)
        weight = self.param(
            "weight",
            nn.initializers.normal(1.0 / math.sqrt(cin * k * k)),
            (k, k, cin, self.features), pd)
        if self.sample_mode == "upsample":
            x = _double(x)
        elif self.sample_mode == "downsample":
            x = _half(x)
        import jax.lax as lax

        xw = x.astype(cd) * s[:, None, None, :]
        y = lax.conv_general_dilated(
            xw, weight.astype(cd), window_strides=(1, 1),
            padding=((k // 2, k // 2), (k // 2, k // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.demodulate:
            w2 = (weight.astype(jnp.float32)[None] ** 2
                  * (s.astype(jnp.float32) ** 2)[:, None, None, :, None])
            demod = jnp.reciprocal(jnp.sqrt(
                w2.sum(axis=(1, 2, 3)) + self.eps))  # (b, cout)
            y = y * demod[:, None, None, :].astype(cd)
        return y


class StyleConv(nn.Module):
    features: int
    kernel_size: int = 3
    sample_mode: Optional[str] = None
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, style, noise=None):
        cd, pd = self.policy.compute_dtype, self.policy.param_dtype
        y = ModulatedConv(self.features, self.kernel_size, True,
                          self.sample_mode, policy=self.policy,
                          name="modulated_conv")(x, style)
        y = y * math.sqrt(2.0)  # clean-arch conversion gain
        nw = self.param("noise_weight", nn.initializers.zeros, (1,), pd)
        if noise is not None:
            y = y + nw.astype(cd) * noise.astype(cd)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), pd)
        return _lrelu(y + bias.astype(cd))


class ToRGB(nn.Module):
    upsample: bool = True
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, style, skip=None):
        cd, pd = self.policy.compute_dtype, self.policy.param_dtype
        y = ModulatedConv(3, 1, False, None, policy=self.policy,
                          name="modulated_conv")(x, style)
        bias = self.param("bias", nn.initializers.zeros, (3,), pd)
        y = y + bias.astype(cd)
        if skip is not None:
            if self.upsample:
                skip = _double(skip)
            y = y + skip
        return y


class StyleGAN2CSFT(nn.Module):
    """StyleGAN2 clean decoder with channel-split SFT modulation
    (stylegan2_clean_arch.StyleGAN2GeneratorClean + the CSFT hook)."""

    out_size: int = 512
    num_style_feat: int = 512
    num_mlp: int = 8
    channel_multiplier: int = 2
    narrow: float = 1.0
    sft_half: bool = True
    policy: Policy = DEFAULT_POLICY

    @property
    def log_size(self):
        return int(math.log2(self.out_size))

    @property
    def num_latent(self):
        return self.log_size * 2 - 2

    @property
    def num_layers(self):
        return (self.log_size - 2) * 2 + 1

    def noise_shapes(self, batch: int):
        shapes = []
        for j in range(self.num_layers):
            r = 2 ** ((j + 5) // 2)
            shapes.append((batch, r, r, 1))
        return shapes

    @nn.compact
    def __call__(self, styles, conditions: Sequence, noises=None,
                 input_is_latent: bool = True):
        cd, pd = self.policy.compute_dtype, self.policy.param_dtype
        ch = decoder_channels(self.channel_multiplier, self.narrow)
        if not input_is_latent:
            # upstream prepends NormStyleCode to the style MLP
            # (stylegan2_clean_arch: z * rsqrt(mean(z^2) + 1e-8)) —
            # converted MLP weights expect a normalized z
            w = styles.astype(cd)
            w = w / jnp.sqrt(
                jnp.mean(jnp.square(w), axis=-1, keepdims=True) + 1e-8)
            for j in range(self.num_mlp):
                w = _lrelu(Dense(self.num_style_feat, dtype=cd,
                                 param_dtype=pd, name=f"mlp_{j}")(w))
            styles = w
        if styles.ndim == 2:  # broadcast one w over all layers
            latent = jnp.repeat(styles[:, None, :], self.num_latent, axis=1)
        else:
            latent = styles
        b = latent.shape[0]
        if noises is None:
            noises = [None] * self.num_layers

        const = self.param("constant_input",
                           nn.initializers.normal(1.0),
                           (1, 4, 4, ch[4]), pd)
        out = jnp.broadcast_to(const.astype(cd), (b, 4, 4, ch[4]))
        out = StyleConv(ch[4], 3, None, self.policy, name="style_conv1")(
            out, latent[:, 0], noises[0])
        skip = ToRGB(False, self.policy, name="to_rgb1")(out, latent[:, 1])

        n_stages = self.log_size - 2
        for s in range(n_stages):
            res = 2 ** (s + 3)
            out = StyleConv(ch[res], 3, "upsample", self.policy,
                            name=f"style_convs_{2 * s}")(
                out, latent[:, 2 * s + 1], noises[2 * s + 1])
            # CSFT: conditions[2s] = scale, [2s+1] = shift
            if len(conditions) > 2 * s + 1:
                sc = conditions[2 * s].astype(cd)
                sh = conditions[2 * s + 1].astype(cd)
                if self.sft_half:
                    half = out.shape[-1] // 2
                    same, sft = out[..., :half], out[..., half:]
                    out = jnp.concatenate([same, sft * sc + sh], axis=-1)
                else:
                    out = out * sc + sh
            out = StyleConv(ch[res], 3, None, self.policy,
                            name=f"style_convs_{2 * s + 1}")(
                out, latent[:, 2 * s + 2], noises[2 * s + 2])
            skip = ToRGB(True, self.policy, name=f"to_rgbs_{s}")(
                out, latent[:, 2 * s + 3], skip)
        return skip


class GFPGANClean(nn.Module):
    """GFPGANv1Clean: U-Net encoder -> (latent, SFT conditions) ->
    StyleGAN2 CSFT decoder. Input (b, 512, 512, 3) in [-1, 1] RGB;
    output same shape/range (tanh-free, clip at the call site like the
    upstream restorer does)."""

    out_size: int = 512
    num_style_feat: int = 512
    channel_multiplier: int = 2
    num_mlp: int = 8
    narrow: float = 1.0
    sft_half: bool = True
    different_w: bool = True
    input_is_latent: bool = True
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, noises=None, return_rgb: bool = False):
        cd, pd = self.policy.compute_dtype, self.policy.param_dtype
        ch = unet_channels(self.channel_multiplier, self.narrow)
        log_size = int(math.log2(self.out_size))
        num_latent = log_size * 2 - 2

        feat = _lrelu(Conv(ch[self.out_size], 1, dtype=cd, param_dtype=pd,
                           name="conv_body_first")(x.astype(cd)))
        skips = []
        for i in range(log_size - 2):
            res_out = 2 ** (log_size - 1 - i)
            feat = CleanResBlock(ch[res_out], "down", self.policy,
                                 name=f"conv_body_down_{i}")(feat)
            skips.insert(0, feat)
        feat = _lrelu(Conv(ch[4], 3, padding=1, dtype=cd, param_dtype=pd,
                           name="final_conv")(feat))

        b = feat.shape[0]
        out_dim = (num_latent * self.num_style_feat
                   if self.different_w else self.num_style_feat)
        # NHWC flatten; the converter permutes torch's NCHW-flat weight
        style = Dense(out_dim, dtype=cd, param_dtype=pd,
                      name="final_linear")(feat.reshape(b, -1))
        if self.different_w:
            style = style.reshape(b, num_latent, self.num_style_feat)

        conditions, rgbs = [], []
        for i in range(log_size - 2):
            res = 2 ** (i + 3)
            feat = feat + skips[i]
            feat = CleanResBlock(ch[res], "up", self.policy,
                                 name=f"conv_body_up_{i}")(feat)
            c = ch[res]
            # second conv of each condition pair emits the width the
            # decoder modulates: its sft HALF (= unet c, decoder c/2)
            # under sft_half, the FULL decoder width (= 2c) otherwise
            # (upstream sft_out_channels = out_channels if sft_half
            # else out_channels * 2)
            c_out = c if self.sft_half else 2 * c
            sc = Conv(c, 3, padding=1, dtype=cd, param_dtype=pd,
                      name=f"condition_scale_{i}_0")(feat)
            sc = Conv(c_out, 3, padding=1, dtype=cd, param_dtype=pd,
                      name=f"condition_scale_{i}_1")(_lrelu(sc))
            sh = Conv(c, 3, padding=1, dtype=cd, param_dtype=pd,
                      name=f"condition_shift_{i}_0")(feat)
            sh = Conv(c_out, 3, padding=1, dtype=cd, param_dtype=pd,
                      name=f"condition_shift_{i}_1")(_lrelu(sh))
            conditions += [sc, sh]
            if return_rgb:
                rgbs.append(Conv(3, 1, dtype=cd, param_dtype=pd,
                                 name=f"toRGB_{i}")(feat))

        image = StyleGAN2CSFT(
            self.out_size, self.num_style_feat, self.num_mlp,
            self.channel_multiplier, self.narrow, self.sft_half,
            self.policy, name="stylegan_decoder")(
                style, conditions, noises,
                input_is_latent=self.input_is_latent)
        return (image, rgbs) if return_rgb else (image, None)
