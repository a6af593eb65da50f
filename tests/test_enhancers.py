"""Native RealESRGAN/GFPGAN enhancer parity.

The reference applies GFPGAN (face) + RealESRGAN (background) from
external pip packages (reference utils/training/upsampler.py:25-47).
Those packages are absent here, so the goldens are hand-written torch
replicas that follow the upstream architecture definitions
(basicsr `rrdbnet_arch.py`, gfpgan `gfpganv1_clean_arch.py` /
`stylegan2_clean_arch.py`) with the official state_dict key names —
the same names the converters consume, so a real checkpoint loads
through the identical path the test exercises.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ghost_tpu.convert.torch_loader import convert_rrdbnet_state_dict
from ghost_tpu.core.precision import FULL_PRECISION
from ghost_tpu.models.sr.rrdb import RRDBNet


class TorchRDB(tnn.Module):
    def __init__(self, nf, gc):
        super().__init__()
        self.conv1 = tnn.Conv2d(nf, gc, 3, 1, 1)
        self.conv2 = tnn.Conv2d(nf + gc, gc, 3, 1, 1)
        self.conv3 = tnn.Conv2d(nf + 2 * gc, gc, 3, 1, 1)
        self.conv4 = tnn.Conv2d(nf + 3 * gc, gc, 3, 1, 1)
        self.conv5 = tnn.Conv2d(nf + 4 * gc, nf, 3, 1, 1)

    def forward(self, x):
        lrelu = lambda t: F.leaky_relu(t, 0.2)
        x1 = lrelu(self.conv1(x))
        x2 = lrelu(self.conv2(torch.cat((x, x1), 1)))
        x3 = lrelu(self.conv3(torch.cat((x, x1, x2), 1)))
        x4 = lrelu(self.conv4(torch.cat((x, x1, x2, x3), 1)))
        x5 = self.conv5(torch.cat((x, x1, x2, x3, x4), 1))
        return x5 * 0.2 + x


class TorchRRDB(tnn.Module):
    def __init__(self, nf, gc):
        super().__init__()
        self.rdb1, self.rdb2, self.rdb3 = (
            TorchRDB(nf, gc), TorchRDB(nf, gc), TorchRDB(nf, gc))

    def forward(self, x):
        return self.rdb3(self.rdb2(self.rdb1(x))) * 0.2 + x


class TorchRRDBNet(tnn.Module):
    """basicsr rrdbnet_arch.RRDBNet with the official attribute names."""

    def __init__(self, in_ch, out_ch, nf, nb, gc, scale=4):
        super().__init__()
        self.scale = scale
        if scale == 2:
            in_ch *= 4
        elif scale == 1:
            in_ch *= 16
        self.conv_first = tnn.Conv2d(in_ch, nf, 3, 1, 1)
        self.body = tnn.Sequential(*[TorchRRDB(nf, gc) for _ in range(nb)])
        self.conv_body = tnn.Conv2d(nf, nf, 3, 1, 1)
        self.conv_up1 = tnn.Conv2d(nf, nf, 3, 1, 1)
        self.conv_up2 = tnn.Conv2d(nf, nf, 3, 1, 1)
        self.conv_hr = tnn.Conv2d(nf, nf, 3, 1, 1)
        self.conv_last = tnn.Conv2d(nf, out_ch, 3, 1, 1)

    def forward(self, x):
        lrelu = lambda t: F.leaky_relu(t, 0.2)
        if self.scale == 2:
            x = F.pixel_unshuffle(x, 2)
        elif self.scale == 1:
            x = F.pixel_unshuffle(x, 4)
        feat = self.conv_first(x)
        feat = feat + self.conv_body(self.body(feat))
        feat = lrelu(self.conv_up1(
            F.interpolate(feat, scale_factor=2, mode="nearest")))
        feat = lrelu(self.conv_up2(
            F.interpolate(feat, scale_factor=2, mode="nearest")))
        return self.conv_last(lrelu(self.conv_hr(feat)))


@pytest.mark.parametrize("scale", [4, 2])
def test_rrdbnet_torch_golden(scale):
    torch.manual_seed(0)
    nf, gc, nb = 8, 4, 2
    tm = TorchRRDBNet(3, 3, nf, nb, gc, scale=scale).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_rrdbnet_state_dict(sd, num_block=nb)

    model = RRDBNet(num_feat=nf, num_block=nb, num_grow_ch=gc, scale=scale,
                    policy=FULL_PRECISION)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
    out = jax.jit(model.apply)(variables, jnp.asarray(x))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)
    assert out.shape == ref.shape == (2, 16 * scale, 16 * scale, 3)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# GFPGAN v1 clean
# ---------------------------------------------------------------------------

import math

from ghost_tpu.convert.torch_loader import convert_gfpgan_state_dict
from ghost_tpu.models.sr.gfpgan import (GFPGANClean, decoder_channels,
                                        unet_channels)


class TModulatedConv2d(tnn.Module):
    def __init__(self, cin, cout, k, nsf, demodulate=True, sample_mode=None):
        super().__init__()
        self.cout, self.k = cout, k
        self.demodulate, self.sample_mode = demodulate, sample_mode
        self.weight = tnn.Parameter(
            torch.randn(1, cout, cin, k, k) / math.sqrt(cin * k * k))
        self.modulation = tnn.Linear(nsf, cin)

    def forward(self, x, style):
        b, c, _, _ = x.shape
        style = self.modulation(style).view(b, 1, c, 1, 1)
        weight = self.weight * style
        if self.demodulate:
            demod = torch.rsqrt(weight.pow(2).sum([2, 3, 4]) + 1e-8)
            weight = weight * demod.view(b, self.cout, 1, 1, 1)
        weight = weight.view(b * self.cout, c, self.k, self.k)
        if self.sample_mode == "upsample":
            x = F.interpolate(x, scale_factor=2, mode="bilinear",
                              align_corners=False)
        elif self.sample_mode == "downsample":
            x = F.interpolate(x, scale_factor=0.5, mode="bilinear",
                              align_corners=False)
        b, c, h, w = x.shape
        out = F.conv2d(x.view(1, b * c, h, w), weight,
                       padding=self.k // 2, groups=b)
        return out.view(b, self.cout, h, w)


class TStyleConv(tnn.Module):
    def __init__(self, cin, cout, k, nsf, sample_mode=None):
        super().__init__()
        self.modulated_conv = TModulatedConv2d(cin, cout, k, nsf, True,
                                               sample_mode)
        self.weight = tnn.Parameter(torch.zeros(1))
        self.bias = tnn.Parameter(torch.zeros(1, cout, 1, 1))

    def forward(self, x, style, noise):
        out = self.modulated_conv(x, style) * 2 ** 0.5
        out = out + self.weight * noise
        return F.leaky_relu(out + self.bias, 0.2)


class TToRGB(tnn.Module):
    def __init__(self, cin, nsf, upsample=True):
        super().__init__()
        self.upsample = upsample
        self.modulated_conv = TModulatedConv2d(cin, 3, 1, nsf, False, None)
        self.bias = tnn.Parameter(torch.zeros(1, 3, 1, 1))

    def forward(self, x, style, skip=None):
        out = self.modulated_conv(x, style) + self.bias
        if skip is not None:
            if self.upsample:
                skip = F.interpolate(skip, scale_factor=2, mode="bilinear",
                                     align_corners=False)
            out = out + skip
        return out


class TResBlock(tnn.Module):
    def __init__(self, cin, cout, mode):
        super().__init__()
        self.sf = 0.5 if mode == "down" else 2
        self.conv1 = tnn.Conv2d(cin, cin, 3, 1, 1)
        self.conv2 = tnn.Conv2d(cin, cout, 3, 1, 1)
        self.skip = tnn.Conv2d(cin, cout, 1, bias=False)

    def forward(self, x):
        out = F.leaky_relu(self.conv1(x), 0.2)
        out = F.interpolate(out, scale_factor=self.sf, mode="bilinear",
                            align_corners=False)
        out = F.leaky_relu(self.conv2(out), 0.2)
        x = F.interpolate(x, scale_factor=self.sf, mode="bilinear",
                          align_corners=False)
        return out + self.skip(x)


class TStyleGAN2CSFT(tnn.Module):
    def __init__(self, out_size, nsf, num_mlp, cm, narrow, sft_half):
        super().__init__()
        ch = {k: v for k, v in decoder_channels(cm, narrow).items()}
        self.log_size = int(math.log2(out_size))
        self.sft_half = sft_half
        layers = []
        for _ in range(num_mlp):
            layers += [tnn.Linear(nsf, nsf), tnn.LeakyReLU(0.2)]
        self.style_mlp = tnn.Sequential(*layers)

        class _Const(tnn.Module):
            def __init__(s, c):
                super().__init__()
                s.weight = tnn.Parameter(torch.randn(1, c, 4, 4))

        self.constant_input = _Const(ch[4])
        self.style_conv1 = TStyleConv(ch[4], ch[4], 3, nsf, None)
        self.to_rgb1 = TToRGB(ch[4], nsf, upsample=False)
        self.style_convs = tnn.ModuleList()
        self.to_rgbs = tnn.ModuleList()
        cin = ch[4]
        for i in range(3, self.log_size + 1):
            cout = ch[2 ** i]
            self.style_convs.append(
                TStyleConv(cin, cout, 3, nsf, "upsample"))
            self.style_convs.append(TStyleConv(cout, cout, 3, nsf, None))
            self.to_rgbs.append(TToRGB(cout, nsf, upsample=True))
            cin = cout

    def forward(self, latent, conditions, noise):
        out = self.constant_input.weight.repeat(latent.shape[0], 1, 1, 1)
        out = self.style_conv1(out, latent[:, 0], noise[0])
        skip = self.to_rgb1(out, latent[:, 1])
        i = 1
        for conv1, conv2, n1, n2, to_rgb in zip(
                self.style_convs[::2], self.style_convs[1::2],
                noise[1::2], noise[2::2], self.to_rgbs):
            out = conv1(out, latent[:, i], n1)
            if self.sft_half:
                same, sft = torch.split(out, out.size(1) // 2, dim=1)
                sft = sft * conditions[i - 1] + conditions[i]
                out = torch.cat([same, sft], dim=1)
            else:
                out = out * conditions[i - 1] + conditions[i]
            out = conv2(out, latent[:, i + 1], n2)
            skip = to_rgb(out, latent[:, i + 2], skip)
            i += 2
        return skip


class TGFPGANv1Clean(tnn.Module):
    """gfpganv1_clean_arch.GFPGANv1Clean with the official attribute
    names (different_w=True, input_is_latent=True, sft_half=True)."""

    def __init__(self, out_size, nsf, cm, num_mlp, narrow):
        super().__init__()
        uch = unet_channels(cm, narrow)
        self.log_size = int(math.log2(out_size))
        self.nsf = nsf
        self.conv_body_first = tnn.Conv2d(3, uch[out_size], 1)
        self.conv_body_down = tnn.ModuleList()
        cin = uch[out_size]
        for i in range(self.log_size, 2, -1):
            cout = uch[2 ** (i - 1)]
            self.conv_body_down.append(TResBlock(cin, cout, "down"))
            cin = cout
        self.final_conv = tnn.Conv2d(cin, uch[4], 3, 1, 1)
        num_latent = self.log_size * 2 - 2
        self.final_linear = tnn.Linear(uch[4] * 16, num_latent * nsf)
        self.conv_body_up = tnn.ModuleList()
        self.condition_scale = tnn.ModuleList()
        self.condition_shift = tnn.ModuleList()
        self.toRGB = tnn.ModuleList()
        cin = uch[4]
        for i in range(3, self.log_size + 1):
            cout = uch[2 ** i]
            self.conv_body_up.append(TResBlock(cin, cout, "up"))
            self.condition_scale.append(tnn.Sequential(
                tnn.Conv2d(cout, cout, 3, 1, 1), tnn.LeakyReLU(0.2),
                tnn.Conv2d(cout, cout, 3, 1, 1)))
            self.condition_shift.append(tnn.Sequential(
                tnn.Conv2d(cout, cout, 3, 1, 1), tnn.LeakyReLU(0.2),
                tnn.Conv2d(cout, cout, 3, 1, 1)))
            self.toRGB.append(tnn.Conv2d(cout, 3, 1))
            cin = cout
        self.stylegan_decoder = TStyleGAN2CSFT(
            out_size, nsf, num_mlp, cm, narrow, True)

    def forward(self, x, noise):
        feat = F.leaky_relu(self.conv_body_first(x), 0.2)
        skips = []
        for block in self.conv_body_down:
            feat = block(feat)
            skips.insert(0, feat)
        feat = F.leaky_relu(self.final_conv(feat), 0.2)
        style = self.final_linear(feat.reshape(feat.size(0), -1))
        latent = style.view(style.size(0), -1, self.nsf)
        conditions = []
        for i, block in enumerate(self.conv_body_up):
            feat = feat + skips[i]
            feat = block(feat)
            conditions.append(self.condition_scale[i](feat))
            conditions.append(self.condition_shift[i](feat))
        return self.stylegan_decoder(latent, conditions, noise)


def test_gfpgan_clean_torch_golden():
    torch.manual_seed(0)
    out_size, nsf, cm, narrow = 32, 32, 2, 0.25
    tm = TGFPGANv1Clean(out_size, nsf, cm, 2, narrow).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_gfpgan_state_dict(sd, out_size=out_size,
                                          num_style_feat=nsf)

    model = GFPGANClean(out_size=out_size, num_style_feat=nsf,
                        channel_multiplier=cm, num_mlp=2, narrow=narrow,
                        policy=FULL_PRECISION)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, out_size, out_size, 3)).astype(np.float32)

    num_layers = (int(math.log2(out_size)) - 2) * 2 + 1
    tnoise = [torch.zeros(2, 1, 2 ** ((j + 5) // 2), 2 ** ((j + 5) // 2))
              for j in range(num_layers)]
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)), tnoise)
    ref = ref.numpy().transpose(0, 2, 3, 1)

    out, _ = jax.jit(
        lambda v, im: model.apply(v, im))(variables, jnp.asarray(x))
    assert out.shape == ref.shape == (2, out_size, out_size, 3)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------------------
# Enhance pipeline (reference upsample() parity surface)
# ---------------------------------------------------------------------------


def test_face_enhancer_pipeline_runs():
    """Random-weights smoke of the jitted detect->align->GFPGAN->paste
    (+RRDB background) chunk program: shapes static, output u8, frames
    without a detected face pass through the bg path only."""
    from ghost_tpu.models.scrfd import SCRFD
    from ghost_tpu.models.sr.rrdb import RRDBNet as JRRDB
    from ghost_tpu.pipeline.enhance import FaceEnhancer

    key = jax.random.key(0)
    det = SCRFD()
    det_vars = det.init(key, jnp.zeros((1, 128, 128, 3)))
    gfp = GFPGANClean(out_size=64, num_style_feat=32, channel_multiplier=2,
                      num_mlp=2, narrow=0.25)
    gfp_vars = gfp.init(key, jnp.zeros((1, 64, 64, 3)))
    bg = JRRDB(num_feat=8, num_block=1, num_grow_ch=4, scale=4)
    bg_vars = bg.init(key, jnp.zeros((1, 16, 16, 3)))

    enh = FaceEnhancer((det, det_vars), (gfp, gfp_vars), (bg, bg_vars),
                       det_size=128, max_faces=2, crop_size=64)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (2, 96, 128, 3), dtype=np.uint8)
    out = enh.enhance(frames)
    assert out.shape == frames.shape and out.dtype == np.uint8

    # face-free path (threshold 2.0 disables every lane): with no bg
    # model the frame must pass through bit-exact
    enh2 = FaceEnhancer((det, det_vars), (gfp, gfp_vars), None,
                        det_size=128, max_faces=2, crop_size=64,
                        det_thresh=2.0)
    out2 = enh2.enhance(frames)
    np.testing.assert_array_equal(out2, frames)


def test_face_enhancer_lane_skip_equivalence():
    """Lane skipping is semantics-free: with a threshold that admits
    only the top-scoring face, a max_faces=4 enhancer (lanes 1-3
    cond-skipped) must reproduce a max_faces=1 enhancer bit-exactly —
    decode's lanes are score-sorted, so lane 0 is the same face in
    both."""
    from ghost_tpu.models.scrfd import SCRFD, decode_detections, \
        preprocess_frames
    from ghost_tpu.pipeline.enhance import FaceEnhancer

    key = jax.random.key(2)
    det = SCRFD()
    det_vars = det.init(key, jnp.zeros((1, 128, 128, 3)))
    gfp = GFPGANClean(out_size=64, num_style_feat=32, channel_multiplier=2,
                      num_mlp=2, narrow=0.25)
    gfp_vars = gfp.init(key, jnp.zeros((1, 64, 64, 3)))

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (2, 96, 128, 3), dtype=np.uint8)

    # pick a threshold separating the top-1 and top-2 scores per frame
    canvas, _ = preprocess_frames(jnp.asarray(frames), 128)
    scores, _, _ = decode_detections(det.apply(det_vars, canvas),
                                     input_size=128, score_thresh=0.0,
                                     max_faces=4)
    s = np.asarray(scores)
    lo, hi = float(np.max(s[:, 1])), float(np.min(s[:, 0]))
    assert lo < hi, "random detector scores not separable; reseed"
    thresh = 0.5 * (lo + hi)

    outs = []
    for max_faces in (4, 1):
        enh = FaceEnhancer((det, det_vars), (gfp, gfp_vars), None,
                           det_size=128, max_faces=max_faces, crop_size=64,
                           det_thresh=thresh)
        outs.append(enh.enhance(frames))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_face_enhancer_srvgg_background():
    """FaceEnhancer is bg-model-agnostic: the fast SRVGGNetCompact
    (realesr-general-x4v3, the reference Dockerfile's lightweight
    upsampler) slots into the background seat (`--bg_model srvgg`)."""
    from ghost_tpu.models.scrfd import SCRFD
    from ghost_tpu.models.sr.srvgg import SRVGGNetCompact as JSRVGG
    from ghost_tpu.pipeline.enhance import FaceEnhancer

    key = jax.random.key(0)
    det = SCRFD()
    det_vars = det.init(key, jnp.zeros((1, 128, 128, 3)))
    gfp = GFPGANClean(out_size=64, num_style_feat=32, channel_multiplier=2,
                      num_mlp=2, narrow=0.25)
    gfp_vars = gfp.init(key, jnp.zeros((1, 64, 64, 3)))
    bg = JSRVGG(num_feat=8, num_conv=2, upscale=4)
    bg_vars = bg.init(key, jnp.zeros((1, 16, 16, 3)))

    enh = FaceEnhancer((det, det_vars), (gfp, gfp_vars), (bg, bg_vars),
                       det_size=128, max_faces=2, crop_size=64)
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (2, 96, 128, 3), dtype=np.uint8)
    out = enh.enhance(frames)
    assert out.shape == frames.shape and out.dtype == np.uint8


# ---------------------------------------------------------------------------
# SRVGGNetCompact (realesr-general-x4v3)
# ---------------------------------------------------------------------------

from ghost_tpu.convert.torch_loader import convert_srvgg_state_dict
from ghost_tpu.models.sr.srvgg import SRVGGNetCompact, pixel_shuffle


class TorchSRVGG(tnn.Module):
    """realesrgan srvgg_arch.SRVGGNetCompact with the official `body`
    ModuleList layout (conv/PReLU alternating, final conv last)."""

    def __init__(self, in_ch, out_ch, nf, nc, upscale):
        super().__init__()
        self.upscale = upscale
        body = [tnn.Conv2d(in_ch, nf, 3, 1, 1), tnn.PReLU(nf)]
        for _ in range(nc):
            body += [tnn.Conv2d(nf, nf, 3, 1, 1), tnn.PReLU(nf)]
        body.append(tnn.Conv2d(nf, out_ch * upscale ** 2, 3, 1, 1))
        self.body = tnn.ModuleList(body)

    def forward(self, x):
        out = x
        for layer in self.body:
            out = layer(out)
        out = F.pixel_shuffle(out, self.upscale)
        return out + F.interpolate(x, scale_factor=self.upscale,
                                   mode="nearest")


@pytest.mark.parametrize("upscale", [4, 2])
def test_srvgg_torch_golden(upscale):
    torch.manual_seed(0)
    nf, nc = 8, 3
    tm = TorchSRVGG(3, 3, nf, nc, upscale).eval()
    # break the symmetric PReLU init so the test exercises real slopes
    with torch.no_grad():
        for m in tm.body:
            if isinstance(m, tnn.PReLU):
                m.weight.uniform_(0.05, 0.5)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_srvgg_state_dict(sd, num_conv=nc)

    model = SRVGGNetCompact(num_feat=nf, num_conv=nc, upscale=upscale,
                            policy=FULL_PRECISION)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 12, 12, 3)).astype(np.float32)
    out = jax.jit(model.apply)(variables, jnp.asarray(x))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)
    assert out.shape == ref.shape == (2, 12 * upscale, 12 * upscale, 3)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_pixel_shuffle_roundtrip():
    from ghost_tpu.models.sr.rrdb import pixel_unshuffle

    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (2, 6, 8, 5)).astype(np.float32)
    y = pixel_shuffle(pixel_unshuffle(jnp.asarray(x), 2), 2)
    np.testing.assert_array_equal(np.asarray(y), x)


# ---------------------------------------------------------------------------
# Tiled background upsampling (RealESRGANer tile/tile_pad parity)
# ---------------------------------------------------------------------------


def test_upscale_tiled_single_tile_exact():
    """One tile with pad=0 IS the plain forward — stitching is exact."""
    from ghost_tpu.models.sr.rrdb import RRDBNet as JRRDB
    from ghost_tpu.pipeline.enhance import upscale_tiled

    key = jax.random.key(1)
    bg = JRRDB(num_feat=8, num_block=1, num_grow_ch=4, scale=4)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (2, 16, 24, 3)).astype(np.float32))
    v = bg.init(key, x)
    direct = bg.apply(v, x)
    tiled = upscale_tiled(bg, v, x, tile=(16, 24), tile_pad=0)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)


def test_upscale_tiled_halo_converges_to_full_frame():
    """2x2 tile grid stitches to the full x4 canvas; halos clamp to
    the image bounds (RealESRGANer parity), so as the halo grows past
    the receptive field the tiled output converges to the full-frame
    pass EVERYWHERE — at pad=8 (tile 16 on a 32px frame the halo spans
    the whole image) the two must match exactly."""
    from ghost_tpu.models.sr.rrdb import RRDBNet as JRRDB
    from ghost_tpu.pipeline.enhance import upscale_tiled

    key = jax.random.key(2)
    bg = JRRDB(num_feat=8, num_block=1, num_grow_ch=4, scale=4)
    x = jnp.asarray(np.random.default_rng(1).uniform(
        0, 1, (1, 32, 32, 3)).astype(np.float32))
    v = bg.init(key, x)
    full = np.asarray(bg.apply(v, x))
    prev = None
    for pad in (2, 4, 8):
        tiled = np.asarray(upscale_tiled(bg, v, x, tile=16, tile_pad=pad))
        assert tiled.shape == full.shape == (1, 128, 128, 3)
        err = float(np.abs(tiled - full).max())
        if prev is not None:
            assert err <= prev + 1e-6, (pad, err, prev)
        prev = err
    np.testing.assert_allclose(tiled, full, rtol=1e-5, atol=1e-5)


def test_tiled_downscale_folding_exact():
    """Per-tile x4 -> area x1 downscale + stitch equals stitching the
    full x4 canvas then area-resizing (the 4x4 box average is
    tile-aligned)."""
    from ghost_tpu.models.sr.rrdb import RRDBNet as JRRDB
    from ghost_tpu.nn.layers import resize
    from ghost_tpu.pipeline.enhance import _tiled_rect

    key = jax.random.key(3)
    bg = JRRDB(num_feat=8, num_block=1, num_grow_ch=4, scale=4)
    x = jnp.asarray(np.random.default_rng(2).uniform(
        0, 1, (1, 32, 32, 3)).astype(np.float32))
    v = bg.init(key, x)
    big = _tiled_rect(bg, v, x, 16, 16, 4)
    ref = np.asarray(resize(big.astype(jnp.float32), (32, 32),
                            method="area"))
    got = np.asarray(_tiled_rect(bg, v, x, 16, 16, 4, downscale=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_bg_tile_fitting():
    """Non-dividing resolutions must TILE (fitted divisor dims), never
    silently fall back to the whole-frame RRDB x4 pass the tiling
    exists to avoid (720 % 270 != 0 was exactly that trap)."""
    from ghost_tpu.pipeline.enhance import _fit_tile

    assert _fit_tile((270, 240), 1080, 1920) == (270, 240)
    assert _fit_tile((270, 240), 720, 1280) == (240, 160)  # 720p tiles
    assert _fit_tile((270, 240), 480, 854) == (240, 122)
    assert _fit_tile((270, 240), 96, 128) == (96, 128)  # <= one tile
    with pytest.raises(ValueError):  # prime-ish dims: loud, not OOM
        _fit_tile((270, 240), 1082, 1920)


def test_face_enhancer_bg_non_divisible_resolution():
    """End-to-end bg path at a resolution the preferred tile does not
    divide: fitted tiles + squeezed halo produce the right shape."""
    from ghost_tpu.models.scrfd import SCRFD
    from ghost_tpu.models.sr.srvgg import SRVGGNetCompact
    from ghost_tpu.pipeline.enhance import FaceEnhancer

    key = jax.random.key(0)
    det = SCRFD()
    det_vars = det.init(key, jnp.zeros((1, 128, 128, 3)))
    gfp = GFPGANClean(out_size=64, num_style_feat=32, channel_multiplier=2,
                      num_mlp=2, narrow=0.25)
    gfp_vars = gfp.init(key, jnp.zeros((1, 64, 64, 3)))
    bg = SRVGGNetCompact(num_feat=8, num_conv=2, upscale=4)
    bg_vars = bg.init(key, jnp.zeros((1, 16, 16, 3)))

    # 48x64 with preferred 32x48 tiles -> fitted 24x32, pad 10
    enh = FaceEnhancer((det, det_vars), (gfp, gfp_vars), (bg, bg_vars),
                       det_size=128, max_faces=1, crop_size=64,
                       bg_tile=(32, 48), bg_tile_pad=10)
    frames = np.random.default_rng(0).integers(
        0, 255, (1, 48, 64, 3), dtype=np.uint8)
    out = enh.enhance(frames)
    assert out.shape == frames.shape and out.dtype == np.uint8


def test_gfpgan_z_path_norm_and_sft_full():
    """Two fixed parity details: the z->w style MLP prepends upstream's
    NormStyleCode (so the path is scale-invariant in z), and
    sft_half=False widens the condition output convs to the decoder's
    full width (it used to shape-mismatch at trace time)."""
    from ghost_tpu.core.precision import FULL_PRECISION
    from ghost_tpu.models.sr.gfpgan import GFPGANClean

    mod = GFPGANClean(out_size=64, num_style_feat=32, channel_multiplier=2,
                      num_mlp=2, narrow=0.25, sft_half=False,
                      different_w=False, input_is_latent=False,
                      policy=FULL_PRECISION)
    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 0.5, (1, 64, 64, 3)).astype(np.float32))
    v = mod.init(jax.random.key(0), x)
    y1, _ = mod.apply(v, x)
    assert y1.shape == x.shape  # full-SFT branch broadcasts

    # NormStyleCode makes w invariant to the latent's scale; the
    # encoder-derived latent IS the z here (input_is_latent=False), so
    # scale-invariance is exercised through the mlp stack by construction
    from ghost_tpu.models.sr.gfpgan import StyleGAN2CSFT
    dec = StyleGAN2CSFT(out_size=16, num_style_feat=16, num_mlp=2,
                        channel_multiplier=2, narrow=0.25,
                        policy=FULL_PRECISION)
    z = jnp.asarray(np.random.default_rng(1).normal(
        0, 1, (1, 16)).astype(np.float32))
    dv = dec.init(jax.random.key(1), z, [], input_is_latent=False)
    out1 = dec.apply(dv, z, [], input_is_latent=False)
    out2 = dec.apply(dv, z * 1000.0, [], input_is_latent=False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=2e-4)
