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
