"""FANAWL parity vs a torch replica with the official WFLW_4HG.pth
state-dict layout (public AdaptiveWingLoss core/models.py +
core/coord_conv.py sources; the reference's vendored submodule is
empty, download_models.sh:20). Tiny config: 2 stacks, depth 2,
8 features, 6+1 heatmap channels — exercises the CoordConv stem, the
boundary-masked coordinates of stack 2, and every converter path."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ghost_tpu.convert.torch_loader import convert_fan_awl_state_dict
from ghost_tpu.core.precision import FULL_PRECISION
from ghost_tpu.models.fan_awl import FANAWL

FEAT, MID, DEPTH, MODULES, LMK = 12, 8, 2, 2, 6


def conv3x3(cin, cout):
    return tnn.Conv2d(cin, cout, 3, 1, 1, bias=False)


class TAddCoords(tnn.Module):
    def __init__(self, with_r, with_boundary):
        super().__init__()
        self.with_r, self.with_boundary = with_r, with_boundary

    def forward(self, x, heatmap=None):
        b, _, h, w = x.shape
        xx = torch.arange(h, dtype=x.dtype)[None, None, :, None]
        xx = (xx / (h - 1) * 2 - 1).expand(b, 1, h, w)
        yy = torch.arange(w, dtype=x.dtype)[None, None, None, :]
        yy = (yy / (w - 1) * 2 - 1).expand(b, 1, h, w)
        ret = torch.cat([x, xx, yy], 1)
        if self.with_r:
            rr = torch.sqrt(xx ** 2 + yy ** 2)
            ret = torch.cat([ret, rr / rr.max()], 1)
        if self.with_boundary and heatmap is not None:
            bc = torch.clamp(heatmap[:, -1:], 0.0, 1.0)
            ret = torch.cat([ret,
                             torch.where(bc > 0.05, xx, torch.zeros_like(xx)),
                             torch.where(bc > 0.05, yy,
                                         torch.zeros_like(yy))], 1)
        return ret


class TCoordConv(tnn.Module):
    def __init__(self, with_r, with_boundary, in_ch, first_one=False,
                 out_channels=0, kernel_size=1, stride=1, padding=0):
        super().__init__()
        self.addcoords = TAddCoords(with_r, with_boundary and not first_one)
        in_ch += 2 + (1 if with_r else 0)
        if with_boundary and not first_one:
            in_ch += 2
        self.conv = tnn.Conv2d(in_ch, out_channels, kernel_size, stride,
                               padding)

    def forward(self, x, heatmap=None):
        return self.conv(self.addcoords(x, heatmap))


class TConvBlock(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.bn1 = tnn.BatchNorm2d(cin)
        self.conv1 = conv3x3(cin, cout // 2)
        self.bn2 = tnn.BatchNorm2d(cout // 2)
        self.conv2 = conv3x3(cout // 2, cout // 4)
        self.bn3 = tnn.BatchNorm2d(cout // 4)
        self.conv3 = conv3x3(cout // 4, cout // 4)
        if cin != cout:
            self.downsample = tnn.Sequential(
                tnn.BatchNorm2d(cin), tnn.ReLU(True),
                tnn.Conv2d(cin, cout, 1, 1, bias=False))
        else:
            self.downsample = None

    def forward(self, x):
        o1 = self.conv1(F.relu(self.bn1(x)))
        o2 = self.conv2(F.relu(self.bn2(o1)))
        o3 = self.conv3(F.relu(self.bn3(o2)))
        out = torch.cat([o1, o2, o3], 1)
        return out + (self.downsample(x) if self.downsample is not None
                      else x)


class THourGlass(tnn.Module):
    def __init__(self, depth, feat, first_one):
        super().__init__()
        self.depth = depth
        self.coordconv = TCoordConv(True, True, feat, first_one,
                                    out_channels=feat, kernel_size=1)
        for lvl in range(depth, 0, -1):
            self.add_module(f"b1_{lvl}", TConvBlock(feat, feat))
            self.add_module(f"b2_{lvl}", TConvBlock(feat, feat))
            self.add_module(f"b3_{lvl}", TConvBlock(feat, feat))
        self.add_module("b2_plus_1", TConvBlock(feat, feat))

    def _fwd(self, level, inp):
        up1 = getattr(self, f"b1_{level}")(inp)
        low = F.avg_pool2d(inp, 2)
        low = getattr(self, f"b2_{level}")(low)
        if level > 1:
            low = self._fwd(level - 1, low)
        else:
            low = self.b2_plus_1(low)
        low = getattr(self, f"b3_{level}")(low)
        return up1 + F.interpolate(low, scale_factor=2, mode="nearest")

    def forward(self, x, heatmap):
        return self._fwd(self.depth, self.coordconv(x, heatmap))


class TFAN(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = TCoordConv(True, False, 3, out_channels=64,
                                kernel_size=7, stride=2, padding=3)
        self.bn1 = tnn.BatchNorm2d(64)
        self.conv2 = TConvBlock(64, MID)
        self.conv3 = TConvBlock(MID, MID)
        self.conv4 = TConvBlock(MID, FEAT)
        for m in range(MODULES):
            self.add_module(f"m{m}", THourGlass(DEPTH, FEAT, m == 0))
            self.add_module(f"top_m_{m}", TConvBlock(FEAT, FEAT))
            self.add_module(f"conv_last{m}", tnn.Conv2d(FEAT, FEAT, 1))
            self.add_module(f"bn_end{m}", tnn.BatchNorm2d(FEAT))
            self.add_module(f"l{m}", tnn.Conv2d(FEAT, LMK + 1, 1))
            if m < MODULES - 1:
                self.add_module(f"bl{m}", tnn.Conv2d(FEAT, FEAT, 1))
                self.add_module(f"al{m}", tnn.Conv2d(LMK + 1, FEAT, 1))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)), True)
        x = self.conv2(x)
        x = F.avg_pool2d(x, 2)
        x = self.conv4(self.conv3(x))
        prev, tmp = x, None
        outs = []
        for m in range(MODULES):
            hg = getattr(self, f"m{m}")(prev, tmp)
            ll = getattr(self, f"top_m_{m}")(hg)
            ll = F.relu(getattr(self, f"bn_end{m}")(
                getattr(self, f"conv_last{m}")(ll)), True)
            tmp = getattr(self, f"l{m}")(ll)
            outs.append(tmp)
            if m < MODULES - 1:
                prev = prev + getattr(self, f"bl{m}")(ll) \
                    + getattr(self, f"al{m}")(tmp)
        return outs


def test_fan_awl_torch_golden():
    torch.manual_seed(0)
    tm = TFAN().eval()
    # non-trivial running stats + a boundary channel that actually
    # crosses the 0.05 gate
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.5, 1.5)
        tm.l0.bias.uniform_(-0.2, 0.3)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_fan_awl_state_dict(sd, num_modules=MODULES,
                                           depth=DEPTH)

    model = FANAWL(num_modules=MODULES, num_landmarks=LMK, features=FEAT,
                   mid_features=MID, depth=DEPTH, policy=FULL_PRECISION)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    outs = jax.jit(model.apply)(variables, jnp.asarray(x))
    with torch.no_grad():
        refs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    assert len(outs) == len(refs) == MODULES
    for got, ref in zip(outs, refs):
        ref = ref.numpy().transpose(0, 2, 3, 1)
        assert got.shape == ref.shape == (2, 16, 16, LMK + 1)
        np.testing.assert_allclose(np.asarray(got), ref,
                                   rtol=2e-4, atol=2e-4)


def test_fan_awl_eye_channels():
    """FANAWL heatmaps feed eye_heatmaps unchanged (the first 98
    channels are the WFLW points; channel 98 is the boundary)."""
    from ghost_tpu.models.fan import eye_heatmaps

    hm = jnp.arange(2 * 4 * 4 * 99, dtype=jnp.float32).reshape(2, 4, 4, 99)
    left, right = eye_heatmaps(hm[..., :98])
    assert left.shape == (2, 4, 4, 9) and right.shape == (2, 4, 4, 9)
