"""Bottleneck-ResNet attribute encoder (`--backbone resnet` variant).

Behavioral parity with reference network/resnet.py:81-149: two 7x7 stem
convs (stride 1 then 2), six Bottleneck stages of 2 blocks each with
stride-2 downsampling, returning the 8 feature maps finest-last in the
order the AAD generator consumes them (deepest first), i.e.
(x7, x6, x5, x4, x3, x2, x1, x0) for a 256x256 input.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ghost_tpu.core.precision import Policy, DEFAULT_POLICY
from ghost_tpu.nn.layers import BatchNorm, Conv


class Bottleneck(nn.Module):
    """1x1(stride) -> 3x3 -> 1x1(x4) with BN/ReLU; torchvision-style
    except stride lives on the first conv (reference resnet.py:43-78)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    policy: Policy = DEFAULT_POLICY
    train: bool = False

    @nn.compact
    def __call__(self, x):
        cd = self.policy.compute_dtype
        pd = self.policy.param_dtype
        ura = not self.train

        out = Conv(self.planes, kernel_size=1, stride=self.stride, use_bias=False,
                   dtype=cd, param_dtype=pd, name="conv1")(x)
        out = BatchNorm(use_running_average=ura, dtype=cd, param_dtype=pd, name="bn1")(out)
        out = nn.relu(out)
        out = Conv(self.planes, kernel_size=3, stride=1, padding=1, use_bias=False,
                   dtype=cd, param_dtype=pd, name="conv2")(out)
        out = BatchNorm(use_running_average=ura, dtype=cd, param_dtype=pd, name="bn2")(out)
        out = nn.relu(out)
        out = Conv(self.planes * 4, kernel_size=1, use_bias=False,
                   dtype=cd, param_dtype=pd, name="conv3")(out)
        out = BatchNorm(use_running_average=ura, dtype=cd, param_dtype=pd, name="bn3")(out)

        if self.downsample:
            identity = Conv(self.planes * 4, kernel_size=1, stride=self.stride,
                            use_bias=False, dtype=cd, param_dtype=pd, name="ds_conv")(x)
            identity = BatchNorm(use_running_average=ura, dtype=cd, param_dtype=pd,
                                 name="ds_bn")(identity)
        else:
            identity = x
        return nn.relu(out + identity)


class MLAttrEncoderResnet(nn.Module):
    """Returns 8 attr maps deepest-first (reference resnet.py:128-144)."""

    policy: Policy = DEFAULT_POLICY
    train: bool = False

    @nn.compact
    def __call__(self, x):
        cd = self.policy.compute_dtype
        pd = self.policy.param_dtype
        ura = not self.train
        x = x.astype(cd)

        x0 = Conv(64, kernel_size=7, stride=1, padding=3, use_bias=False,
                  dtype=cd, param_dtype=pd, name="conv0")(x)
        x0 = BatchNorm(use_running_average=ura, dtype=cd, param_dtype=pd, name="bn0")(x0)
        x0 = nn.relu(x0)

        x1 = Conv(64, kernel_size=7, stride=2, padding=3, use_bias=False,
                  dtype=cd, param_dtype=pd, name="conv1")(x0)
        x1 = BatchNorm(use_running_average=ura, dtype=cd, param_dtype=pd, name="bn1")(x1)
        x1 = nn.relu(x1)

        feats = [x0, x1]
        inplanes = 64
        for stage, planes in enumerate((32, 64, 128, 256, 512, 256)):
            h = feats[-1]
            for b in range(2):
                first = b == 0
                needs_ds = first and (2 != 1 or inplanes != planes * 4)
                h = Bottleneck(planes=planes, stride=2 if first else 1,
                               downsample=needs_ds, policy=self.policy,
                               train=self.train, name=f"layer{stage + 1}_block{b}")(h)
            inplanes = planes * 4
            feats.append(h)
        # feats = [x0, x1, x2..x7]; return deepest first
        return tuple(reversed(feats))
