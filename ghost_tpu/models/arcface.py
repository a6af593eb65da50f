"""ArcFace iresnet identity encoder, TPU-native.

The reference loads insightface's iresnet100 at install time (reference
download_models.sh:2-3, imported at inference.py:15,33) to produce the
512-d identity embedding from 112x112 crops. This is a from-scratch
NHWC implementation of that public architecture (improved-ResNet:
BN-Conv-BN-PReLU-Conv-BN residual blocks, stride-2 in the second conv,
stem conv3x3 s1, head BN -> flatten -> FC(512*7*7 -> 512) -> BN), sized
by the standard depth plans. Converted `backbone.pth` weights reproduce
reference embeddings (tolerance checked by converter tests).

TPU-first: bf16 compute (`fp16=True` in the reference maps to the
compute dtype of the Policy), single jitted forward, batch-friendly.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ghost_tpu.core.precision import Policy, DEFAULT_POLICY
from ghost_tpu.nn.layers import BatchNorm, Conv, Dense, PReLU

_DEPTHS = {
    "iresnet34": (3, 4, 6, 3),
    "iresnet50": (3, 4, 14, 3),
    "iresnet100": (3, 13, 30, 3),
    "iresnet200": (6, 26, 60, 6),
}


class IBasicBlock(nn.Module):
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
        out = BatchNorm(use_running_average=ura, epsilon=1e-5, dtype=cd,
                        param_dtype=pd, name="bn1")(x)
        out = Conv(self.planes, kernel_size=3, stride=1, padding=1, use_bias=False,
                   dtype=cd, param_dtype=pd, name="conv1")(out)
        out = BatchNorm(use_running_average=ura, epsilon=1e-5, dtype=cd,
                        param_dtype=pd, name="bn2")(out)
        out = PReLU(param_dtype=pd, name="prelu")(out)
        out = Conv(self.planes, kernel_size=3, stride=self.stride, padding=1,
                   use_bias=False, dtype=cd, param_dtype=pd, name="conv2")(out)
        out = BatchNorm(use_running_average=ura, epsilon=1e-5, dtype=cd,
                        param_dtype=pd, name="bn3")(out)
        if self.downsample:
            identity = Conv(self.planes, kernel_size=1, stride=self.stride,
                            padding=0, use_bias=False, dtype=cd, param_dtype=pd,
                            name="ds_conv")(x)
            identity = BatchNorm(use_running_average=ura, epsilon=1e-5, dtype=cd,
                                 param_dtype=pd, name="ds_bn")(identity)
        else:
            identity = x
        return out + identity


class IResNet(nn.Module):
    """112x112 RGB in [-1,1] (NHWC) -> 512-d embedding."""

    layers: Sequence[int] = (3, 13, 30, 3)
    num_features: int = 512
    dropout: float = 0.0
    policy: Policy = DEFAULT_POLICY
    train: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cd = self.policy.compute_dtype
        pd = self.policy.param_dtype
        ura = not self.train
        x = x.astype(cd)
        x = Conv(64, kernel_size=3, stride=1, padding=1, use_bias=False,
                 dtype=cd, param_dtype=pd, name="stem_conv")(x)
        x = BatchNorm(use_running_average=ura, epsilon=1e-5, dtype=cd,
                      param_dtype=pd, name="stem_bn")(x)
        x = PReLU(param_dtype=pd, name="stem_prelu")(x)

        planes = (64, 128, 256, 512)
        for stage, (p, n) in enumerate(zip(planes, self.layers)):
            for b in range(n):
                first = b == 0
                x = IBasicBlock(
                    planes=p,
                    stride=2 if first else 1,
                    downsample=first,
                    policy=self.policy,
                    train=self.train,
                    name=f"layer{stage + 1}_block{b}",
                )(x)

        x = BatchNorm(use_running_average=ura, epsilon=1e-5, dtype=cd,
                      param_dtype=pd, name="head_bn")(x)
        # torch flattens NCHW (C,H,W) order; transpose so converted FC
        # weights line up with our NHWC activations.
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = Dense(self.num_features, dtype=jnp.float32, param_dtype=pd, name="fc")(
            x.astype(jnp.float32)
        )
        # feature BatchNorm1d (no running-average distinction matters at
        # inference; train mode uses batch stats like torch)
        x = nn.BatchNorm(use_running_average=ura, epsilon=1e-5, momentum=0.9,
                         dtype=jnp.float32, param_dtype=pd, name="features")(x)
        return x.astype(self.policy.output_dtype)


def iresnet34(**kw) -> IResNet:
    return IResNet(layers=_DEPTHS["iresnet34"], **kw)


def iresnet50(**kw) -> IResNet:
    return IResNet(layers=_DEPTHS["iresnet50"], **kw)


def iresnet100(**kw) -> IResNet:
    return IResNet(layers=_DEPTHS["iresnet100"], **kw)


def normalize_embedding(e, eps: float = 1e-12):
    """F.normalize parity: x / max(||x||_2, eps)."""
    norm = jnp.linalg.norm(e, axis=-1, keepdims=True)
    return e / jnp.maximum(norm, eps)
