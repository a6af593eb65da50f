"""VGG19 feature extractor for perceptual losses.

The reference uses torchvision's pretrained VGG19 sliced at relu1_1,
relu2_1, relu3_1, relu4_1, relu5_1 (reference
models/networks/architecture.py:95-125) for VGGLoss
(models/networks/loss.py:102-116) and MultiScalePerceptualColorLoss
(models/MultiScalePerceptualColorLoss.py:6-37). This is the same
topology in flax NHWC; weights come from a torchvision state_dict via
`convert_vgg19_features` (pretrained download is environment-gated).
"""

from __future__ import annotations

from typing import Dict, Mapping

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ghost_tpu.core.precision import Policy, DEFAULT_POLICY
from ghost_tpu.nn.layers import Conv

# torchvision vgg19.features conv layout: indices of conv layers
_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
        512, 512, 512, 512, "M", 512, 512, 512, 512, "M")
# slice boundaries after relu1_1, relu2_1, relu3_1, relu4_1, relu5_1
_SLICE_AFTER_CONV = (0, 2, 4, 8, 12)  # conv indices whose relu ends a slice


class VGG19Features(nn.Module):
    """(B,H,W,3) in [0,1]-normalized-imagenet space -> 5 feature maps."""

    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        cd = self.policy.compute_dtype
        x = x.astype(cd)
        feats = []
        conv_idx = 0
        for item in _CFG:
            if item == "M":
                x = nn.max_pool(x, (2, 2), (2, 2))
                continue
            x = Conv(item, 3, padding=1, dtype=cd,
                     param_dtype=self.policy.param_dtype,
                     name=f"conv{conv_idx}")(x)
            x = nn.relu(x)
            if conv_idx in _SLICE_AFTER_CONV:
                feats.append(x)
            conv_idx += 1
        return feats


def convert_vgg19_features(sd: Mapping[str, np.ndarray]) -> Dict:
    """torchvision vgg19 state_dict ('features.N.weight') -> our tree."""
    params: Dict = {}
    conv_idx = 0
    torch_idx = 0
    for item in _CFG:
        if item == "M":
            torch_idx += 1  # pool layer
            continue
        params[f"conv{conv_idx}"] = {
            "Conv_0": {
                "kernel": np.transpose(
                    sd[f"features.{torch_idx}.weight"], (2, 3, 1, 0)
                ),
                "bias": sd[f"features.{torch_idx}.bias"],
            }
        }
        conv_idx += 1
        torch_idx += 2  # conv + relu
    return {"params": params}


IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def imagenet_normalize_pm1(x_pm1):
    """[-1,1] image -> imagenet-normalized (the usual VGG input prep)."""
    x01 = x_pm1 * 0.5 + 0.5
    return (x01 - IMAGENET_MEAN) / IMAGENET_STD
