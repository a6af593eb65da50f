"""pix2pixHD-style multiscale PatchGAN discriminator, TPU-native.

Behavioral parity with reference network/MultiscaleDiscriminator.py:5-97
(NLayerDiscriminator: conv4x4 stride-2 pyramid with LeakyReLU 0.2 and a
norm after every conv except the first; MultiscaleDiscriminator: num_D
copies run on successively avg-pooled inputs, finest scale handled by
the *last* sub-discriminator). Train config uses n_layers=5, num_D=3,
InstanceNorm (reference train.py:470).

TPU-first: NHWC, bf16 compute; all scales evaluated in one jitted call;
returns list-of-lists like the reference (each inner list is that
scale's output, plus intermediate features when requested) so the loss
code is shape-compatible.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp

from ghost_tpu.core.precision import Policy, DEFAULT_POLICY
from ghost_tpu.nn.layers import BatchNorm, Conv, avg_pool_3x3s2, instance_norm, leaky_relu


class NLayerDiscriminator(nn.Module):
    """PatchGAN pyramid (reference MultiscaleDiscriminator.py:5-54)."""

    ndf: int = 64
    n_layers: int = 3
    norm: str = "instance"  # instance | batch | none
    use_sigmoid: bool = False
    get_interm_feat: bool = False
    policy: Policy = DEFAULT_POLICY
    train: bool = False

    def _norm(self, x, name):
        if self.norm == "instance":
            return instance_norm(x.astype(jnp.float32)).astype(self.policy.compute_dtype)
        if self.norm == "batch":
            return BatchNorm(use_running_average=not self.train,
                             dtype=self.policy.compute_dtype,
                             param_dtype=self.policy.param_dtype, name=name)(x)
        return x

    @nn.compact
    def __call__(self, x):
        cd = self.policy.compute_dtype
        x = x.astype(cd)
        feats = []
        nf = self.ndf
        # stage 0: conv + lrelu (no norm)
        x = Conv(nf, kernel_size=4, stride=2, padding=2, dtype=cd,
                 param_dtype=self.policy.param_dtype, name="stage0")(x)
        x = leaky_relu(x, 0.2)
        feats.append(x)
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            x = Conv(nf, kernel_size=4, stride=2, padding=2, dtype=cd,
                     param_dtype=self.policy.param_dtype, name=f"stage{n}")(x)
            x = self._norm(x, f"norm{n}")
            x = leaky_relu(x, 0.2)
            feats.append(x)
        nf = min(nf * 2, 512)
        x = Conv(nf, kernel_size=4, stride=1, padding=2, dtype=cd,
                 param_dtype=self.policy.param_dtype, name=f"stage{self.n_layers}")(x)
        x = self._norm(x, f"norm{self.n_layers}")
        x = leaky_relu(x, 0.2)
        feats.append(x)
        x = Conv(1, kernel_size=4, stride=1, padding=2, dtype=cd,
                 param_dtype=self.policy.param_dtype, name="head")(x)
        if self.use_sigmoid:
            x = nn.sigmoid(x)
        feats.append(x)
        if self.get_interm_feat:
            return feats
        return x


class MultiscaleDiscriminator(nn.Module):
    """num_D PatchGANs over an avg-pool pyramid (reference
    MultiscaleDiscriminator.py:57-97). Output: list over scales, each a
    list whose last element is that scale's logits map — result[i][-1]
    matches the reference's di[0] indexing convention used by the hinge
    losses (reference utils/training/losses.py:19,58) when
    get_interm_feat=False (single-element inner lists)."""

    ndf: int = 64
    n_layers: int = 3
    num_D: int = 3
    norm: str = "instance"
    use_sigmoid: bool = False
    get_interm_feat: bool = False
    policy: Policy = DEFAULT_POLICY
    train: bool = False

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.policy.compute_dtype)
        results = []
        current = x
        for i in range(self.num_D):
            # reference indexes sub-discriminators coarsest-first
            # (layer{num_D-1-i}); name them by the scale they consume.
            d = NLayerDiscriminator(
                self.ndf, self.n_layers, self.norm, self.use_sigmoid,
                self.get_interm_feat, self.policy, self.train,
                name=f"scale{self.num_D - 1 - i}",
            )
            out = d(current)
            results.append(out if self.get_interm_feat else [out])
            if i != self.num_D - 1:
                current = avg_pool_3x3s2(current)
        return results
