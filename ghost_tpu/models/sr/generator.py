"""SPADE / LIPSPADE super-resolution generators (HiFaceGAN lineage).

Parity targets:
  * SPADEGenerator: fc conv on the 2^5-downsampled input, head block,
    2 middle blocks, 4 up blocks with x2 nearest upsampling, to_rgb +
    tanh (reference models/networks/generator.py:17-137; test config
    runs all 4 phases: is_test=True, generator.py:125-135);
  * LIPSPADEGenerator = SPADEGenerator with a Local-Importance-Pooling
    encoder replacing the plain downsample (generator.py:390-400) —
    this is the configured netG ('lipspade', models/config_sr.py:21);
  * SimplifiedLIP: logits = sigmoid(IN(conv(x)))*12; lip2d =
    avgpool(x*exp(logit)) / avgpool(exp(logit)) with k3 s2 p1
    (generator.py:313-351);
  * HiFaceGAN ContentAdaptiveSuppressor: per-scale nested encoder
    feeding each SPADE stage its own guidance map (generator.py:259-299).

All NHWC, bf16-capable; the whole generator is one jittable function.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from ghost_tpu.core.precision import Policy, DEFAULT_POLICY
from ghost_tpu.nn.layers import Conv, instance_norm, resize
from ghost_tpu.models.sr.spade import SPADEResnetBlock


def lip2d(x, logit):
    """Local importance pooling: weighted 3x3/s2 average (generator.py:313-315)."""
    w = jnp.exp(logit)
    dims, strides = (1, 3, 3, 1), (1, 2, 2, 1)
    pads = ((0, 0), (1, 1), (1, 1), (0, 0))
    num = lax.reduce_window(x * w, 0.0, lax.add, dims, strides, pads)
    den = lax.reduce_window(w, 0.0, lax.add, dims, strides, pads)
    return num / den


class SimplifiedLIP(nn.Module):
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        cd = self.policy.compute_dtype
        ch = x.shape[-1]
        logit = Conv(ch, 3, padding=1, use_bias=False, dtype=cd,
                     param_dtype=self.policy.param_dtype, name="logit_conv")(x)
        # InstanceNorm2d(affine=True) (generator.py:333-336)
        logit = instance_norm(logit.astype(jnp.float32))
        scale = self.param("in_scale", nn.initializers.ones, (ch,),
                           self.policy.param_dtype)
        bias = self.param("in_bias", nn.initializers.zeros, (ch,),
                          self.policy.param_dtype)
        logit = logit * scale + bias
        logit = nn.sigmoid(logit) * 12.0  # SoftGate COEFF (generator.py:318-325)
        return lip2d(x.astype(jnp.float32), logit).astype(cd)


class LIPEncoder(nn.Module):
    """conv stem + n_2xdown x (LIP pool + conv + norm [+relu])
    (generator.py:353-388); channel ratios 1,2,4,8,16 capped at 16."""

    ngf: int = 48
    n_2xdown: int = 5
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        cd = self.policy.compute_dtype
        pd = self.policy.param_dtype
        x = Conv(self.ngf, 3, padding=1, use_bias=False, dtype=cd,
                 param_dtype=pd, name="stem")(x)
        x = instance_norm(x.astype(jnp.float32)).astype(cd)
        x = nn.relu(x)
        ratio = 1
        for i in range(self.n_2xdown):
            nxt = min(ratio * 2, 16)
            x = SimplifiedLIP(self.policy, name=f"lip{i}")(x)
            x = Conv(self.ngf * nxt, 3, padding=1, dtype=cd, param_dtype=pd,
                     name=f"conv{i}")(x)
            x = instance_norm(x.astype(jnp.float32)).astype(cd)
            if i < self.n_2xdown - 1:
                x = nn.relu(x)
            ratio = nxt
        return x


class SPADEGenerator(nn.Module):
    """Input image in [-1,1] NHWC -> enhanced image, same size."""

    ngf: int = 48
    param_free: str = "syncbatch"
    train: bool = False
    policy: Policy = DEFAULT_POLICY

    def encode(self, x):
        sh = (x.shape[1] // 32, x.shape[2] // 32)
        z = resize(x, sh, method="nearest")
        return Conv(16 * self.ngf, 3, padding=1,
                    dtype=self.policy.compute_dtype,
                    param_dtype=self.policy.param_dtype, name="fc")(z)

    @nn.compact
    def __call__(self, x):
        seg = x
        h = self.encode(x.astype(self.policy.compute_dtype))
        h = self._decode(h, seg)
        return h

    def _decode(self, h, seg):
        ngf = self.ngf
        kw = dict(param_free=self.param_free, train=self.train,
                  policy=self.policy)
        up = lambda t: resize(t, (t.shape[1] * 2, t.shape[2] * 2),
                              method="nearest")
        h = SPADEResnetBlock(16 * ngf, 16 * ngf, name="head_0", **kw)(h, seg)
        h = up(h)
        h = SPADEResnetBlock(16 * ngf, 16 * ngf, name="G_middle_0", **kw)(h, seg)
        h = SPADEResnetBlock(16 * ngf, 16 * ngf, name="G_middle_1", **kw)(h, seg)
        plan = [(16 * ngf, 8 * ngf), (8 * ngf, 4 * ngf),
                (4 * ngf, 2 * ngf), (2 * ngf, 1 * ngf)]
        for i, (fin, fout) in enumerate(plan):
            h = up(h)
            h = SPADEResnetBlock(fin, fout, name=f"ups_{i}", **kw)(h, seg)
        h = Conv(3, 3, padding=1, dtype=self.policy.compute_dtype,
                 param_dtype=self.policy.param_dtype, name="to_rgb")(
            nn.leaky_relu(h, 0.2)
        )
        return jnp.tanh(h).astype(self.policy.output_dtype)


class LIPSPADEGenerator(SPADEGenerator):
    """The configured SR netG: SPADE decoder + LIP encoder
    (generator.py:390-400)."""

    def encode(self, x):
        return LIPEncoder(self.ngf, 5, self.policy, name="lip_encoder")(x)


class ContentAdaptiveSuppressor(nn.Module):
    """Nested encoder: list of features small->large used as per-stage
    guidance by HiFaceGAN (generator.py:259-299)."""

    ngf: int = 48
    n_2xdown: int = 5
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        cd = self.policy.compute_dtype
        pd = self.policy.param_dtype
        h = Conv(self.ngf, 3, padding=1, use_bias=False, dtype=cd,
                 param_dtype=pd, name="head")(x)
        h = instance_norm(h.astype(jnp.float32)).astype(cd)
        h = nn.relu(h)
        feats = [h]
        ratio = 1
        for i in range(self.n_2xdown):
            nxt = min(ratio * 2, 16)
            h = SimplifiedLIP(self.policy, name=f"lip{i}")(feats[0])
            h = Conv(self.ngf * nxt, 3, padding=1, dtype=cd, param_dtype=pd,
                     name=f"conv{i}")(h)
            h = instance_norm(h.astype(jnp.float32)).astype(cd)
            if i < self.n_2xdown - 1:
                h = nn.relu(h)
            feats.insert(0, h)
            ratio = nxt
        return feats  # smallest first


class HiFaceGANGenerator(SPADEGenerator):
    """SPADE decoder where each stage is guided by the matching scale of
    the ContentAdaptiveSuppressor (generator.py:187-256)."""

    @nn.compact
    def __call__(self, x):
        xs = ContentAdaptiveSuppressor(self.ngf, 5, self.policy,
                                       name="encoder")(x)
        h = self.encode(x.astype(self.policy.compute_dtype))
        ngf = self.ngf
        kw = dict(param_free=self.param_free, train=self.train,
                  policy=self.policy)
        up = lambda t: resize(t, (t.shape[1] * 2, t.shape[2] * 2),
                              method="nearest")
        h = SPADEResnetBlock(16 * ngf, 16 * ngf, name="head_0", **kw)(h, xs[0])
        h = up(h)
        h = SPADEResnetBlock(16 * ngf, 16 * ngf, name="G_middle_0", **kw)(h, xs[1])
        h = SPADEResnetBlock(16 * ngf, 16 * ngf, name="G_middle_1", **kw)(h, xs[1])
        plan = [(16 * ngf, 8 * ngf), (8 * ngf, 4 * ngf),
                (4 * ngf, 2 * ngf), (2 * ngf, 1 * ngf)]
        for i, (fin, fout) in enumerate(plan):
            h = up(h)
            h = SPADEResnetBlock(fin, fout, name=f"ups_{i}", **kw)(h, xs[i + 2])
        h = Conv(3, 3, padding=1, dtype=self.policy.compute_dtype,
                 param_dtype=self.policy.param_dtype, name="to_rgb")(
            nn.leaky_relu(h, 0.2)
        )
        return jnp.tanh(h).astype(self.policy.output_dtype)
