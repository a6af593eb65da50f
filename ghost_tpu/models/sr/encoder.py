"""Conv VAE encoder (mu, logvar) — reference models/networks/encoder.py:13-55.

Unused in the shipped SR test config (use_vae=False, models/config_sr.py:28)
but part of the component inventory. 6 stride-2 convs with instance norm
and LeakyReLU(0.2), two FC heads for mu/logvar at 256-d.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ghost_tpu.core.precision import Policy, DEFAULT_POLICY
from ghost_tpu.nn.layers import Conv, instance_norm, leaky_relu


class ConvEncoder(nn.Module):
    ndf: int = 64
    z_dim: int = 256
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        cd = self.policy.compute_dtype
        pd = self.policy.param_dtype
        plan = (1, 2, 4, 8, 8, 8)
        h = x.astype(cd)
        for i, mult in enumerate(plan):
            h = Conv(self.ndf * mult, 3, 2, padding=1, dtype=cd,
                     param_dtype=pd, name=f"layer{i}")(h)
            h = instance_norm(h.astype(jnp.float32)).astype(cd)
            h = leaky_relu(h, 0.2)
        h = h.reshape(h.shape[0], -1).astype(jnp.float32)
        mu = nn.Dense(self.z_dim, param_dtype=pd, name="fc_mu")(h)
        logvar = nn.Dense(self.z_dim, param_dtype=pd, name="fc_var")(h)
        return mu, logvar
