"""SPADE building blocks for the super-resolution generator.

Semantics parity with the reference SR stack (HiFaceGAN lineage):
  * SPADE norm: mean-free rms instance norm (the reference's custom
    InstanceNorm2d, models/networks/normalization.py:51-60) or
    batch-norm statistics, modulated by gamma/beta convs over the
    downsampled "segmap" (= the input image itself in this pipeline),
    models/networks/normalization.py:63-107;
  * SPADEResnetBlock: norm -> lrelu(0.2) -> spectral-norm conv x2 with
    learned spectral-norm shortcut (models/networks/architecture.py:21-70);
  * the configured norm is 'spectralspadesyncbatch3x3'
    (models/config_sr.py:25): SyncBatchNorm statistics — under pjit
    global-view these are just global batch moments, replacing the
    vendored master-slave SynchronizedBatchNorm2d
    (models/networks/sync_batchnorm/batchnorm.py:57-273).

Spectral normalization is a power-iteration estimate of the top
singular value carried in a flax variable collection ('spectral'),
updated on forward in train mode — torch parity.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ghost_tpu.core.precision import Policy, DEFAULT_POLICY
from ghost_tpu.nn.layers import rms_instance_norm, resize


class SpectralConv(nn.Module):
    """Conv2d wrapped in spectral norm (torch.nn.utils.spectral_norm
    parity: one power iteration per call over the (cout, cin*kh*kw)
    matricization; u persists across steps)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = True
    update_stats: bool = False
    eps: float = 1e-12
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.xavier_normal(),
            (k, k, cin, self.features), self.param_dtype,
        )
        # torch matricizes as weight.reshape(cout, -1) on a
        # (cout, cin, kh, kw) tensor, i.e. flatten order (cin, kh, kw):
        # converted weight_v vectors live in that order, so match it
        w_mat = jnp.transpose(kernel, (3, 2, 0, 1)).reshape(self.features, -1)

        def _nrm(t):
            return t / (jnp.linalg.norm(t) + self.eps)

        u_var = self.variable(
            "spectral", "u",
            lambda: _nrm(jax.random.normal(jax.random.key(0),
                                           (self.features,))),
        )
        # v persists like torch's weight_v so eval-mode sigma uses the
        # STORED pair exactly as torch.nn.utils.spectral_norm does;
        # init = half a power iteration from u (keeps sigma sane at
        # random init)
        v_var = self.variable(
            "spectral", "v", lambda: _nrm(w_mat.T @ u_var.value))
        u, v = u_var.value, v_var.value
        if self.update_stats and not self.is_initializing():
            # torch power-iteration order: v first, then u
            v = _nrm(w_mat.T @ u)
            u = _nrm(w_mat @ v)
            u_var.value = jax.lax.stop_gradient(u)
            v_var.value = jax.lax.stop_gradient(v)
        sigma = u @ (w_mat @ v)
        w_sn = (kernel / sigma).astype(self.dtype)

        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w_sn,
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           self.param_dtype)
            y = y + b.astype(self.dtype)
        return y


class SPADE(nn.Module):
    """norm_nc-channel SPADE modulation conditioned on the input image."""

    norm_nc: int
    param_free: str = "syncbatch"  # syncbatch | instance | batch
    ks: int = 3
    train: bool = False
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, segmap):
        cd = self.policy.compute_dtype
        pd = self.policy.param_dtype
        if self.param_free == "instance":
            normalized = rms_instance_norm(x.astype(jnp.float32)).astype(cd)
        else:
            # affine-free batch norm; under pjit global view this IS
            # synchronized batch norm
            normalized = nn.BatchNorm(
                use_running_average=not self.train, use_scale=False,
                use_bias=False, momentum=0.9, epsilon=1e-5, dtype=cd,
                param_dtype=pd, name="pfn",
            )(x)

        seg = resize(segmap, x.shape[1:3], method="nearest")
        nhidden = 128 if self.norm_nc > 128 else self.norm_nc
        pw = self.ks // 2
        actv = nn.relu(
            nn.Conv(nhidden, (self.ks, self.ks), padding=((pw, pw), (pw, pw)),
                    dtype=cd, param_dtype=pd, name="mlp_shared")(seg.astype(cd))
        )
        gamma = nn.Conv(self.norm_nc, (self.ks, self.ks),
                        padding=((pw, pw), (pw, pw)), use_bias=False,
                        dtype=cd, param_dtype=pd, name="mlp_gamma")(actv)
        beta = nn.Conv(self.norm_nc, (self.ks, self.ks),
                       padding=((pw, pw), (pw, pw)), use_bias=False,
                       dtype=cd, param_dtype=pd, name="mlp_beta")(actv)
        return normalized * gamma + beta


class SPADEResnetBlock(nn.Module):
    fin: int
    fout: int
    param_free: str = "syncbatch"
    train: bool = False
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, seg):
        cd = self.policy.compute_dtype
        fmiddle = min(self.fin, self.fout)
        learned_shortcut = self.fin != self.fout

        dx = SPADE(self.fin, self.param_free, train=self.train,
                   policy=self.policy, name="norm_0")(x, seg)
        dx = SpectralConv(fmiddle, 3, padding=1, update_stats=self.train,
                          dtype=cd, param_dtype=self.policy.param_dtype,
                          name="conv_0")(nn.leaky_relu(dx, 0.2))
        dx = SPADE(fmiddle, self.param_free, train=self.train,
                   policy=self.policy, name="norm_1")(dx, seg)
        dx = SpectralConv(self.fout, 3, padding=1, update_stats=self.train,
                          dtype=cd, param_dtype=self.policy.param_dtype,
                          name="conv_1")(nn.leaky_relu(dx, 0.2))

        if learned_shortcut:
            xs = SPADE(self.fin, self.param_free, train=self.train,
                       policy=self.policy, name="norm_s")(x, seg)
            xs = SpectralConv(self.fout, 1, padding=0, use_bias=False,
                              update_stats=self.train, dtype=cd,
                              param_dtype=self.policy.param_dtype,
                              name="conv_s")(xs)
        else:
            xs = x
        return xs + dx
