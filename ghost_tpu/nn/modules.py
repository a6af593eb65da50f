"""apex-parity NN modules: fused MLP, multihead attention, xentropy.

Capability parity for the vendored apex extensions that GHOST itself
never calls but ships (SURVEY.md §2.4):

  * `MLP` — apex mlp_cuda (reference apex/csrc/mlp.cpp): a dense chain
    with bias+activation epilogues. On TPU a plain jnp dot chain under
    jit IS the fused implementation (XLA folds bias/relu into the MXU
    epilogue), so this module is the idiomatic replacement, not a
    wrapper over a kernel.
  * `MultiheadAttention` — apex fast_*_multihead_attn*
    (reference apex/apex/contrib/csrc/multihead_attn/): fused QKV
    projection, Pallas flash-attention core, output projection, with
    optional pre/post layernorm-add like the norm_add variants.
  * `softmax_cross_entropy` — apex xentropy with label smoothing
    (reference apex/apex/contrib/csrc/xentropy/xentropy_kernel.cu):
    one fused log-softmax + gather under jit.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ghost_tpu.core.precision import Policy, DEFAULT_POLICY
from ghost_tpu.ops.pallas.attention import flash_attention, flash_attention_reference
from ghost_tpu.ops.pallas.layer_norm import layer_norm_reference


class MLP(nn.Module):
    """Dense chain with fused bias+activation epilogues (mlp_cuda parity)."""

    features: Sequence[int]
    activation: Callable = nn.relu
    use_bias: bool = True
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        cd = self.policy.compute_dtype
        x = x.astype(cd)
        for i, f in enumerate(self.features):
            x = nn.Dense(f, use_bias=self.use_bias, dtype=cd,
                         param_dtype=self.policy.param_dtype,
                         name=f"dense{i}")(x)
            if i < len(self.features) - 1:
                x = self.activation(x)
        return x.astype(self.policy.output_dtype)


class MultiheadAttention(nn.Module):
    """Self/enc-dec MHA with a flash-attention core.

    `norm_add` reproduces apex's *_norm_add variants: pre-layernorm on
    the query input and a residual add on the output."""

    num_heads: int
    head_dim: int
    causal: bool = False
    norm_add: bool = False
    use_pallas: bool = True
    # a jax.sharding.Mesh with a "seq" axis routes the attention core
    # through parallel/sp.py ring attention (sequence sharded across
    # devices, KV rotating over ICI) — for sequences past one chip's
    # HBM. Param tree is unchanged; outputs match the local core.
    seq_mesh: Any = None
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, q_in, kv_in=None):
        cd = self.policy.compute_dtype
        pd = self.policy.param_dtype
        d_model = self.num_heads * self.head_dim
        residual = q_in
        if self.norm_add:
            gamma = self.param("ln_scale", nn.initializers.ones,
                               (q_in.shape[-1],), pd)
            beta = self.param("ln_bias", nn.initializers.zeros,
                              (q_in.shape[-1],), pd)
            q_in = layer_norm_reference(q_in.astype(jnp.float32), gamma, beta)
        kv_in = q_in if kv_in is None else kv_in

        q = nn.Dense(d_model, dtype=cd, param_dtype=pd, name="q_proj")(
            q_in.astype(cd))
        k = nn.Dense(d_model, dtype=cd, param_dtype=pd, name="k_proj")(
            kv_in.astype(cd))
        v = nn.Dense(d_model, dtype=cd, param_dtype=pd, name="v_proj")(
            kv_in.astype(cd))

        b, s = q.shape[0], q.shape[1]
        sk = k.shape[1]

        def split(t, sl):
            return t.reshape(b, sl, self.num_heads, self.head_dim).transpose(
                0, 2, 1, 3)

        if self.seq_mesh is not None:
            from ghost_tpu.parallel.sp import ring_attention

            o = ring_attention(
                q.reshape(b, s, self.num_heads, self.head_dim),
                k.reshape(b, sk, self.num_heads, self.head_dim),
                v.reshape(b, sk, self.num_heads, self.head_dim),
                mesh=self.seq_mesh, causal=self.causal,
            ).reshape(b, s, d_model)
        else:
            qh, kh, vh = split(q, s), split(k, sk), split(v, sk)
            pallas_ok = (
                self.use_pallas and s == sk and s % 128 == 0
                and jax.default_backend() == "tpu"
            )
            if pallas_ok:
                o = flash_attention(qh, kh, vh, self.causal)
            else:
                o = flash_attention_reference(qh, kh, vh, self.causal)
            o = o.transpose(0, 2, 1, 3).reshape(b, s, d_model)
        out = nn.Dense(q_in.shape[-1], dtype=cd, param_dtype=pd,
                       name="out_proj")(o)
        if self.norm_add:
            out = out + residual.astype(out.dtype)
        return out.astype(self.policy.output_dtype)


def softmax_cross_entropy(logits, labels, label_smoothing: float = 0.0):
    """Fused log-softmax xentropy with label smoothing (xentropy_cuda
    parity). logits (B,V), labels (B,) int."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if label_smoothing > 0.0:
        smooth = -jnp.mean(logp, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    return nll


def weight_norm(kernel, g, axis: int = -1, eps: float = 1e-12):
    """Weight normalization w = g * v / ||v|| (apex.reparameterization /
    torch.nn.utils.weight_norm parity: the norm is taken over every
    axis EXCEPT `axis`, which carries one gain per output feature).

    Functional form: converters store (v, g) and call this at apply
    time; under jit the renormalization fuses into the consuming
    matmul's operand preparation."""
    reduce_axes = tuple(i for i in range(kernel.ndim)
                        if i != (axis % kernel.ndim))
    norm = jnp.sqrt(jnp.sum(jnp.square(kernel.astype(jnp.float32)),
                            axis=reduce_axes, keepdims=True) + eps)
    shape = [1] * kernel.ndim
    shape[axis % kernel.ndim] = -1
    return (kernel / norm.astype(kernel.dtype)) * jnp.reshape(
        g, shape).astype(kernel.dtype)


class WeightNormDense(nn.Module):
    """Dense layer with weight normalization (apex.reparameterization
    equivalent, usable wherever torch code applied weight_norm to a
    Linear)."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        v = self.param("v", nn.initializers.lecun_normal(),
                       (cin, self.features), self.param_dtype)
        g = self.param("g", nn.initializers.ones, (self.features,),
                       self.param_dtype)
        w = weight_norm(v, g, axis=-1).astype(self.dtype)
        y = x.astype(self.dtype) @ w
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           self.param_dtype)
            y = y + b.astype(self.dtype)
        return y
