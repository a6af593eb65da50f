"""Mixture-of-Experts MLP with top-k gating (beyond-reference).

The reference has no MoE anywhere (SURVEY.md §2.5: no expert
parallelism in the tree); this layer exists to complete the
parallelism matrix — `parallel/ep.py` shards its stacked expert
params over an "expert" mesh axis. The layer itself is the standard
switch-style MoE: a linear router, softmax top-k gate weights
(renormalized over the selected experts), and E independent 2-layer
GELU MLPs whose outputs are gate-weighted summed.

TPU-native shape discipline: experts are STACKED params (E, ...) and
the dense reference path computes all experts with batched einsums
(MXU-friendly, no gather/scatter token routing); selection is a
multiply by the (N, E) gate-weight matrix, which is zero outside the
top-k. That makes expert partitioning a plain linear decomposition:
sum_e gate_e * f_e(x) splits over any partition of experts — the
property `parallel/ep.py` exploits with a psum.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def init_moe_params(key: jax.Array, d_model: int, d_hidden: int,
                    num_experts: int, dtype: Any = jnp.float32) -> dict:
    """Stacked-expert MoE params: router (D,E)+(E,), experts
    w1 (E,D,H) b1 (E,H) w2 (E,H,D) b2 (E,D)."""
    kr, k1, k2 = jax.random.split(key, 3)
    s1 = d_model ** -0.5
    s2 = d_hidden ** -0.5
    return {
        "router": {
            "w": jax.random.normal(kr, (d_model, num_experts), dtype) * s1,
            "b": jnp.zeros((num_experts,), dtype),
        },
        "w1": jax.random.normal(k1, (num_experts, d_model, d_hidden),
                                dtype) * s1,
        "b1": jnp.zeros((num_experts, d_hidden), dtype),
        "w2": jax.random.normal(k2, (num_experts, d_hidden, d_model),
                                dtype) * s2,
        "b2": jnp.zeros((num_experts, d_model), dtype),
    }


def gate_weights(params: dict, x: jax.Array, top_k: int) -> jax.Array:
    """(N, E) gate weights: softmax over experts, zeroed outside each
    token's top-k, renormalized over the kept experts (f32)."""
    logits = x.astype(jnp.float32) @ params["router"]["w"].astype(
        jnp.float32) + params["router"]["b"].astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    if top_k < probs.shape[-1]:
        kth = jax.lax.top_k(probs, top_k)[0][..., -1:]
        probs = jnp.where(probs >= kth, probs, 0.0)
    return probs / jnp.sum(probs, axis=-1, keepdims=True)


def expert_contrib(params: dict, x: jax.Array,
                   gates: jax.Array) -> jax.Array:
    """Gate-weighted sum of this params-slice's experts over all
    tokens: sum_e gates[:, e] * f_e(x). `params` holds a (possibly
    partial) expert stack; `gates` has matching width. Linear in the
    expert axis, so partial stacks psum to the full layer."""
    h = jnp.einsum("nd,edh->neh", x, params["w1"]) + params["b1"]
    h = jax.nn.gelu(h)
    y = jnp.einsum("neh,ehd->ned", h, params["w2"]) + params["b2"]
    return jnp.einsum("ned,ne->nd", y, gates.astype(y.dtype))


def moe_apply(params: dict, x: jax.Array, top_k: int = 2) -> jax.Array:
    """Dense single-device reference: all experts on all tokens.
    x: (..., D) -> (..., D)."""
    shape = x.shape
    xf = x.reshape(-1, shape[-1])
    gates = gate_weights(params, xf, top_k)
    return expert_contrib(params, xf, gates).reshape(shape)
