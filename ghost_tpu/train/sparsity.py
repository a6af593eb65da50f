"""ASP-style 2:4 structured sparsity masks (apex.contrib.sparsity parity).

The reference ships Automatic SParsity: prune each weight matrix to 2:4
patterns and freeze the mask (reference apex/apex/contrib/sparsity/asp.py).
TPU-native version: mask computation is a reshape+top-k over groups of
4 along the input dim; masks live beside the params and are applied
functionally (`apply_masks`) before each forward, so the optimizer never
resurrects pruned weights.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def mask_2to4_last_axis(w: jnp.ndarray) -> jnp.ndarray:
    """Keep the 2 largest-|w| of every 4 consecutive along the last axis."""
    shape = w.shape
    if shape[-1] % 4 != 0:
        return jnp.ones_like(w, dtype=bool)
    g = w.reshape(*shape[:-1], shape[-1] // 4, 4)
    mag = jnp.abs(g)
    # rank within each group; keep top-2
    order = jnp.argsort(-mag, axis=-1)
    ranks = jnp.argsort(order, axis=-1)
    mask = ranks < 2
    return mask.reshape(shape)


def _prunable(path_leaf) -> bool:
    path, leaf = path_leaf
    name = "/".join(str(p) for p in path).lower()
    is_matrix = getattr(leaf, "ndim", 0) >= 2
    return is_matrix and ("kernel" in name) and leaf.shape[-1] % 4 == 0


def compute_masks(params: Any) -> Any:
    """Per-leaf 2:4 masks for prunable kernels; True elsewhere."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = flat
    masked = []
    for path, leaf in leaves:
        if _prunable((path, leaf)):
            masked.append(mask_2to4_last_axis(leaf))
        else:
            masked.append(jnp.ones_like(leaf, dtype=bool))
    return jax.tree_util.tree_unflatten(treedef, masked)


def apply_masks(params: Any, masks: Any) -> Any:
    return jax.tree.map(lambda p, m: p * m.astype(p.dtype), params, masks)


def sparsity_ratio(masks: Any) -> float:
    total = 0
    kept = 0
    for m in jax.tree.leaves(masks):
        total += m.size
        kept += int(jnp.sum(m))
    return 1.0 - kept / max(total, 1)
