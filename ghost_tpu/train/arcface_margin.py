"""ArcFace additive-angular-margin head (ArcMarginModel parity).

The reference carries an ArcFace training head in its SimSwap-lineage
dead code (reference models/models.py:150-181: normalized weights,
cos(theta+m) on the target class, easy-margin variant, scale s). This
is the functional equivalent for training/fine-tuning the identity
encoder inside ghost-tpu.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ghost_tpu.models.arcface import normalize_embedding


class ArcMarginHead(nn.Module):
    num_classes: int
    margin: float = 0.5
    scale: float = 64.0
    easy_margin: bool = False

    @nn.compact
    def __call__(self, embeddings, labels):
        """embeddings (B, D), labels (B,) -> margin-adjusted logits (B, C)."""
        w = self.param("weight", nn.initializers.xavier_uniform(),
                       (embeddings.shape[-1], self.num_classes))
        e = normalize_embedding(embeddings.astype(jnp.float32))
        wn = w / jnp.maximum(
            jnp.linalg.norm(w, axis=0, keepdims=True), 1e-12
        )
        cos = e @ wn  # (B, C) cosine similarities
        sin = jnp.sqrt(jnp.clip(1.0 - cos * cos, 0.0, 1.0))
        cos_m = jnp.cos(self.margin)
        sin_m = jnp.sin(self.margin)
        phi = cos * cos_m - sin * sin_m  # cos(theta + m)
        if self.easy_margin:
            phi = jnp.where(cos > 0, phi, cos)
        else:
            th = jnp.cos(jnp.pi - self.margin)
            mm = jnp.sin(jnp.pi - self.margin) * self.margin
            phi = jnp.where(cos > th, phi, cos - mm)
        onehot = jnp.zeros_like(cos).at[
            jnp.arange(cos.shape[0]), labels
        ].set(1.0)
        return self.scale * (onehot * phi + (1.0 - onehot) * cos)
