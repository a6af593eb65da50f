"""Mixed-precision policy — the TPU-native stand-in for apex.amp.

The reference runs its generator in fp16 via `G.half()` (reference
inference.py:30-31) and trains with apex amp O-levels (reference
apex/apex/amp/frontend.py). On TPU the idiomatic equivalent is: params in
float32, compute in bfloat16, outputs upcast at the boundary — no cast
lists or function patching required because every model here takes its
dtype from a single `Policy` threaded through module constructors, and
XLA fuses the casts into the surrounding convolutions.

bf16 has fp32's exponent range, so the overflow-driven dynamic loss
scaling that apex needs for fp16 is not required for correctness; we
still provide `DynamicLossScale` (core/loss_scale.py) for fp16-like
experiments and API parity.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Casting policy for one model: params / compute / output dtypes."""

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    def cast_to_param(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.param_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    def cast_to_output(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.output_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )


DEFAULT_POLICY = Policy()
FULL_PRECISION = Policy(
    param_dtype=jnp.float32,
    compute_dtype=jnp.float32,
    output_dtype=jnp.float32,
)
