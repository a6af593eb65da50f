"""Dynamic loss scaling — the apex.amp LossScaler equivalent.

The reference scales losses with an overflow-checking dynamic scaler
(reference apex/apex/amp/scaler.py:33: start at 2**16, halve on
inf/nan, double every `scale_window` clean steps). Here the whole check
is one fused `jnp.isfinite` reduction over the grad pytree inside the
jitted step — no multi-tensor CUDA kernel (reference
apex/csrc/multi_tensor_scale_kernel.cu) is needed because XLA fuses the
scan over leaves.

bf16 training generally does not overflow, so the default train steps
run unscaled; this module exists for fp16-style parity and is exercised
by tests.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class DynamicLossScale(NamedTuple):
    """Functional loss-scale state; all fields are scalars (jit-carried)."""

    scale: jnp.ndarray  # f32 scalar
    growth_counter: jnp.ndarray  # i32 scalar
    growth_interval: int = 2000
    growth_factor: float = 2.0
    backoff_factor: float = 0.5
    max_scale: float = 2.0**24

    @classmethod
    def init(cls, initial_scale: float = 2.0**16, growth_interval: int = 2000):
        return cls(
            scale=jnp.float32(initial_scale),
            growth_counter=jnp.int32(0),
            growth_interval=growth_interval,
        )

    def scale_loss(self, loss: jnp.ndarray) -> jnp.ndarray:
        return loss * self.scale.astype(loss.dtype)

    def unscale_grads(self, grads: Any) -> Any:
        inv = 1.0 / self.scale
        return jax.tree.map(lambda g: g * inv.astype(g.dtype), grads)

    def check_finite(self, grads: Any) -> jnp.ndarray:
        leaves = jax.tree.leaves(grads)
        finite = jnp.bool_(True)
        for leaf in leaves:
            finite &= jnp.all(jnp.isfinite(leaf))
        return finite

    def update(self, grads_finite: jnp.ndarray) -> "DynamicLossScale":
        grew = self.growth_counter + 1 >= self.growth_interval
        new_scale = jnp.where(
            grads_finite,
            jnp.where(
                grew,
                jnp.minimum(self.scale * self.growth_factor, self.max_scale),
                self.scale,
            ),
            jnp.maximum(self.scale * self.backoff_factor, 1.0),
        )
        new_counter = jnp.where(
            grads_finite & ~grew, self.growth_counter + 1, jnp.int32(0)
        )
        return self._replace(scale=new_scale, growth_counter=new_counter)

    def apply_if_finite(self, params: Any, new_params: Any, grads_finite) -> Any:
        """Keep old params when grads overflowed (apex skip-step semantics)."""
        return jax.tree.map(
            lambda old, new: jnp.where(grads_finite, new, old), params, new_params
        )


def scaled_value_and_grad(loss_fn, loss_scale: DynamicLossScale):
    """value_and_grad wrapper: scale loss, unscale grads, report finiteness."""

    vg = jax.value_and_grad(lambda *a, **k: loss_scale.scale_loss(loss_fn(*a, **k)))

    def wrapped(*args, **kwargs) -> Tuple[jnp.ndarray, Any, jnp.ndarray]:
        scaled_loss, grads = vg(*args, **kwargs)
        grads = loss_scale.unscale_grads(grads)
        finite = loss_scale.check_finite(grads)
        return scaled_loss / loss_scale.scale, grads, finite

    return wrapped
