"""Optimizers: torch-parity Adam + apex-parity LAMB/LARC as optax chains.

The reference trains with torch.optim.Adam(lr=4e-4, betas=(0, 0.999),
weight_decay=1e-4) (reference train.py:472,505 and train-self.py).
torch's weight_decay is L2-added-to-gradient *before* the moment
updates, which is optax.add_decayed_weights placed before
scale_by_adam — not decoupled AdamW.

apex's fused/multi-tensor optimizer zoo (reference
apex/apex/optimizers/fused_{adam,lamb}.py, apex/csrc/multi_tensor_*.cu)
needs no custom kernels here: one jitted optax update over the whole
pytree is already a single fused XLA program. LARC (reference
apex/apex/parallel/LARC.py:5-40) is provided as a gradient transform.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def ghost_adam(
    lr=4e-4,
    b1: float = 0.0,
    b2: float = 0.999,
    weight_decay: float = 1e-4,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """torch.optim.Adam parity (L2-coupled weight decay).

    lr may be a float or an optax schedule (step count -> lr), e.g.
    `step_lr(...)` for the reference's StepLR option."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.scale_by_learning_rate(lr),
    )


def step_lr(lr: float, step_size: int, gamma: float):
    """torch.optim.lr_scheduler.StepLR parity: lr * gamma^(step //
    step_size) (reference train.py:473-508 steps it once per iteration,
    so `step` here is the optimizer update count)."""

    def schedule(count):
        return lr * gamma ** (count // step_size)

    return schedule


def fused_lamb(
    lr: float = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
    weight_decay: float = 0.01,
    eps: float = 1e-6,
) -> optax.GradientTransformation:
    """apex FusedLAMB equivalent (trust-ratio scaled Adam)."""
    return optax.chain(
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_trust_ratio(),
        optax.scale(-lr),
    )


def larc(
    trust_coefficient: float = 0.02,
    clip: bool = True,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """LARC: layer-wise adaptive rate scaling wrapper (reference
    apex/apex/parallel/LARC.py). Scales each leaf's gradient by
    trust * ||w|| / ||g|| (clipped at 1 when clip=True). Compose before
    the inner optimizer: optax.chain(larc(), ghost_adam())."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("larc requires params")

        def scale_leaf(g, p):
            pn = jnp.linalg.norm(p.ravel())
            gn = jnp.linalg.norm(g.ravel())
            trust = jnp.where(
                (pn > 0) & (gn > 0),
                trust_coefficient * pn / (gn + eps),
                1.0,
            )
            if clip:
                trust = jnp.minimum(trust, 1.0)
            return g * trust

        return jax.tree.map(scale_leaf, grads, params), state

    return optax.GradientTransformation(init, update)
