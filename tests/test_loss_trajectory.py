"""Loss-trajectory behavioral regression — the apex L1 pattern.

The reference validates training behavior by comparing loss
trajectories of separate runs (reference apex/tests/L1/common/compare.py:
1-20: load two runs' saved losses, assert allclose). Here: two
identically-seeded short runs must produce bit-identical trajectories
(determinism), and the generator objective must decrease over a few
steps of overfitting a fixed batch (trainability).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ghost_tpu.core.precision import FULL_PRECISION
from ghost_tpu.models.aei import AEINet
from ghost_tpu.models.arcface import IResNet
from ghost_tpu.models.discriminator import MultiscaleDiscriminator
from ghost_tpu.train.losses import GeneratorLossWeights
from ghost_tpu.train.train_step import (
    TrainStepConfig,
    init_train_state,
    make_train_steps,
)


def build(seed=0):
    key = jax.random.key(seed)
    gen = AEINet(backbone="unet", num_blocks=1, policy=FULL_PRECISION,
                 train=True, width=1 / 16)
    g_vars = gen.init(key, jnp.zeros((1, 256, 256, 3)), jnp.zeros((1, 512)))
    disc = MultiscaleDiscriminator(ndf=8, n_layers=3, num_D=2,
                                   policy=FULL_PRECISION)
    d_vars = disc.init(key, jnp.zeros((1, 256, 256, 3)))
    arc = IResNet(layers=(1, 1, 1, 1), policy=FULL_PRECISION)
    a_vars = arc.init(key, jnp.zeros((1, 112, 112, 3)))
    cfg = TrainStepConfig(mode="canonical", lr_g=1e-3)
    g_step, d_step = make_train_steps(
        gen, disc, lambda x: arc.apply(a_vars, x), cfg,
        GeneratorLossWeights())
    return jax.jit(g_step), init_train_state(g_vars, d_vars, cfg)


def run_trajectory(steps=3):
    g_step, state = build()
    rng = np.random.default_rng(7)
    batch = {
        "xs": jnp.asarray(rng.uniform(-1, 1, (2, 256, 256, 3)).astype(np.float32)),
        "xt": jnp.asarray(rng.uniform(-1, 1, (2, 256, 256, 3)).astype(np.float32)),
        "embed": jnp.asarray(rng.standard_normal((2, 512)).astype(np.float32)),
        "same_person": jnp.asarray([1.0, 1.0]),
    }
    losses = []
    for _ in range(steps):
        state, metrics, _ = g_step(state, batch)
        losses.append(float(metrics["lossG"]))
    return losses


def test_trajectory_deterministic_and_decreasing():
    t1 = run_trajectory()
    t2 = run_trajectory()
    np.testing.assert_allclose(t1, t2, rtol=0, atol=0)  # bit-identical
    assert all(np.isfinite(t1))
    # overfitting a fixed same-person batch must reduce the objective
    assert t1[-1] < t1[0]
