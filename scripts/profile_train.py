"""Train-step throughput on the real chip: full-width AEI GAN step.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_train.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ghost_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from ghost_tpu.core.precision import DEFAULT_POLICY
    from ghost_tpu.models.aei import AEINet
    from ghost_tpu.models.arcface import IResNet
    from ghost_tpu.models.discriminator import MultiscaleDiscriminator
    from ghost_tpu.train.losses import GeneratorLossWeights
    from ghost_tpu.train.train_step import (TrainStepConfig,
                                            init_train_state,
                                            make_train_steps)

    B = 8  # reference train batch scale (train.py:554 uses 16 on A100)
    key = jax.random.key(0)
    gen = AEINet(backbone="unet", num_blocks=2, policy=DEFAULT_POLICY,
                 train=True)
    g_vars = gen.init(key, jnp.zeros((1, 256, 256, 3)), jnp.zeros((1, 512)))
    disc = MultiscaleDiscriminator(n_layers=5, num_D=3, norm="instance",
                                   policy=DEFAULT_POLICY)
    d_vars = disc.init(key, jnp.zeros((1, 256, 256, 3)))
    arc = IResNet(layers=(3, 13, 30, 3), policy=DEFAULT_POLICY)
    a_vars = arc.init(key, jnp.zeros((1, 112, 112, 3)))
    arc_apply = lambda x: arc.apply(a_vars, x)

    cfg = TrainStepConfig(mode="canonical")
    g_step, d_step = make_train_steps(gen, disc, arc_apply, cfg,
                                      GeneratorLossWeights())
    state = init_train_state(g_vars, d_vars, cfg)
    jit_g = jax.jit(g_step)
    jit_d = jax.jit(d_step)

    rng = np.random.default_rng(0)
    batch = {
        "xs": jnp.asarray(rng.uniform(-1, 1, (B, 256, 256, 3)).astype(np.float32)),
        "xt": jnp.asarray(rng.uniform(-1, 1, (B, 256, 256, 3)).astype(np.float32)),
        "embed": jnp.asarray(rng.normal(0, 1, (B, 512)).astype(np.float32)),
        "same_person": jnp.zeros((B,), jnp.float32),
    }

    t0 = time.time()
    state, metrics, y = jit_g(state, batch)
    lg = float(metrics["lossG"])
    print(f"G step compile+first: {time.time() - t0:.1f}s lossG={lg:.3f}",
          flush=True)
    t0 = time.time()
    state, ld = jit_d(state, y, batch["xs"])
    print(f"D step compile+first: {time.time() - t0:.1f}s "
          f"lossD={float(ld):.3f}", flush=True)

    iters = 10
    t0 = time.time()
    for _ in range(iters):
        state, metrics, y = jit_g(state, batch)
    _ = float(metrics["lossG"])
    g_ms = (time.time() - t0) / iters * 1000
    t0 = time.time()
    for _ in range(iters):
        state, ld = jit_d(state, y, batch["xs"])
    _ = float(ld)
    d_ms = (time.time() - t0) / iters * 1000
    print(f"G step: {g_ms:.1f} ms/step (B={B}, "
          f"{B * 1000 / g_ms:.1f} img/s); D step: {d_ms:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
