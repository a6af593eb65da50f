"""Same-process A/B of the full AAD generator forward: conv-lowered vs
einsum-lowered 1x1 convs (ghost_tpu.nn.layers.CONV1X1_EINSUM), both
with the commute8 production structure (attr_upsample active). The
toggle flips between jit traces, so both programs run back-to-back
under identical host/queue conditions.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_gen_ab.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ghost_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    import ghost_tpu.nn.layers as L
    from ghost_tpu.core.precision import DEFAULT_POLICY
    from ghost_tpu.models.aei import AEINet

    B = 64
    rng = np.random.default_rng(0)

    def timed(name, fn, *args, reps=4):
        t0 = time.time()
        out = fn(*args)
        float(jnp.sum(out[0].astype(jnp.float32)))
        c = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
            float(jnp.sum(out[0].astype(jnp.float32)))
        dt = (time.time() - t0) / reps
        print(f"{name:40s} {dt * 1000:8.1f} ms  (compile {c:.0f}s)",
              flush=True)

    xt = jnp.asarray(rng.uniform(-1, 1, (B, 256, 256, 3)).astype(np.float32))
    z = jnp.asarray(rng.normal(0, 1, (B, 512)).astype(np.float32))

    model = AEINet(backbone="unet", num_blocks=2, policy=DEFAULT_POLICY)
    variables = model.init(jax.random.key(0), xt[:1], z[:1])

    for flag in (False, True, False, True):
        L.CONV1X1_EINSUM = flag
        fn = jax.jit(lambda v, x, zz: model.apply(v, x, zz))
        timed(f"AEI fwd (einsum1x1={flag})", fn, variables, xt, z)


if __name__ == "__main__":
    main()
