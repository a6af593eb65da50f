"""Locate the per-shot mask path cost (static vs dynamic, landmarks).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_mask.py
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
    from ghost_tpu.models.landmark import Landmark106
    from ghost_tpu.ops.mask import (face_mask_batch,
                                    mask_offset_from_landmarks,
                                    soft_face_mask_dynamic)

    B = 64
    rng = np.random.default_rng(0)
    checksum = jax.jit(lambda x: jnp.sum(
        jax.tree.leaves(x)[0].astype(jnp.float32)))

    def timed(name, fn, *args, reps=3):
        try:
            t0 = time.time()
            out = fn(*args)
            float(checksum(out))
            c = time.time() - t0
            t0 = time.time()
            for _ in range(reps):
                out = fn(*args)
                float(checksum(out))
            dt = (time.time() - t0) / reps
            print(f"{name:42s} {dt * 1000:8.1f} ms (compile {c:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{name:42s} FAILED {str(e)[:200]}", flush=True)

    lmk = Landmark106(policy=DEFAULT_POLICY)
    v = lmk.init(jax.random.key(0), jnp.zeros((1, 192, 192, 3)))
    x64 = jnp.asarray(rng.uniform(0, 255, (B, 192, 192, 3)).astype(np.float32))
    x128 = jnp.asarray(
        rng.uniform(0, 255, (2 * B, 192, 192, 3)).astype(np.float32))
    timed("landmark fwd 64", jax.jit(lmk.apply), v, x64)
    timed("landmark fwd 128", jax.jit(lmk.apply), v, x128)

    lm = jnp.asarray(
        (rng.uniform(40, 180, (B, 106, 2))).astype(np.float32))
    timed("static mask batch (64)",
          jax.jit(lambda l: face_mask_batch(l, 224, (5.0, 5.0, 5.0, 2.0))),
          lm)

    params = jnp.tile(jnp.asarray([5.0, 5.0, 5.0, 2.0]), (B, 1))

    @jax.jit
    def dyn(l, p):
        return jax.vmap(lambda li, pi: soft_face_mask_dynamic(
            li, 224, pi[0], pi[1], pi[2], pi[3]))(l, p)

    timed("dynamic mask batch (64, traced)", dyn, lm, params)

    timed("offsets vmap (64)",
          jax.jit(lambda a, b: jax.vmap(mask_offset_from_landmarks)(a, b)),
          lm, lm)


if __name__ == "__main__":
    main()
