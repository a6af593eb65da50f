"""Quiet-host A/B: default bf16 conv vs f32-accumulate conv for the
generator's 3x3 shapes (contention polluted the first measurement).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_conv2.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ghost_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    B = 64
    rng = np.random.default_rng(0)
    checksum = jax.jit(lambda x: jnp.sum(
        jax.tree.leaves(x)[0].astype(jnp.float32)))

    def timed(name, fn, *args, reps=5):
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
            print(f"{name:44s} {dt * 1000:8.1f} ms  (compile {c:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{name:44s} FAILED {str(e)[:200]}", flush=True)

    cd = jnp.bfloat16

    def mk(shape):
        return jnp.asarray(
            rng.normal(0, 1, shape).astype(np.float32)).astype(cd)

    def conv_pair(cin, cout, res):
        x = mk((B, res, res, cin))
        w = mk((3, 3, cin, cout))

        def default(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def f32acc(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(x.dtype)

        timed(f"conv3x3 {cin}->{cout} @{res}^2 bf16", jax.jit(default), x, w)
        timed(f"conv3x3 {cin}->{cout} @{res}^2 f32acc", jax.jit(f32acc), x, w)

    conv_pair(64, 64, 256)
    conv_pair(64, 3, 256)
    conv_pair(128, 64, 128)
    conv_pair(128, 128, 128)


if __name__ == "__main__":
    main()
