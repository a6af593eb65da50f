"""TPU timing of the antidiagonal-vectorized transducer_loss
(nn/transducer.py) — fwd and fwd+grad, chained iterations + scalar
checksum (relay methodology). Shapes follow the apex contrib test
scale (reference apex/apex/contrib/test/transducer/transducer_ref.py):
B=16, T=128, U=64, V=128.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_transducer.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ghost_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from ghost_tpu.nn.transducer import transducer_loss

    B, T, U, V = 16, 128, 64, 128
    rng = np.random.default_rng(0)
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.normal(0, 1, (B, T, U + 1, V)).astype(np.float32)))
    labels = jnp.asarray(rng.integers(1, V, (B, U)).astype(np.int32))
    f_len = jnp.full((B,), T, jnp.int32)
    y_len = jnp.full((B,), U, jnp.int32)

    def fwd(lp):
        return jnp.sum(transducer_loss(lp, labels, f_len, y_len))

    grad = jax.grad(fwd)

    fwd_s = fwd
    grad_s = lambda x: jnp.sum(grad(x))

    def chain(fn, x, k):
        def body(c, _):
            s = fn(c)
            # data dependency (1e-30*s is not folded: could carry NaN)
            return x + 1e-30 * s, s
        _, ss = jax.lax.scan(body, x, None, length=k)
        return jnp.sum(ss)

    for name, fn in (("fwd", fwd_s), ("grad", grad_s)):
        j = jax.jit(lambda x, fn=fn: chain(fn, x, 8))
        t0 = time.time()
        float(j(lp))
        c = time.time() - t0
        t0 = time.time()
        for _ in range(3):
            float(j(lp))
        dt = (time.time() - t0) / 3 / 8 * 1000
        print(f"transducer_loss {name}: {dt:7.2f} ms/call "
              f"(B{B} T{T} U{U} V{V}; compile {c:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
