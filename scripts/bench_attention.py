"""TPU throughput of the Pallas flash-attention kernels vs the XLA
(jnp) attention — fwd and fwd+bwd, chained iterations + scalar
checksum (relay methodology).

The apex fmha kernels this replaces support seqlen {128..512} x head 64
only (reference apex/apex/contrib/csrc/fmha/fmha_api.cpp:33-42); the
Pallas kernel takes any block-multiple seqlen, so shapes here go past
the CUDA table on purpose.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_attention.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ghost_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from ghost_tpu.ops.pallas.attention import (flash_attention,
                                                flash_attention_reference)

    rng = np.random.default_rng(0)

    def bench(name, fn, args, reps=3, k=8):
        def chain(args):
            q, k_, v = args

            def body(c, _):
                y = fn(c, k_, v)
                s = jnp.sum(y[:1, :1, :1, :8].astype(jnp.float32))
                return c + (1e-30 * s).astype(c.dtype), s

            _, ss = jax.lax.scan(body, q, None, length=k)
            return jnp.sum(ss)

        j = jax.jit(chain)
        t0 = time.time()
        float(j(args))
        c = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            float(j(args))
        dt = (time.time() - t0) / reps / k * 1000
        print(f"{name:34s} {dt:8.2f} ms/call (compile {c:.0f}s)", flush=True)
        return dt

    for (B, H, S, D) in ((8, 8, 1024, 64), (8, 8, 4096, 64)):
        sh = (B, H, S, D)
        q = jnp.asarray(rng.normal(0, 1, sh).astype(np.float32),
                        dtype=jnp.bfloat16)
        k = jnp.asarray(rng.normal(0, 1, sh).astype(np.float32),
                        dtype=jnp.bfloat16)
        v = jnp.asarray(rng.normal(0, 1, sh).astype(np.float32),
                        dtype=jnp.bfloat16)
        tag = f"B{B} H{H} S{S} D{D}"

        t_ref = bench(f"xla attention fwd {tag}",
                      lambda q, k, v: flash_attention_reference(q, k, v),
                      (q, k, v))
        t_fl = bench(f"pallas flash fwd  {tag}",
                     lambda q, k, v: flash_attention(q, k, v), (q, k, v))
        print(f"  fwd speedup: {t_ref / t_fl:.2f}x", flush=True)

        # grad wrt ALL of q/k/v: differentiating only q would let jit
        # DCE the dkv pallas_call and the bench would never time it.
        # Elementwise-sum the three grads (same shape as q) so the
        # chain's checksum keeps every pallas_call live.
        def g_ref(q, k, v):
            gs = jax.grad(lambda q, k, v: jnp.sum(
                flash_attention_reference(q, k, v).astype(jnp.float32)),
                argnums=(0, 1, 2))(q, k, v)
            return gs[0] + gs[1] + gs[2]

        def g_fl(q, k, v):
            gs = jax.grad(lambda q, k, v: jnp.sum(
                flash_attention(q, k, v).astype(jnp.float32)),
                argnums=(0, 1, 2))(q, k, v)
            return gs[0] + gs[1] + gs[2]

        t_ref = bench(f"xla attention fwd+bwd {tag}", g_ref, (q, k, v))
        t_fl = bench(f"pallas flash fwd+bwd  {tag}", g_fl, (q, k, v))
        print(f"  fwd+bwd speedup: {t_ref / t_fl:.2f}x", flush=True)


if __name__ == "__main__":
    main()
