"""Ablate aad_modulate's block_rows (chained K=8, one program each) at
the shapes the generator actually runs fused (blk7/blk6/blk5).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ablate_aad_block.py
"""

from __future__ import annotations

import time

import numpy as np

K = 8
B = 64


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ghost_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from ghost_tpu.ops.pallas.aad import aad_modulate

    rng = np.random.default_rng(0)
    cd = jnp.bfloat16

    def mk(shape, dtype=None):
        a = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
        return a.astype(cd) if dtype is None else a.astype(dtype)

    for (HH, CC, tag) in ((128, 128, "blk7"), (64, 256, "blk6")):
        h0 = mk((B, HH, HH, CC))
        ga = mk((B, HH, HH, CC))
        bb = mk((B, HH, HH, CC))
        idgb = mk((B, 2 * CC), jnp.float32)
        mkk = mk((1, 1, CC, 1), jnp.float32)
        mbb = mk((1,), jnp.float32)
        args = (h0, ga, bb, idgb, mkk, mbb)

        for br in (256, 512, 1024, 2048):
            def chain(h, ga, bb, idgb, mkk, mbb, _br=br):
                for _ in range(K):
                    h = aad_modulate(h, ga, bb, idgb, mkk, mbb,
                                     block_rows=_br, interpret=False)
                return h

            try:
                jf = jax.jit(chain)
                t0 = time.time()
                out = jf(*args)
                float(jnp.sum(out.astype(jnp.float32)))
                c = time.time() - t0
                t0 = time.time()
                for _ in range(3):
                    out = jf(*args)
                    float(jnp.sum(out.astype(jnp.float32)))
                dt = (time.time() - t0) / 3
                print(f"{tag} br={br:5d}: {dt*1000:7.1f} ms"
                      f" ~{(dt*1000-27)/K:5.2f} ms/op (compile {c:.0f}s)",
                      flush=True)
            except Exception as e:
                print(f"{tag} br={br}: FAILED {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
