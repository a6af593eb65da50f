"""Bisect the AEI forward cost on TPU (encoder vs generator vs blocks).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_aei.py
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
    from ghost_tpu.models.aei import (AADGenerator, AADResBlock,
                                      MLAttrEncoder)

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
            print(f"{name:34s} {dt * 1000:9.1f} ms  (compile {c:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{name:34s} FAILED {str(e)[:200]}", flush=True)

    xt = jnp.asarray(rng.uniform(-1, 1, (B, 256, 256, 3)).astype(np.float32))
    z = jnp.asarray(rng.normal(0, 1, (B, 512)).astype(np.float32))

    enc = MLAttrEncoder("unet", DEFAULT_POLICY)
    enc_vars = enc.init(jax.random.key(0), xt[:1])
    timed("encoder fwd (64)", jax.jit(enc.apply), enc_vars, xt)

    attrs = jax.jit(enc.apply)(enc_vars, xt)
    attrs = jax.tree.map(jax.block_until_ready, attrs)
    gen = AADGenerator("unet", 512, 2, DEFAULT_POLICY)
    gen_vars = gen.init(jax.random.key(0),
                        jax.tree.map(lambda a: a[:1], attrs), z[:1])
    timed("generator fwd (64)", jax.jit(gen.apply), gen_vars, attrs, z)

    # single AAD res-blocks at the two finest resolutions
    for name, cin, cout, res, cattr in (
        ("blk8 (256^2, 64->3)", 64, 3, 256, 64),
        ("blk7 (128^2, 128->64)", 128, 64, 128, 64),
        ("blk6 (64^2, 256->128)", 256, 128, 64, 128),
        ("blk5 (32^2, 512->256)", 512, 256, 32, 256),
    ):
        blk = AADResBlock(cin, cout, 2, DEFAULT_POLICY)
        h = jnp.asarray(rng.normal(0, 1, (B, res, res, cin)).astype(np.float32))
        za = jnp.asarray(rng.normal(0, 1, (B, res, res, cattr)).astype(np.float32))
        v = blk.init(jax.random.key(0), h[:1], za[:1], z[:1])
        timed(name, jax.jit(blk.apply), v, h, za, z)

    # deconv cost probe: one encoder up-block worth of ConvTranspose
    from ghost_tpu.nn.layers import Conv, ConvTranspose

    x128 = jnp.asarray(
        rng.normal(0, 1, (B, 64, 64, 256)).astype(np.float32))
    ct = ConvTranspose(64, 4, 2, 1, use_bias=False, dtype=jnp.bfloat16)
    ctv = ct.init(jax.random.key(0), x128[:1])
    timed("deconv4x4s2 256->64 @64->128", jax.jit(ct.apply), ctv, x128)
    cv = Conv(64, 3, 1, padding=1, use_bias=False, dtype=jnp.bfloat16)
    cvv = cv.init(jax.random.key(0), x128[:1])
    timed("conv3x3 256->64 @64 (flops ref)", jax.jit(cv.apply), cvv, x128)


if __name__ == "__main__":
    main()
