"""Ablate the finest AAD block (blk8 @256^2) to locate its cost.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_aei2.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ghost_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import flax.linen as nn
    import jax.numpy as jnp

    from ghost_tpu.core.precision import DEFAULT_POLICY
    from ghost_tpu.models.aei import AADLayer, AADResBlock
    from ghost_tpu.nn.layers import Conv, instance_norm, resize_like_torch

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
            print(f"{name:40s} {dt * 1000:8.1f} ms  (compile {c:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{name:40s} FAILED {str(e)[:200]}", flush=True)

    cd = jnp.bfloat16
    h = jnp.asarray(rng.normal(0, 1, (B, 256, 256, 64)).astype(np.float32)).astype(cd)
    za = jnp.asarray(rng.normal(0, 1, (B, 256, 256, 64)).astype(np.float32)).astype(cd)
    z = jnp.asarray(rng.normal(0, 1, (B, 512)).astype(np.float32))

    blk = AADResBlock(64, 3, 2, DEFAULT_POLICY)
    v = blk.init(jax.random.key(0), h[:1], za[:1], z[:1])
    timed("blk8 full (64->3, shortcut)", jax.jit(blk.apply), v, h, za, z)

    blk_ns = AADResBlock(64, 64, 2, DEFAULT_POLICY)  # no learned shortcut
    v2 = blk_ns.init(jax.random.key(0), h[:1], za[:1], z[:1])
    timed("blk8-like 64->64 (no shortcut)", jax.jit(blk_ns.apply), v2, h, za, z)

    aad = AADLayer(64, DEFAULT_POLICY)
    va = aad.init(jax.random.key(0), h[:1], za[:1], z[:1])
    timed("one AADLayer @256^2/64", jax.jit(aad.apply), va, h, za, z)

    timed("instance_norm @ (64,256,256,64)",
          jax.jit(lambda x: instance_norm(x)), h)

    conv_n = Conv(3, 3, 1, padding=1, use_bias=False, dtype=cd)
    vc = conv_n.init(jax.random.key(0), h[:1])
    timed("conv3x3 64->3 @256^2 (narrow out)", jax.jit(conv_n.apply), vc, h)

    conv_w = Conv(64, 3, 1, padding=1, use_bias=False, dtype=cd)
    vw = conv_w.init(jax.random.key(0), h[:1])
    timed("conv3x3 64->64 @256^2", jax.jit(conv_w.apply), vw, h)

    conv1 = Conv(128, 1, 1, padding=0, dtype=cd)
    v1 = conv1.init(jax.random.key(0), za[:1])
    timed("conv1x1 64->128 @256^2 (attr gb)", jax.jit(conv1.apply), v1, za)

    mask_c = Conv(1, 1, 1, padding=0, dtype=cd)
    vm = mask_c.init(jax.random.key(0), h[:1])
    timed("conv1x1 64->1 + sigmoid (mask)",
          jax.jit(lambda vv, x: nn.sigmoid(mask_c.apply(vv, x))), vm, h)

    def modulate(x, g1, b1, m):
        a = g1 * x + b1
        i = 0.5 * x + 0.1
        return (1.0 - m) * a + m * i

    g1 = jnp.ones_like(h)
    b1 = jnp.zeros_like(h)
    mmask = jnp.asarray(rng.uniform(0, 1, (B, 256, 256, 1)).astype(np.float32)).astype(cd)
    timed("modulate+blend elementwise", jax.jit(modulate), h, g1, b1, mmask)

    small = jnp.asarray(rng.normal(0, 1, (B, 128, 128, 64)).astype(np.float32)).astype(cd)
    timed("bilinear x2 128->256 @64ch",
          jax.jit(lambda x: resize_like_torch(x, 2.0, method="bilinear",
                                              align_corners=True)), small)


if __name__ == "__main__":
    main()
