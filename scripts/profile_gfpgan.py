"""Bisection profile of the GFPGAN-512 face restore forward on TPU.

The enhancer bench puts one face lane (crop + GFPGANClean fwd + paste)
at ~15.7 ms/frame at chunk 8 vs a ~3-4 ms FLOP roofline. This times,
with the chained-in-one-jit methodology (CLAUDE.md: isolated one-op
programs mislead):

  * the full GFPGANClean forward (B=8, 512^2);
  * the StyleGAN2CSFT decoder alone at out_size 512/256/128 (random
    conditions of the right shapes) — level-by-level deltas localize
    the cost by resolution;

encoder+conditions cost ~= full - decoder512.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_gfpgan.py
"""

from __future__ import annotations

import math
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ghost_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from ghost_tpu.core.precision import DEFAULT_POLICY
    from ghost_tpu.models.sr.gfpgan import (GFPGANClean, StyleGAN2CSFT,
                                            unet_channels)

    B = 8
    rng = np.random.default_rng(0)
    key = jax.random.key(0)

    def timed(name, fn, x, extra=(), reps=3, k=4):
        # everything (weights, conditions) rides as a jit ARGUMENT —
        # closure-captured arrays become HLO literals and trip the
        # relay's HTTP-413 limit
        def chain(x, extra):
            def body(c, _):
                y = fn(c, *extra)
                s = jnp.sum(y[:1, :4, :4].astype(jnp.float32))
                return c + (1e-30 * s).astype(c.dtype), s
            _, ss = jax.lax.scan(body, x, None, length=k)
            return jnp.sum(ss)

        j = jax.jit(chain)
        t0 = time.time()
        float(j(x, extra))
        c = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            float(j(x, extra))
        dt = (time.time() - t0) / reps / k * 1000
        print(f"{name:24s} {dt:8.2f} ms/call (compile {c:.0f}s)", flush=True)
        return dt

    # full forward
    gfp = GFPGANClean(policy=DEFAULT_POLICY)
    x = jnp.asarray(rng.uniform(-1, 1, (B, 512, 512, 3)).astype(np.float32))
    gv = gfp.init(key, x[:1])
    timed("gfpgan full 512", lambda c, v: gfp.apply(v, c)[0], x, (gv,))

    # decoder alone at decreasing out_size
    uch = unet_channels(2, 1.0)
    for out_size in (512, 256, 128):
        log_size = int(math.log2(out_size))
        num_latent = log_size * 2 - 2
        dec = StyleGAN2CSFT(out_size=out_size, policy=DEFAULT_POLICY)
        styles = jnp.asarray(
            rng.normal(0, 1, (B, num_latent, 512)).astype(np.float32))
        conditions = []
        for s in range(log_size - 2):
            res = 2 ** (s + 3)
            c = uch[res]  # = decoder ch[res] // 2 (sft_half)
            for _ in range(2):
                conditions.append(jnp.asarray(rng.normal(
                    0, 1, (B, res, res, int(c))).astype(np.float32)))
        dv = dec.init(key, styles[:1], [c[:1] for c in conditions])
        timed(f"decoder {out_size}",
              lambda st, v, cond, dec=dec: dec.apply(v, st, cond),
              styles, (dv, conditions))


if __name__ == "__main__":
    main()
