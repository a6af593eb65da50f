"""Same-process A/B of the full AEI forward: plain vs width-packed
3x3 convs at C<=64/W>=256 (ghost_tpu.nn.layers.CONV3X3_WPACK — i.e.
blk8's conv0/conv1/conv_short and any encoder convs that match the
gate). The toggle flips between jit traces, so both programs run
back-to-back under identical host/queue conditions.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_wpack_gen.py
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

    # exactness at the generator level (bf16: expect small diffs only)
    outs = {}
    for flag in (False, True):
        L.CONV3X3_WPACK = flag
        outs[flag] = jax.jit(model.apply)(variables, xt[:2], z[:2])[0]
    d = float(jnp.abs(outs[True].astype(jnp.float32) -
                      outs[False].astype(jnp.float32)).max())
    print(f"generator max abs diff (bf16): {d:.3e}", flush=True)

    for flag in (False, True, False, True):
        L.CONV3X3_WPACK = flag
        fn = jax.jit(lambda v, x, zz: model.apply(v, x, zz))
        timed(f"AEI fwd (wpack3x3={flag})", fn, variables, xt, z)


if __name__ == "__main__":
    main()
