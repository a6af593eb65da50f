"""Same-process A/B: SRVGGNetCompact tile forward, plain vs
width-packed 3x3 convs (ghost_tpu.nn.layers.CONV3X3_WPACK).

Motivation: the enhancer bench puts the SRVGG background pass at
~167 ms/1080p frame vs a ~50 ms bf16 roofline — its trunk is PURE
conv3x3+PReLU at 64 channels, exactly the half-empty-lane shape class
where W-packing measured 1.55x in isolation (scripts/profile_wpack.py)
but was neutral inside the AEI generator (fusion with surrounding AAD
work hid the win there; SRVGG has no surrounding work to fuse with).

Shapes mirror pipeline/enhance.py's background tiling: batch 8 frames x
one (270,240)+10-halo tile, W=260 (>=256 gate, even). Chained K
dependent applications inside one jit per variant; the module-level
flag flips between traces in one process.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_wpack_srvgg.py
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
    from ghost_tpu.models.sr.srvgg import SRVGGNetCompact

    B, TH, TW = 8, 290, 260  # (270,240) tile + 10px halo
    K = 8
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(0, 1, (B, TH, TW, 3)).astype(np.float32))

    model = SRVGGNetCompact(policy=DEFAULT_POLICY)
    variables = model.init(jax.random.key(0), x0[:1])

    # exactness first (wpack is algebraically exact; bf16 rounding only)
    outs = {}
    for flag in (False, True):
        L.CONV3X3_WPACK = flag
        outs[flag] = jax.jit(model.apply)(variables, x0[:2])
    d = float(jnp.abs(outs[True].astype(jnp.float32) -
                      outs[False].astype(jnp.float32)).max())
    print(f"srvgg tile max abs diff (bf16): {d:.3e}", flush=True)

    def chain(variables, x):
        def body(c, _):
            y = model.apply(variables, c)
            # data dependency without feeding the x4 output back
            c = x0 + 0.0 * y[:, :TH, :TW, :]
            return c, jnp.sum(y[:1, :8, :8].astype(jnp.float32))
        _, s = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(s)

    for flag in (False, True, False, True):
        L.CONV3X3_WPACK = flag
        fn = jax.jit(chain)
        t0 = time.time()
        float(fn(variables, x0))
        c = time.time() - t0
        t0 = time.time()
        reps = 4
        for _ in range(reps):
            float(fn(variables, x0))
        dt = (time.time() - t0) / reps / K * 1000
        print(f"wpack={flag}: {dt:8.2f} ms/tile-call  (compile {c:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
