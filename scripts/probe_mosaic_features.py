"""Feature-level bisection of Mosaic lowering failures (relay hides the
error text, but failures return in seconds while successes compile) —
each variant adds ONE construct to the known-good V2 skeleton
(single-spec 3-D blocks, W-slices, reshape, dot_general).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_mosaic_features.py
"""

from __future__ import annotations

import time

import numpy as np

B = 8
H = W = 256
C = CO = 64
TC = 32
Wp = W + 16


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ghost_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    cd = jnp.bfloat16
    x = jnp.asarray(rng.normal(0, 1, (B * H, W, C)).astype(np.float32)).astype(cd)
    w = jnp.asarray(rng.normal(0, 1, (3, 3, C, CO)).astype(np.float32)).astype(cd)
    kspec = pl.BlockSpec((3, 3, C, CO), lambda j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)

    def attempt(name, fn, *args):
        try:
            t0 = time.time()
            out = jax.jit(fn)(*args)
            s = float(jnp.sum(out.astype(jnp.float32)))
            print(f"{name:46s} OK ({time.time() - t0:.0f}s) sum={s:.1f}",
                  flush=True)
        except Exception as e:
            print(f"{name:46s} FAILED {str(e)[:120]}", flush=True)

    def call1(kern, x, w):
        xp = jnp.pad(x, ((0, 0), (1, Wp - W - 1), (0, 0)))
        return pl.pallas_call(
            kern, grid=(B * H // TC,),
            in_specs=[pl.BlockSpec((TC, Wp, C), lambda j: (j, 0, 0),
                                   memory_space=pltpu.VMEM), kspec],
            out_specs=pl.BlockSpec((TC, W, CO), lambda j: (j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * H, W, CO), x.dtype),
        )(xp, w)

    def dot1(band, kmat):
        return jax.lax.dot_general(
            band.reshape(TC * W, C), kmat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # V7: + pltpu.roll on the row axis
    def k7(xm_ref, k_ref, o_ref):
        xm = pltpu.roll(xm_ref[:], shift=1, axis=0)
        o_ref[:] = dot1(xm[:, 1:W + 1], k_ref[1, 1]).reshape(
            TC, W, CO).astype(o_ref.dtype)

    attempt("V7 +pltpu.roll(axis=0)", lambda x, w: call1(k7, x, w), x, w)

    # V8: + broadcasted_iota row mask + where
    def k8(xm_ref, k_ref, o_ref):
        xm = xm_ref[:]
        row_ix = jax.lax.broadcasted_iota(jnp.int32, (TC, 1, 1), 0)
        xm = jnp.where(row_ix == 0, jnp.zeros_like(xm[0])[None], xm)
        o_ref[:] = dot1(xm[:, 1:W + 1], k_ref[1, 1]).reshape(
            TC, W, CO).astype(o_ref.dtype)

    attempt("V8 +iota-row where", lambda x, w: call1(k8, x, w), x, w)

    # V9: + scalar-cond where over a row tensor
    def k9(xm_ref, k_ref, o_ref):
        j = pl.program_id(0)
        xm = xm_ref[:]
        row = jnp.where(j > 0, xm[0], jnp.zeros_like(xm[0]))
        extra = dot1(jnp.broadcast_to(row[None], (TC, Wp, C))[:, 1:W + 1],
                     k_ref[0, 1])
        o_ref[:] = (dot1(xm[:, 1:W + 1], k_ref[1, 1]) + extra).reshape(
            TC, W, CO).astype(o_ref.dtype)

    attempt("V9 +scalar-cond where + broadcast", lambda x, w: call1(k9, x, w),
            x, w)

    # V10: 3-spec offset binding, kernel uses only the middle ref
    def k10(xp_ref, xm_ref, xn_ref, k_ref, o_ref):
        o_ref[:] = dot1(xm_ref[:][:, 1:W + 1], k_ref[1, 1]).reshape(
            TC, W, CO).astype(o_ref.dtype)

    def v10(x, w):
        xp = jnp.pad(x, ((TC, TC), (1, Wp - W - 1), (0, 0)))
        spec = lambda off: pl.BlockSpec((TC, Wp, C),
                                        lambda j: (j + off, 0, 0),
                                        memory_space=pltpu.VMEM)
        return pl.pallas_call(
            k10, grid=(B * H // TC,),
            in_specs=[spec(0), spec(1), spec(2), kspec],
            out_specs=pl.BlockSpec((TC, W, CO), lambda j: (j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * H, W, CO), x.dtype),
        )(xp, xp, xp, w)

    attempt("V10 3-spec offset binding (mid only)", v10, x, w)

    # V11: single-row use of a neighbor ref (xp_ref[TC-1])
    def k11(xp_ref, xm_ref, xn_ref, k_ref, o_ref):
        top = xp_ref[TC - 1]
        extra = dot1(jnp.broadcast_to(top[None], (TC, Wp, C))[:, 1:W + 1],
                     k_ref[0, 1])
        o_ref[:] = (dot1(xm_ref[:][:, 1:W + 1], k_ref[1, 1]) + extra).reshape(
            TC, W, CO).astype(o_ref.dtype)

    def v11(x, w):
        xp = jnp.pad(x, ((TC, TC), (1, Wp - W - 1), (0, 0)))
        spec = lambda off: pl.BlockSpec((TC, Wp, C),
                                        lambda j: (j + off, 0, 0),
                                        memory_space=pltpu.VMEM)
        return pl.pallas_call(
            k11, grid=(B * H // TC,),
            in_specs=[spec(0), spec(1), spec(2), kspec],
            out_specs=pl.BlockSpec((TC, W, CO), lambda j: (j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * H, W, CO), x.dtype),
        )(xp, xp, xp, w)

    attempt("V11 +neighbor row read", v11, x, w)

    # V12: acc.at[].add row-range pattern
    def k12(xm_ref, k_ref, o_ref):
        xm = xm_ref[:]
        acc = jnp.zeros((TC * W, CO), jnp.float32)
        main = jax.lax.dot_general(
            xm[0:TC - 1, 1:W + 1].reshape((TC - 1) * W, C), k_ref[0, 1],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc.at[W:].add(main)
        acc = acc + dot1(xm[:, 1:W + 1], k_ref[1, 1])
        o_ref[:] = acc.reshape(TC, W, CO).astype(o_ref.dtype)

    attempt("V12 +acc.at[rows].add", lambda x, w: call1(k12, x, w), x, w)


if __name__ == "__main__":
    main()
