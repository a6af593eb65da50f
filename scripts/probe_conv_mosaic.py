"""Bisect which construct makes the Pallas conv3x3 fail Mosaic compile
through the relay (opaque HTTP 500). Variants isolate: 3-spec halo
binding, lane-dim concat (3C), the (TC,W,C)->(TC*W,C) reshape.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_conv_mosaic.py
"""

from __future__ import annotations

import time

import numpy as np

B = 8
H = W = 256
C = CO = 64
TC = 32


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

    def attempt(name, fn, *args):
        try:
            t0 = time.time()
            out = jax.jit(fn)(*args)
            s = float(jnp.sum(out.astype(jnp.float32)))
            print(f"{name:44s} OK ({time.time() - t0:.0f}s) sum={s:.1f}",
                  flush=True)
        except Exception as e:
            print(f"{name:44s} FAILED {str(e)[:160]}", flush=True)

    kspec = pl.BlockSpec((3, 3, C, CO), lambda j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)

    # V1: single spec, no halo, no W pad: 1 dot on the center tap only,
    # WITH the (TC,W,C)->(TC*W,C) reshape
    def k1(xm_ref, k_ref, o_ref):
        band = xm_ref[:]                      # (TC, W, C)
        acc = jax.lax.dot_general(
            band.reshape(TC * W, C), k_ref[1, 1],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:] = acc.reshape(TC, W, CO).astype(o_ref.dtype)

    def v1(x, w):
        return pl.pallas_call(
            k1, grid=(B * H // TC,),
            in_specs=[pl.BlockSpec((TC, W, C), lambda j: (j, 0, 0),
                                   memory_space=pltpu.VMEM), kspec],
            out_specs=pl.BlockSpec((TC, W, CO), lambda j: (j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * H, W, CO), x.dtype),
        )(x, w)

    attempt("V1 center-tap dot + reshape", v1, x, w)

    # V2: V1 + 9-tap accumulation from W-shifted slices of a padded
    # input (still single spec, no row halo -> wrong numerics, compile
    # probe only), NO lane concat
    Wp = W + 16

    def k2(xm_ref, k_ref, o_ref):
        band = xm_ref[:]                      # (TC, Wp, C)
        acc = jnp.zeros((TC * W, CO), jnp.float32)
        for dx in range(3):
            sl = band[:, dx:dx + W]
            acc = acc + jax.lax.dot_general(
                sl.reshape(TC * W, C), k_ref[1, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[:] = acc.reshape(TC, W, CO).astype(o_ref.dtype)

    def v2(x, w):
        xp = jnp.pad(x, ((0, 0), (1, Wp - W - 1), (0, 0)))
        return pl.pallas_call(
            k2, grid=(B * H // TC,),
            in_specs=[pl.BlockSpec((TC, Wp, C), lambda j: (j, 0, 0),
                                   memory_space=pltpu.VMEM), kspec],
            out_specs=pl.BlockSpec((TC, W, CO), lambda j: (j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * H, W, CO), x.dtype),
        )(xp, w)

    attempt("V2 +Wshift slices (3 dots)", v2, x, w)

    # V3: V2 + lane concat into (TC, W, 3C) and ONE dot
    def k3(xm_ref, k_ref, o_ref):
        band = xm_ref[:]
        cols = jnp.concatenate(
            [band[:, 0:W], band[:, 1:W + 1], band[:, 2:W + 2]], axis=-1)
        acc = jax.lax.dot_general(
            cols.reshape(TC * W, 3 * C), k_ref[1].reshape(3 * C, CO),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:] = acc.reshape(TC, W, CO).astype(o_ref.dtype)

    def v3(x, w):
        xp = jnp.pad(x, ((0, 0), (1, Wp - W - 1), (0, 0)))
        return pl.pallas_call(
            k3, grid=(B * H // TC,),
            in_specs=[pl.BlockSpec((TC, Wp, C), lambda j: (j, 0, 0),
                                   memory_space=pltpu.VMEM), kspec],
            out_specs=pl.BlockSpec((TC, W, CO), lambda j: (j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * H, W, CO), x.dtype),
        )(xp, w)

    attempt("V3 +lane concat one dot", v3, x, w)

    # V4: V2 + 3-spec row-halo binding (offset index maps), row concat
    def k4(xp_ref, xm_ref, xn_ref, k_ref, o_ref):
        rows = jnp.concatenate(
            [xp_ref[TC - 1][None], xm_ref[:], xn_ref[0][None]], axis=0)
        acc = jnp.zeros((TC * W, CO), jnp.float32)
        for dy in range(3):
            band = rows[dy:dy + TC]
            acc = acc + jax.lax.dot_general(
                band[:, 1:W + 1].reshape(TC * W, C), k_ref[dy, 1],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[:] = acc.reshape(TC, W, CO).astype(o_ref.dtype)

    def v4(x, w):
        xp = jnp.pad(x, ((TC, TC), (1, Wp - W - 1), (0, 0)))
        spec = lambda off: pl.BlockSpec((TC, Wp, C),
                                        lambda j: (j + off, 0, 0),
                                        memory_space=pltpu.VMEM)
        return pl.pallas_call(
            k4, grid=(B * H // TC,),
            in_specs=[spec(0), spec(1), spec(2), kspec],
            out_specs=pl.BlockSpec((TC, W, CO), lambda j: (j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * H, W, CO), x.dtype),
        )(xp, xp, xp, w)

    attempt("V4 +3-spec row halo + row concat", v4, x, w)

    # V5: the full correct conv — row halo + 9 separate dots (no lane
    # concat), chained K=8 and timed against lax.conv
    nb_per_img = H // TC

    def k5(xp_ref, xm_ref, xn_ref, k_ref, o_ref):
        j = pl.program_id(0)
        img_blk = j % nb_per_img
        zrow = jnp.zeros_like(xm_ref[0])
        top = jnp.where(img_blk > 0, xp_ref[TC - 1], zrow)
        bot = jnp.where(img_blk < nb_per_img - 1, xn_ref[0], zrow)
        rows = jnp.concatenate([top[None], xm_ref[:], bot[None]], axis=0)
        acc = jnp.zeros((TC * W, CO), jnp.float32)
        for dy in range(3):
            band = rows[dy:dy + TC]
            for dx in range(3):
                acc = acc + jax.lax.dot_general(
                    band[:, dx:dx + W].reshape(TC * W, C), k_ref[dy, dx],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        o_ref[:] = acc.reshape(TC, W, CO).astype(o_ref.dtype)

    def v5(x, w):
        xp = jnp.pad(x, ((TC, TC), (1, Wp - W - 1), (0, 0)))
        spec = lambda off: pl.BlockSpec((TC, Wp, C),
                                        lambda j: (j + off, 0, 0),
                                        memory_space=pltpu.VMEM)
        return pl.pallas_call(
            k5, grid=(B * H // TC,),
            in_specs=[spec(0), spec(1), spec(2), kspec],
            out_specs=pl.BlockSpec((TC, W, CO), lambda j: (j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * H, W, CO), x.dtype),
        )(xp, xp, xp, w)

    attempt("V5 full conv (halo + 9 dots)", v5, x, w)

    # V6: halo WITHOUT any in-kernel concat: pltpu.roll row-shift plus
    # a per-row where() substituting the halo rows from the neighbor
    # blocks (Mosaic rejects concatenate on both sublane and lane axes)
    def k6(xp_ref, xm_ref, xn_ref, k_ref, o_ref):
        j = pl.program_id(0)
        img_blk = j % nb_per_img
        xm = xm_ref[:]                        # (TC, Wp, C)
        zrow = jnp.zeros_like(xm_ref[0])
        top = jnp.where(img_blk > 0, xp_ref[TC - 1], zrow)
        bot = jnp.where(img_blk < nb_per_img - 1, xn_ref[0], zrow)
        row_ix = jax.lax.broadcasted_iota(jnp.int32, (TC, 1, 1), 0)
        band0 = jnp.where(row_ix == 0, top[None],
                          pltpu.roll(xm, shift=1, axis=0))
        band2 = jnp.where(row_ix == TC - 1, bot[None],
                          pltpu.roll(xm, shift=TC - 1, axis=0))
        acc = jnp.zeros((TC * W, CO), jnp.float32)
        for dy, band in ((0, band0), (1, xm), (2, band2)):
            for dx in range(3):
                acc = acc + jax.lax.dot_general(
                    band[:, dx:dx + W].reshape(TC * W, C), k_ref[dy, dx],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        o_ref[:] = acc.reshape(TC, W, CO).astype(o_ref.dtype)

    def v6(x, w):
        xp = jnp.pad(x, ((TC, TC), (1, Wp - W - 1), (0, 0)))
        spec = lambda off: pl.BlockSpec((TC, Wp, C),
                                        lambda j: (j + off, 0, 0),
                                        memory_space=pltpu.VMEM)
        return pl.pallas_call(
            k6, grid=(B * H // TC,),
            in_specs=[spec(0), spec(1), spec(2), kspec],
            out_specs=pl.BlockSpec((TC, W, CO), lambda j: (j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * H, W, CO), x.dtype),
        )(xp, xp, xp, w)

    attempt("V6 full conv (roll+where halo)", v6, x, w)

    # correctness vs lax + chained timing (B=64-frames worth of rows)
    from jax import lax as jlax

    x4 = x.reshape(B, H, W, C)

    def lax_conv(x4, w):
        return jlax.conv_general_dilated(
            x4, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    try:
        a = jax.jit(lax_conv)(x4, w)
        b = jax.jit(v6)(x, w).reshape(B, H, W, C)
        d = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                  - b.astype(jnp.float32))))
        print(f"V6 vs lax max abs diff: {d:.5f}", flush=True)
    except Exception as e:
        print(f"V6 diff FAILED {str(e)[:160]}", flush=True)

    K = 8
    xb = jnp.asarray(np.random.default_rng(1).normal(
        0, 1, (64 * H, W, C)).astype(np.float32)).astype(cd)

    def chain_pallas(x, w):
        for _ in range(K):
            x = v6(x, w)
        return x

    def chain_lax(x, w):
        x4 = x.reshape(64, H, W, C)
        for _ in range(K):
            x4 = lax_conv(x4, w)
        return x4

    for name, fn in (("lax", chain_lax), ("pallas-v6", chain_pallas)):
        try:
            jf = jax.jit(fn)
            t0 = time.time()
            out = jf(xb, w)
            float(jnp.sum(out.astype(jnp.float32)))
            c = time.time() - t0
            t0 = time.time()
            for _ in range(3):
                out = jf(xb, w)
                float(jnp.sum(out.astype(jnp.float32)))
            dt = (time.time() - t0) / 3
            print(f"conv chain {name:10s} {dt*1000:8.1f} ms"
                  f" ~{(dt*1000-27)/K:6.2f} ms/op (compile {c:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"conv chain {name} FAILED {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
