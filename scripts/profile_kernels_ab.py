"""TPU A/B: Pallas fused-AAD-modulate and Pallas conv3x3 vs their XLA
chains, K-chained in single programs (operands as jit args).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_kernels_ab.py
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
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ghost_tpu.ops.pallas.aad import aad_modulate, aad_modulate_reference

    rng = np.random.default_rng(0)
    cd = jnp.bfloat16

    def mk(shape, dtype=None):
        a = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
        return a.astype(cd) if dtype is None else a.astype(dtype)

    def timed(name, fn, *args, reps=3):
        try:
            jf = jax.jit(fn)
            t0 = time.time()
            out = jf(*args)
            float(jnp.sum(out.astype(jnp.float32)))
            c = time.time() - t0
            t0 = time.time()
            for _ in range(reps):
                out = jf(*args)
                float(jnp.sum(out.astype(jnp.float32)))
            dt = (time.time() - t0) / reps
            per = (dt * 1000 - 27.0) / K
            print(f"{name:48s} {dt * 1000:8.1f} ms total  ~{per:6.2f} ms/op"
                  f"  (compile {c:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name:48s} FAILED {str(e)[:300]}", flush=True)

    # ---- AAD modulate: jnp chain vs pallas, chained K times ----------
    for (HH, CC, tag) in ((256, 64, "blk8"), (128, 128, "blk7")):
        h0 = mk((B, HH, HH, CC))
        ga = mk((B, HH, HH, CC))
        bb = mk((B, HH, HH, CC))
        idgb = mk((B, 2 * CC), jnp.float32)
        mkk = mk((1, 1, CC, 1), jnp.float32)
        mbb = mk((1,), jnp.float32)

        def ref_chain(h, ga, bb, idgb, mkk, mbb):
            for _ in range(K):
                h = aad_modulate_reference(h, ga, bb, idgb, mkk, mbb)
            return h

        def pallas_chain(h, ga, bb, idgb, mkk, mbb):
            for _ in range(K):
                h = aad_modulate(h, ga, bb, idgb, mkk, mbb,
                                 interpret=False)
            return h

        args = (h0, ga, bb, idgb, mkk, mbb)
        timed(f"aad-mod jnp x{K} {tag} @{HH}^2/{CC}", ref_chain, *args)
        timed(f"aad-mod pallas x{K} {tag} @{HH}^2/{CC}", pallas_chain, *args)

        try:
            a = jax.jit(aad_modulate_reference)(*args)
            b = jax.jit(lambda *a_: aad_modulate(*a_, interpret=False))(*args)
            d = float(jnp.max(jnp.abs(
                a.astype(jnp.float32) - b.astype(jnp.float32))))
            print(f"  {tag} pallas-vs-jnp max abs diff: {d:.5f}", flush=True)
        except Exception as e:
            print(f"  {tag} diff FAILED {str(e)[:200]}", flush=True)

    # ---- conv3x3: lax vs pallas (rows-flattened 3-D blocks) ----------
    TC = 32

    def make_conv_pallas(Hh, Ww, Cc, Co):
        nb_per_img = Hh // TC
        Wp = Ww + 16  # pad W to a 16-multiple envelope: data at [1, Ww+1)

        def _kernel(xp_ref, xm_ref, xn_ref, k_ref, o_ref):
            j = pl.program_id(0)
            img_blk = j % nb_per_img
            top_ok = img_blk > 0
            bot_ok = img_blk < nb_per_img - 1
            zrow = jnp.zeros_like(xm_ref[0])
            top = jnp.where(top_ok, xp_ref[TC - 1], zrow)
            bot = jnp.where(bot_ok, xn_ref[0], zrow)
            rows = jnp.concatenate([top[None], xm_ref[:], bot[None]],
                                   axis=0)  # (TC+2, Wp, C)
            kk = k_ref[:]
            acc = jnp.zeros((TC * Ww, Co), jnp.float32)
            for dy in range(3):
                band = rows[dy:dy + TC]
                cols = jnp.concatenate(
                    [band[:, 0:Ww], band[:, 1:Ww + 1], band[:, 2:Ww + 2]],
                    axis=-1)  # (TC, Ww, 3C)
                acc = acc + jax.lax.dot_general(
                    cols.reshape(TC * Ww, 3 * Cc),
                    kk[dy].reshape(3 * Cc, Co),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            o_ref[:] = acc.reshape(TC, Ww, Co).astype(o_ref.dtype)

        def conv(x, w):
            b = x.shape[0]
            r = b * Hh
            x2 = x.reshape(r, Ww, Cc)
            x2 = jnp.pad(x2, ((TC, TC), (1, Wp - Ww - 1), (0, 0)))
            nb = r // TC
            spec = lambda off: pl.BlockSpec(
                (TC, Wp, Cc), lambda j: (j + off, 0, 0),
                memory_space=pltpu.VMEM)
            out = pl.pallas_call(
                _kernel,
                grid=(nb,),
                in_specs=[spec(0), spec(1), spec(2),
                          pl.BlockSpec((3, 3, Cc, Co),
                                       lambda j: (0, 0, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((TC, Ww, Co), lambda j: (j, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((r, Ww, Co), x.dtype),
            )(x2, x2, x2, w)
            return out.reshape(b, Hh, Ww, Co)

        return conv

    for (HH, CC, tag) in ((256, 64, "blk8"), (128, 128, "blk7")):
        x0 = mk((B, HH, HH, CC))
        w = mk((3, 3, CC, CC))
        conv_p = make_conv_pallas(HH, HH, CC, CC)

        def lax_chain(x, w):
            for _ in range(K):
                x = lax.conv_general_dilated(
                    x, w, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return x

        def pal_chain(x, w):
            for _ in range(K):
                x = conv_p(x, w)
            return x

        timed(f"conv3x3 lax x{K} {tag} @{HH}^2/{CC}", lax_chain, x0, w)
        timed(f"conv3x3 pallas x{K} {tag} @{HH}^2/{CC}", pal_chain, x0, w)

        try:
            a = jax.jit(lambda x, w: lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")))(x0, w)
            b = jax.jit(conv_p)(x0, w)
            d = float(jnp.max(jnp.abs(
                a.astype(jnp.float32) - b.astype(jnp.float32))))
            print(f"  {tag} conv pallas-vs-lax max abs diff: {d:.5f}",
                  flush=True)
        except Exception as e:
            print(f"  {tag} conv diff FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
