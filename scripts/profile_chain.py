"""Dispatch-free op timing: chain K dependent applications in ONE jit.

Isolated single-op programs are dominated by the ~26 ms relay dispatch
floor and XLA picks different lowerings for tiny programs, so per-op
"net" numbers mislead (measured: conv1x1-as-einsum looks 3x faster
isolated but is neutral inside a block program). Here each candidate
runs K chained times inside one program; cost = (t_K - t_0) / K with a
shared checksum hop.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_chain.py
"""

from __future__ import annotations

import functools
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

    rng = np.random.default_rng(0)
    cd = jnp.bfloat16

    def mk(shape, dtype=None):
        a = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
        return a.astype(cd) if dtype is None else a.astype(dtype)

    def timed(name, fn, *args, reps=3):
        # operands MUST travel as jit arguments: closure-captured
        # tensors embed as HLO constants and 413 the compile relay
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
            per = (dt * 1000 - 27.0) / K  # subtract shared dispatch once
            print(f"{name:46s} {dt * 1000:8.1f} ms total  ~{per:6.2f} ms/op"
                  f"  (compile {c:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name:46s} FAILED {str(e)[:200]}", flush=True)

    # ---- candidate AAD units (weights as explicit args, chained) -----
    C = 64
    CA = 64
    H = W = 256
    h0 = mk((B, H, W, C))
    za = mk((B, H, W, CA))
    zid = mk((B, 512))
    w_attr = mk((CA, 2 * C))
    w_id = mk((512, 2 * C))
    w_mask = mk((C, 1))
    w_conv = mk((3, 3, C, C))

    def instance_stats(x):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
        xc = x - mean.astype(x.dtype)
        var = jnp.mean(jnp.square(xc), axis=(1, 2), keepdims=True,
                       dtype=jnp.float32)
        return mean, lax.rsqrt(var + 1e-5)

    def aad_current(h, za, zid, w_attr, w_id, w_mask, w_conv):
        mean, rstd = instance_stats(h)
        hn = (h - mean.astype(h.dtype)) * rstd.astype(h.dtype)
        ab_attr = jnp.einsum("bhwc,cd->bhwd", za, w_attr)
        ga, bb = jnp.split(ab_attr, 2, axis=-1)
        ab_id = (zid.astype(cd) @ w_id)[:, None, None, :]
        gi, bi = jnp.split(ab_id, 2, axis=-1)
        m = jax.nn.sigmoid(jnp.einsum("bhwc,co->bhwo", hn, w_mask))
        out = (1.0 - m) * (ga * hn + bb) + m * (gi * hn + bi)
        out = jax.nn.relu(out)
        return lax.conv_general_dilated(
            out, w_conv, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def chain_aad(f):
        def run(h, za, zid, w_attr, w_id, w_mask, w_conv):
            for _ in range(K):
                h = f(h, za, zid, w_attr, w_id, w_mask, w_conv)
            return h
        return run

    aad_args = (h0, za, zid, w_attr, w_id, w_mask, w_conv)
    timed(f"AAD unit current x{K} @256^2/64", chain_aad(aad_current), *aad_args)

    # Pallas fused modulate: one pass computing xn, mask, blend
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TH = 32

    def _mod_kernel(h_ref, ga_ref, bb_ref, st_ref, id_ref, mw_ref, o_ref):
        x = h_ref[0]                       # (TH, W, C) bf16
        mu = st_ref[0, 0][None, None, :]   # (C,) f32
        rs = st_ref[0, 1][None, None, :]
        xn = (x - mu.astype(x.dtype)) * rs.astype(x.dtype)
        xf = xn.astype(jnp.float32)
        m = jax.nn.sigmoid(
            jax.lax.dot_general(
                xf.reshape(TH * W, C), mw_ref[:].astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(TH, W, 1))
        gi = id_ref[0, 0][None, None, :].astype(jnp.float32)
        bi = id_ref[0, 1][None, None, :].astype(jnp.float32)
        ga = ga_ref[0].astype(jnp.float32)
        bb = bb_ref[0].astype(jnp.float32)
        out = (1.0 - m) * (ga * xf + bb) + m * (gi * xf + bi)
        o_ref[0] = out.astype(o_ref.dtype)

    def aad_pallas(h, za, zid, w_attr, w_id, w_mask, w_conv):
        mean, rstd = instance_stats(h)
        stats = jnp.stack([mean[:, 0, 0, :], rstd[:, 0, 0, :]], axis=1)
        ab_attr = jnp.einsum("bhwc,cd->bhwd", za, w_attr)
        ga, bb = jnp.split(ab_attr, 2, axis=-1)
        ab_id = (zid.astype(cd) @ w_id).astype(jnp.float32)
        idgb = jnp.stack([ab_id[:, :C], ab_id[:, C:]], axis=1)
        out = pl.pallas_call(
            _mod_kernel,
            grid=(B, H // TH),
            in_specs=[
                pl.BlockSpec((1, TH, W, C), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TH, W, C), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TH, W, C), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, C), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, C), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, 1), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TH, W, C), lambda b, i: (b, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W, C), h.dtype),
        )(h, ga, bb, stats, idgb, w_mask)
        out = jax.nn.relu(out)
        return lax.conv_general_dilated(
            out, w_conv, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    timed(f"AAD unit pallas-mod x{K} @256^2/64",
          chain_aad(aad_pallas), *aad_args)

    # ---- conv variants chained ---------------------------------------
    def conv_bf16(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def conv_f32(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)

    def chain_w(f):
        def run(x, w):
            for _ in range(K):
                x = f(x, w)
            return x
        return run

    timed(f"conv3x3 64->64 bf16 x{K}", chain_w(conv_bf16), h0, w_conv)
    timed(f"conv3x3 64->64 f32acc x{K}", chain_w(conv_f32), h0, w_conv)

    w1 = mk((C, 2 * C))

    def conv1_as_conv(x, w):
        return lax.conv_general_dilated(
            x, w.reshape(1, 1, C, 2 * C), (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., :C]

    def conv1_as_einsum(x, w):
        return jnp.einsum("bhwc,cd->bhwd", x, w)[..., :C]

    timed(f"conv1x1 64->128 conv-lowered x{K}",
          chain_w(conv1_as_conv), h0, w1)
    timed(f"conv1x1 64->128 einsum x{K}",
          chain_w(conv1_as_einsum), h0, w1)

    # ---- Pallas 3x3 conv (im2col-along-W, 3-block row halo) ----------
    TC = 32

    def _conv_kernel(xp_ref, xm_ref, xn_ref, k_ref, o_ref):
        i = pl.program_id(1)
        n_i = pl.num_programs(1)
        Wp = xm_ref.shape[2]
        top = jnp.where(i > 0, xp_ref[0, TC - 1],
                        jnp.zeros_like(xp_ref[0, 0]))
        bot = jnp.where(i < n_i - 1, xn_ref[0, 0],
                        jnp.zeros_like(xn_ref[0, 0]))
        rows = jnp.concatenate([top[None], xm_ref[0], bot[None]], axis=0)
        kk = k_ref[:]
        co = kk.shape[-1]
        cc = kk.shape[-2]
        acc = jnp.zeros((TC * (Wp - 2), co), jnp.float32)
        for dy in range(3):
            band = rows[dy:dy + TC]
            cols = jnp.concatenate(
                [band[:, 0:Wp - 2], band[:, 1:Wp - 1], band[:, 2:Wp]],
                axis=-1)
            acc = acc + jax.lax.dot_general(
                cols.reshape(TC * (Wp - 2), 3 * cc),
                kk[dy].reshape(3 * cc, co),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[0] = acc.reshape(TC, Wp - 2, co).astype(o_ref.dtype)

    def conv_pallas(x, w):
        b, hh, ww, cc = x.shape
        co = w.shape[-1]
        xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
        nb = hh // TC
        spec = lambda im: pl.BlockSpec((1, TC, ww + 2, cc), im,
                                       memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _conv_kernel,
            grid=(b, nb),
            in_specs=[
                spec(lambda bb_, i: (bb_, jnp.maximum(i - 1, 0), 0, 0)),
                spec(lambda bb_, i: (bb_, i, 0, 0)),
                spec(lambda bb_, i: (bb_, jnp.minimum(i + 1, nb - 1), 0, 0)),
                pl.BlockSpec((3, 3, cc, co), lambda bb_, i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TC, ww, co),
                                   lambda bb_, i: (bb_, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, hh, ww, co), x.dtype),
        )(xp, xp, xp, w)

    timed(f"conv3x3 64->64 pallas x{K}", chain_w(conv_pallas), h0, w_conv)

    h128 = mk((B, 128, 128, 128))
    w128 = mk((3, 3, 128, 128))
    timed(f"conv3x3 128->128 @128^2 bf16 x{K}",
          chain_w(conv_bf16), h128, w128)
    timed(f"conv3x3 128->128 @128^2 pallas x{K}",
          chain_w(conv_pallas), h128, w128)

    try:
        ca = jax.jit(chain_w(conv_bf16))(h0, w_conv)
        cb = jax.jit(chain_w(conv_pallas))(h0, w_conv)
        dc = float(jnp.max(jnp.abs(
            ca.astype(jnp.float32) - cb.astype(jnp.float32))))
        print(f"conv pallas-vs-lax max abs diff: {dc:.5f}", flush=True)
    except Exception as e:
        print(f"conv diff check FAILED {str(e)[:200]}", flush=True)

    # correctness of the pallas candidate vs current (one application)
    try:
        a = jax.jit(aad_current)(*aad_args)
        b = jax.jit(aad_pallas)(*aad_args)
        d = float(jnp.max(jnp.abs(
            a.astype(jnp.float32) - b.astype(jnp.float32))))
        print(f"pallas-vs-current max abs diff: {d:.5f}", flush=True)
    except Exception as e:
        print(f"diff check FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
