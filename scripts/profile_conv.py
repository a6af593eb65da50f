"""Conv efficiency scaling study for the AAD generator's hot shapes.

The generator's convs at 64-128 channels measure ~3-6x off both the
MXU and HBM roofs (scripts/profile_aei2.py). This script isolates WHY:
does cost scale with channels (lane underfill at C<128), with FLOPs,
or is it a fixed per-op floor? Also tries alternative lowerings
(matmul-reshape for 1x1, shifted-matmul for 3x3, f32 accumulation).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_conv.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ghost_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from ghost_tpu.nn.layers import Conv

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
            print(f"{name:44s} {dt * 1000:8.1f} ms  (compile {c:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{name:44s} FAILED {str(e)[:200]}", flush=True)

    cd = jnp.bfloat16

    def mk(shape):
        return jnp.asarray(
            rng.normal(0, 1, shape).astype(np.float32)).astype(cd)

    def conv_bench(cin, cout, res, k, name=None):
        x = mk((B, res, res, cin))
        conv = Conv(cout, k, 1, padding=k // 2, use_bias=False, dtype=cd)
        v = conv.init(jax.random.key(0), x[:1])
        timed(name or f"conv{k}x{k} {cin}->{cout} @{res}^2",
              jax.jit(conv.apply), v, x)

    # --- channel scaling at fixed resolution (256^2) ------------------
    conv_bench(64, 64, 256, 3)
    conv_bench(128, 128, 256, 3)   # 4x FLOPs of the above
    conv_bench(64, 128, 256, 3)
    conv_bench(32, 32, 256, 3)

    # --- resolution scaling at fixed channels -------------------------
    conv_bench(128, 128, 128, 3)   # blk7 shape
    conv_bench(256, 256, 64, 3)    # blk6 shape
    conv_bench(512, 512, 32, 3)    # blk5 shape

    # --- alternative lowerings for the 64-ch 3x3 ----------------------
    x64 = mk((B, 256, 256, 64))
    w = mk((3, 3, 64, 64))

    def conv9shift(x, w):
        # 3x3 conv as 9 shifted 1x1 matmuls accumulated in f32
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros(x.shape[:3] + (w.shape[-1],), jnp.float32)
        H = x.shape[1]
        W = x.shape[2]
        for dy in range(3):
            for dx in range(3):
                acc = acc + jnp.einsum(
                    "bhwc,cd->bhwd",
                    xp[:, dy:dy + H, dx:dx + W, :], w[dy, dx],
                    preferred_element_type=jnp.float32)
        return acc.astype(x.dtype)

    timed("conv3x3 64->64 as 9-shift einsum", jax.jit(conv9shift), x64, w)

    import functools

    def conv_f32acc(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)

    timed("conv3x3 64->64 f32-accum", jax.jit(conv_f32acc), x64, w)

    # batch-merged: fold B into H (single conv call, taller image)
    def conv_merged(x, w):
        xm = x.reshape(1, B * 256, 256, 64)
        y = jax.lax.conv_general_dilated(
            xm, w, (1, 1), ((0, 0), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y

    timed("conv3x3 64->64 valid-H batchmerged", jax.jit(conv_merged), x64, w)

    # --- 1x1 conv vs plain matmul -------------------------------------
    w1 = mk((64, 128))

    def matmul1x1(x, w):
        return jnp.einsum("bhwc,cd->bhwd", x, w)

    timed("conv1x1 64->128 as einsum", jax.jit(matmul1x1), x64, w1)

    x128s = mk((B, 128, 128, 64))
    w1b = mk((64, 128))
    timed("conv1x1 64->128 @128^2 as einsum",
          jax.jit(matmul1x1), x128s, w1b)

    # --- bilinear 2x resize lowerings ---------------------------------
    from ghost_tpu.nn.layers import _linear_matrix, resize_like_torch

    xr = mk((B, 128, 128, 64))
    timed("resize 2x 128->256 @64ch (current)",
          jax.jit(lambda x: resize_like_torch(
              x, 2.0, method="bilinear", align_corners=True)), xr)

    mh = jnp.asarray(_linear_matrix(128, 256, True)).astype(cd)

    def resize_direct(x):
        y = jnp.einsum("oh,bhwc->bowc", mh, x)
        return jnp.einsum("ow,bhwc->bhoc", mh, y)

    timed("resize 2x direct einsum (no moveaxis)",
          jax.jit(resize_direct), xr)

    def resize_direct_wfirst(x):
        y = jnp.einsum("ow,bhwc->bhoc", mh, x)
        return jnp.einsum("oh,bhwc->bowc", mh, y)

    timed("resize 2x direct einsum W-first", jax.jit(resize_direct_wfirst), xr)

    def resize_onehot_conv(x):
        # H axis via dot_general batching over B with W*C flattened
        b, h, w, c = x.shape
        y = jax.lax.dot_general(
            mh, x.reshape(b, h, w * c),
            dimension_numbers=(((1,), (1,)), ((), ())))  # (256, B, W*C)
        y = y.transpose(1, 0, 2).reshape(b, 256, w, c)
        z = jax.lax.dot_general(
            mh, y, dimension_numbers=(((1,), (2,)), ((), ())))
        return z.transpose(1, 2, 0, 3)

    timed("resize 2x dot_general explicit", jax.jit(resize_onehot_conv), xr)

    xr128 = mk((B, 128, 128, 128))
    timed("resize 2x 128->256 @128ch (current)",
          jax.jit(lambda x: resize_like_torch(
              x, 2.0, method="bilinear", align_corners=True)), xr128)
    timed("resize 2x @128ch direct einsum", jax.jit(resize_direct), xr128)

    # --- channel-padded variant: zero-pad 64->128 in/out --------------
    def conv_padded(x, w):
        xp = jnp.concatenate([x, jnp.zeros_like(x)], axis=-1)
        wp = jnp.zeros((3, 3, 128, 128), x.dtype)
        wp = wp.at[:, :, :64, :64].set(w)
        y = jax.lax.conv_general_dilated(
            xp, wp, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y[..., :64]

    timed("conv3x3 64->64 zero-padded to 128ch",
          jax.jit(conv_padded), x64, w)


if __name__ == "__main__":
    main()
