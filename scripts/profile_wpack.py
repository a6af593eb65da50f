"""W-packed conv3x3 A/B: can packing width phases into channels fix
blk8's half-empty 64-lane convs?

conv3x3 at 64ch@256^2 measured ~5.5 ms/chunk64 vs ~1.3 roofline (the
lanes are half-empty at C=64 < 128 and the 256^2 bf16 intermediates
run 4-8x off the HBM roof). Packing w-phases into channels
  X[b, i, jp, c + C*ph] = x[b, i, 2*jp + ph, c]
turns the same conv into an EXACT conv3x3 over (B, 256, 128, 128):
full 128 lanes, half the spatial columns, 2x the MACs (half the packed
kernel is structurally zero):

  Y_ph0[jp] = sum_u k[u,0] X1[jp-1] + k[u,1] X0[jp] + k[u,2] X1[jp]
  Y_ph1[jp] = sum_u k[u,0] X0[jp]   + k[u,1] X1[jp] + k[u,2] X0[jp+1]

Also times the both-axes packing (B,128,128,256; 4x MACs) and the
128ch@128^2 reference point. Chained-K methodology (profile_chain.py):
isolated ops mislead.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_wpack.py
"""

from __future__ import annotations

import time

import numpy as np

K = 8
B = 64
C = 64
H = W = 256


def pack_w(x):
    """(B,H,W,C) -> (B,H,W/2,2C); channel block ph holds w%2==ph
    (phase-major: packed channel = ph*C + c)."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c)


def unpack_w(y):
    b, h, wp, c2 = y.shape
    return y.reshape(b, h, wp * 2, c2 // 2)


def pack_kernel_w(k):
    """(3,3,C,Co) -> (3,3,2C,2Co) exact packed kernel (half zeros)."""
    kh, kw, c, co = k.shape
    kp = np.zeros((3, 3, 2 * c, 2 * co), k.dtype)
    for u in range(3):
        # output phase 0: taps at packed w-offsets -1 (block1, k[:,0])
        # and 0 (block0 k[:,1]; block1 k[:,2])
        kp[u, 0, c:, :co] = k[u, 0]
        kp[u, 1, :c, :co] = k[u, 1]
        kp[u, 1, c:, :co] = k[u, 2]
        # output phase 1: offset 0 (block0 k[:,0]; block1 k[:,1]) and
        # +1 (block0 k[:,2])
        kp[u, 1, :c, co:] = k[u, 0]
        kp[u, 1, c:, co:] = k[u, 1]
        kp[u, 2, :c, co:] = k[u, 2]
    return kp


def pack_hw(x):
    """(B,H,W,C) -> (B,H/2,W/2,4C): (hy,wx) phase-major blocks."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def pack_kernel_hw(k):
    """(3,3,C,Co) -> (3,3,4C,4Co) exact both-axes packed kernel."""
    kh, kw, c, co = k.shape
    kp = np.zeros((3, 3, 4 * c, 4 * co), k.dtype)
    # block index = ph_h*2 + ph_w; offsets per (out-phase, tap) as in
    # the 1-D derivation applied independently per axis
    for pho_h in range(2):
        for pho_w in range(2):
            ob = pho_h * 2 + pho_w
            for u in range(3):
                for v in range(3):
                    # original tap (u-1, v-1) from output pixel
                    # (2i+pho_h, 2j+pho_w) lands at input pixel
                    # (2i+pho_h+u-1, 2j+pho_w+v-1)
                    ih = pho_h + u - 1
                    iw = pho_w + v - 1
                    ph_h, dh = ih % 2, ih // 2  # packed row offset
                    ph_w, dw = iw % 2, iw // 2
                    ib = ph_h * 2 + ph_w
                    kp[dh + 1, dw + 1, ib * c:(ib + 1) * c,
                       ob * co:(ob + 1) * co] += k[u, v]
    return kp


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ghost_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    cd = jnp.bfloat16

    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # ---- exactness proof on small shapes (on-device scalar compare)
    xs = rng.normal(0, 1, (2, 8, 8, 4)).astype(np.float32)
    ks = rng.normal(0, 1, (3, 3, 4, 4)).astype(np.float32)

    kw_packed = pack_kernel_w(ks)
    khw_packed = pack_kernel_hw(ks)

    @jax.jit
    def check(xs, ks, kw, khw):
        ref = conv(xs, ks)
        yw = unpack_w(conv(pack_w(xs), kw))
        xhw = pack_hw(xs)
        yhw = conv(xhw, khw)
        # unpack hw: (B,H/2,W/2,4C) -> (B,H,W,C)
        b, hp, wp, c4 = xhw.shape
        c = c4 // 4
        yhw = yhw.reshape(b, hp, wp, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        yhw = yhw.reshape(b, hp * 2, wp * 2, c)
        return (jnp.abs(yw - ref).max(), jnp.abs(yhw - ref).max())

    dw, dhw = check(jnp.asarray(xs), jnp.asarray(ks),
                    jnp.asarray(kw_packed), jnp.asarray(khw_packed))
    print(f"exactness: w-pack {float(dw):.2e}  hw-pack {float(dhw):.2e}",
          flush=True)

    # ---- chained timing
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
            print(f"{name:46s} {dt * 1000:8.1f} ms total  ~{per:6.2f} ms/op"
                  f"  (compile {c:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name:46s} FAILED {str(e)[:200]}", flush=True)

    def mk(shape):
        return jnp.asarray(
            rng.normal(0, 0.05, shape).astype(np.float32)).astype(cd)

    def chain(x, w):
        def step(h, _):
            return conv(h, w), None
        out, _ = jax.lax.scan(step, x, None, length=K)
        return out

    x = mk((B, H, W, C))
    w = mk((3, 3, C, C))
    timed(f"baseline conv3x3 {C}@{H}^2", chain, x, w)

    xw = mk((B, H, W // 2, 2 * C))
    ww = mk((3, 3, 2 * C, 2 * C))
    timed(f"w-packed conv3x3 {2*C}@{H}x{W//2}", chain, xw, ww)

    xhw = mk((B, H // 2, W // 2, 4 * C))
    whw = mk((3, 3, 4 * C, 4 * C))
    timed(f"hw-packed conv3x3 {4*C}@{H//2}^2", chain, xhw, whw)

    xr = mk((B, 128, 128, 128))
    wr = mk((3, 3, 128, 128))
    timed("reference conv3x3 128@128^2", chain, xr, wr)


if __name__ == "__main__":
    main()
