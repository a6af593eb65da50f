"""Per-stage TPU timing for the swap pipeline at the bench config.

Sub-ops first (small programs), full stages last; every section is
fault-isolated so one OOM doesn't kill the run. Timing uses the
chained-checksum methodology from bench.py (block_until_ready is
unreliable over the relay).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_tpu.py
(real TPU; one job at a time, background, no timeout — CLAUDE.md rules)
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ghost_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from ghost_tpu.core.precision import DEFAULT_POLICY
    from ghost_tpu.pipeline.swap import SwapConfig, build_random_pipeline

    chunk = 64
    cfg = SwapConfig(chunk_size=chunk, max_faces=4, crop_size=224,
                     match_faces=2)
    pipe = build_random_pipeline(
        cfg, policy=DEFAULT_POLICY, arcface_layers=(3, 13, 30, 3)
    )

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 255, (chunk, 1080, 1920, 3), dtype=np.uint8))
    kps = jnp.asarray(
        rng.uniform(400, 900, (chunk, 1, 5, 2)).astype(np.float32))
    present = jnp.ones((chunk, 1), bool)
    sources = rng.integers(0, 255, (1, 224, 224, 3), dtype=np.uint8)
    src_emb = pipe.embed_sources(np.asarray(sources))
    tgt_emb = pipe.embed_targets(np.asarray(sources))

    checksum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

    def force(x):
        leaf = jax.tree.leaves(x)[0]
        return float(checksum(leaf))

    def timed(name, fn, *args, reps=3):
        try:
            t0 = time.time()
            out = fn(*args)
            force(out)
            compile_s = time.time() - t0
            t0 = time.time()
            for _ in range(reps):
                out = fn(*args)
                force(out)
            dt = (time.time() - t0) / reps
            print(f"{name:34s} {dt * 1000:9.1f} ms/call"
                  f"  (compile+1st {compile_s:.1f}s)", flush=True)
            return dt
        except Exception as e:
            print(f"{name:34s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            return float("nan")

    print(f"devices: {jax.devices()}", flush=True)
    tiny = jnp.zeros((128,), jnp.float32)
    timed("dispatch_floor(tiny add)", jax.jit(lambda x: x + 1.0), tiny)

    # ---- isolated sub-ops (small programs) ----
    from ghost_tpu.models.scrfd import preprocess_frames
    from ghost_tpu.nn.layers import resize
    from ghost_tpu.ops.umeyama import estimate_norm
    from ghost_tpu.ops.warp import (warp_affine_similarity,
                                    warp_and_blend_similarity)

    pre = jax.jit(lambda f: preprocess_frames(f, cfg.det_size)[0])
    timed("preprocess(letterbox 640)", pre, frames)
    canvas = pre(frames)

    timed("scrfd fwd (64x640)",
          jax.jit(lambda v, c: pipe.det_mod.apply(v, c)),
          pipe.det_vars, canvas)

    crops112 = jnp.asarray(
        rng.uniform(-1, 1, (2 * chunk, 112, 112, 3)).astype(np.float32))
    timed("arcface r100 fwd (128x112)",
          jax.jit(lambda v, x: pipe.arc_mod.apply(v, x)),
          pipe.arc_vars, crops112)

    gen_in = jnp.asarray(
        rng.uniform(-1, 1, (chunk, 256, 256, 3)).astype(np.float32))
    z = jnp.asarray(rng.normal(0, 1, (chunk, 512)).astype(np.float32))
    timed("aei unet fwd (64x256)",
          jax.jit(lambda v, x, zz: pipe.gen_mod.apply(v, x, zz)[0]),
          pipe.gen_vars, gen_in, z)

    lmk_in = jnp.asarray(
        rng.uniform(0, 255, (chunk, 192, 192, 3)).astype(np.float32))
    timed("landmark fwd (64x192)",
          jax.jit(lambda v, x: pipe.lmk_mod.apply(v, x)),
          pipe.lmk_vars, lmk_in)

    m = estimate_norm(kps.reshape(chunk, 5, 2), 224)
    timed("stageB crops (nearest sp3)",
          jax.jit(lambda f, mm: warp_affine_similarity(
              f, mm[:, None], 224, subpix=3, interp="nearest")),
          frames, m)

    timed("stageA small+crops112 x2 (half)",
          jax.jit(lambda f, mm: warp_affine_similarity(
              resize(f.astype(jnp.bfloat16), (540, 960), method="area"),
              jnp.concatenate([mm[:, None], mm[:, None]], 1) * 0.5, 112)),
          frames, m)

    swap = jnp.asarray(
        rng.uniform(0, 255, (chunk, 224, 224, 3)).astype(np.float32))
    mask = jnp.asarray(
        rng.uniform(0, 1, (chunk, 224, 224, 1)).astype(np.float32))
    timed("blend (nearest rs2)",
          jax.jit(lambda f, s, mk, mm: warp_and_blend_similarity(
              f, s, mk, mm, present=None, rot_subpix=2)),
          frames, swap, mask, m)

    timed("resize 224->256 (64)",
          jax.jit(lambda x: resize(x, (256, 256), method="bilinear")), swap)

    # ---- full stages (the bench programs) ----
    def stage_a(f):
        return pipe._detect_match(f, tgt_emb)

    def stage_b(f, k):
        return pipe._swap_blend(f, k, present, src_emb)

    timed("stage A (detect_match, 64)", stage_a, frames, reps=3)
    try:
        a = stage_a(frames)
        timed("stage B (swap_blend, 64)", stage_b, frames, a[0], reps=3)
    except Exception as e:
        print(f"stage B setup failed: {e}", flush=True)

    # chained fps (bench methodology)
    try:
        cur = frames
        iters = 4
        t0 = time.time()
        for _ in range(iters):
            best_kps, _s, _sc, _rk = pipe._detect_match(cur, tgt_emb)
            cur = pipe._swap_blend(cur, best_kps, present, src_emb)
        _ = float(checksum(cur))
        dt = time.time() - t0
        print(f"bench chain: {iters * chunk / dt:.2f} fps "
              f"({dt / iters * 1000:.0f} ms/chunk{chunk})", flush=True)
    except Exception as e:
        print(f"bench chain failed: {str(e)[:300]}", flush=True)

    # multi-identity throughput: T=2 targets (the reference's
    # sequential per-identity paste-back loop, video_processing.py:240)
    try:
        cfg2 = SwapConfig(chunk_size=chunk, max_faces=4, crop_size=224,
                          match_faces=3)
        pipe2 = build_random_pipeline(
            cfg2, policy=DEFAULT_POLICY, arcface_layers=(3, 13, 30, 3))
        src2 = pipe2.embed_sources(
            rng.integers(0, 255, (2, 224, 224, 3), dtype=np.uint8))
        tgt2 = pipe2.embed_targets(
            rng.integers(0, 255, (2, 224, 224, 3), dtype=np.uint8))
        kps2 = jnp.asarray(
            rng.uniform(400, 900, (chunk, 2, 5, 2)).astype(np.float32))
        present2 = jnp.ones((chunk, 2), bool)
        cur = frames
        t0 = time.time()
        a = pipe2._detect_match(cur, tgt2)
        force(a)
        b = pipe2._swap_blend(cur, kps2, present2, src2)
        force(b)
        print(f"T=2 compile+first: {time.time() - t0:.1f}s", flush=True)
        iters = 4
        t0 = time.time()
        for _ in range(iters):
            bk, _s, _sc, _rk = pipe2._detect_match(cur, tgt2)
            cur = pipe2._swap_blend(cur, bk, present2, src2)
        _ = float(checksum(cur))
        dt = time.time() - t0
        print(f"T=2 chain: {iters * chunk / dt:.2f} fps "
              f"({dt / iters * 1000:.0f} ms/chunk{chunk})", flush=True)
    except Exception as e:
        print(f"T=2 chain failed: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
