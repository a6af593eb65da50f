"""Ablate fused-program chunk/group sizes on the real TPU.

Mirrors bench.py's methodology exactly (chained fused dispatches,
checksum-forced execution) for several (chunk, fused_group) points, so
the winning configuration's compiled program lands in the shared
compile cache and bench.py / the driver reuse it.

Run ONE at a time over the relay (CLAUDE.md): this script runs its
points sequentially in a single process.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def bench_point(chunk: int, group: int, iters: int = 4):
    import jax
    import jax.numpy as jnp

    from ghost_tpu.core.precision import DEFAULT_POLICY
    from ghost_tpu.pipeline.swap import SwapConfig, build_random_pipeline

    cfg = SwapConfig(chunk_size=chunk, max_faces=4, crop_size=224,
                     match_faces=2, fused_group=group)
    pipe = build_random_pipeline(
        cfg, policy=DEFAULT_POLICY, arcface_layers=(3, 13, 30, 3)
    )
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (chunk, 1080, 1920, 3), dtype=np.uint8)
    sources = rng.integers(0, 255, (1, 224, 224, 3), dtype=np.uint8)
    src_emb = pipe.embed_sources(np.asarray(sources))
    tgt_emb = pipe.embed_targets(np.asarray(sources))
    frames_d = jnp.asarray(frames)
    mask_params = jnp.asarray([[5.0, 5.0, 5.0, 2.0]], jnp.float32)

    t0 = time.time()
    out = pipe._detect_swap(frames_d, tgt_emb, src_emb, mask_params)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    checksum_fn = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    _ = float(checksum_fn(frames_d))

    cur = frames_d
    t0 = time.time()
    for _ in range(iters):
        cur = pipe._detect_swap(cur, tgt_emb, src_emb, mask_params)
    _ = float(checksum_fn(cur))
    dt = time.time() - t0
    fps = iters * chunk / dt
    print(json.dumps({"chunk": chunk, "group": group,
                      "fps": round(fps, 2),
                      "compile_s": round(compile_s, 1)}), flush=True)
    return fps


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ghost_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    points = [(128, 64), (256, 64)]
    if len(sys.argv) > 1:
        points = [tuple(map(int, p.split(":"))) for p in sys.argv[1:]]
    for chunk, group in points:
        bench_point(chunk, group)


if __name__ == "__main__":
    main()
