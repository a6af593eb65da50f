"""Headline benchmark: swapped 1080p video frames/sec/chip.

Runs the full two-stage swap pipeline (detect -> align -> embed ->
match -> swap -> landmark -> mask -> paste-back) on synthetic 1080p
frames with full-size models (SCRFD detector, iresnet100 ArcFace,
AEI-Net unet/2-blocks, 106-pt landmarker) in bf16 on the default
backend (the real TPU chip under the driver). Weights are random —
throughput is weight-independent.

Baseline: the reference publishes no numbers (BASELINE.md); the
BASELINE.json north star is >=120 fps/chip on v5e, so
vs_baseline = fps / 120.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    # persistent compile cache: tunnel compiles of the two pipeline
    # stages are expensive; cache them across bench invocations
    jax.config.update("jax_compilation_cache_dir", "/tmp/ghost_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from ghost_tpu.core.precision import DEFAULT_POLICY
    from ghost_tpu.pipeline.swap import SwapConfig, build_random_pipeline

    # chunk 64 fits HBM now that stage B keeps frames uint8 and every
    # full-frame intermediate is bf16; match_faces=2 embeds only the two
    # top-scored face lanes (T=1 target) instead of all 4
    chunk = 64
    cfg = SwapConfig(chunk_size=chunk, max_faces=4, crop_size=224,
                     match_faces=2)
    pipe = build_random_pipeline(
        cfg, policy=DEFAULT_POLICY, arcface_layers=(3, 13, 30, 3)
    )

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (chunk, 1080, 1920, 3), dtype=np.uint8)
    sources = rng.integers(0, 255, (1, 224, 224, 3), dtype=np.uint8)
    src_emb = pipe.embed_sources(np.asarray(sources))
    tgt_emb = pipe.embed_targets(np.asarray(sources))

    import jax.numpy as jnp

    frames_d = jnp.asarray(frames)
    kps = jnp.asarray(
        rng.uniform(400, 900, (chunk, 1, 5, 2)).astype(np.float32)
    )
    present = jnp.ones((chunk, 1), bool)

    # steady-state production path: per-shot mask params ride as a
    # traced array (the probe that selects them is a one-time cost per
    # video, amortized away; the per-chunk cost — second landmark pass
    # + dynamic mask — is what this measures)
    mask_params = jnp.asarray([[5.0, 5.0, 5.0, 2.0]], jnp.float32)

    # stage A + stage B once for compile
    t0 = time.time()
    a = pipe._detect_match(frames_d, tgt_emb)
    jax.block_until_ready(a)
    b = pipe._swap_blend(frames_d, kps, present, src_emb, mask_params)
    jax.block_until_ready(b)
    compile_s = time.time() - t0

    # timed steady state: both stages per chunk. Iterations are chained
    # (stage A's kps feed stage B; stage B's frames feed the next stage
    # A) so every step depends on real prior results — nothing can be
    # constant-folded, cached, or overlapped away.
    import jax.numpy as jnp2

    checksum_fn = jax.jit(lambda x: jnp2.sum(x.astype(jnp2.float32)))
    _ = float(checksum_fn(frames_d))  # compile the checksum program

    iters = 6
    cur = frames_d
    t0 = time.time()
    for _ in range(iters):
        best_kps, _sim, _scores, _raw = pipe._detect_match(cur, tgt_emb)
        cur, _offs = pipe._swap_blend(cur, best_kps, present, src_emb,
                                      mask_params)
    # force execution via a data-dependent scalar: block_until_ready can
    # return before device execution finishes on remote-attached
    # platforms, and downloading full frames would time the transfer
    _ = float(checksum_fn(cur))
    dt = time.time() - t0
    fps = iters * chunk / dt

    print(json.dumps({
        "metric": "1080p_swap_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 120.0, 3),
    }))
    # extra context on stderr-ish second line is avoided: driver wants one line


if __name__ == "__main__":
    main()
