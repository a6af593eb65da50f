"""TPU throughput of the native enhancer pass (pipeline/enhance.py):
GFPGAN-512 face restore (+ optional RRDB x4 background) over 1080p
frames — the reference's `upsample()` post-pass, which it runs
per-frame through two torch packages on GPU (utils/training/
upsampler.py:92-106).

Chained iterations + data-dependent checksum (relay methodology).
Random weights; throughput is weight-independent.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_enhance.py
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
    from ghost_tpu.models.scrfd import SCRFD
    from ghost_tpu.models.sr.gfpgan import GFPGANClean
    from ghost_tpu.models.sr.rrdb import RRDBNet
    from ghost_tpu.pipeline.enhance import FaceEnhancer

    B = 8
    rng = np.random.default_rng(0)
    key = jax.random.key(0)

    det = SCRFD(policy=DEFAULT_POLICY)
    det_vars = det.init(key, jnp.zeros((1, 640, 640, 3)))
    gfp = GFPGANClean(policy=DEFAULT_POLICY)
    gfp_vars = gfp.init(key, jnp.zeros((1, 512, 512, 3)))
    bg = RRDBNet(num_block=23, policy=DEFAULT_POLICY)
    bg_vars = bg.init(key, jnp.zeros((1, 64, 64, 3)))
    from ghost_tpu.models.sr.srvgg import SRVGGNetCompact
    fast = SRVGGNetCompact(policy=DEFAULT_POLICY)
    fast_vars = fast.init(key, jnp.zeros((1, 64, 64, 3)))

    frames = rng.integers(0, 255, (B, 1080, 1920, 3), dtype=np.uint8)

    checksum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

    # face: GFPGAN-only; full-srvgg: + realesr-general-x4v3 background
    # (~2.4 MFLOP/px, the serving-relevant full-frame mode); full-rrdb:
    # + RealESRGAN_x4plus (~33 MFLOP/px — roofline ~1.4 fps/chip at
    # 1080p; the reference's GPU path has the same wall).
    #
    # Lane-skip bounds: scores are sigmoids (padded -1), so
    # det_thresh=1e-6 makes ALL max_faces lanes present (worst case:
    # every lane's crop+GFPGAN+paste runs) and det_thresh=2.0 makes
    # none present (floor: detector [+bg] only, all lanes cond-skipped).
    # Typical 1-face serving ~= floor + (worst - floor)/max_faces.
    cases = [("face", None, 1e-6), ("face-0lane", None, 2.0),
             ("full-srvgg", (fast, fast_vars), 1e-6),
             ("full-srvgg-0lane", (fast, fast_vars), 2.0),
             ("full-rrdb", (bg, bg_vars), 1e-6)]
    for mode, bg_pair, thresh in cases:
        enh = FaceEnhancer((det, det_vars), (gfp, gfp_vars), bg=bg_pair,
                           max_faces=4, det_thresh=thresh)
        cur = jnp.asarray(frames)
        t0 = time.time()
        out = enh._enhance_j(enh._vars, cur, use_bg=bg_pair is not None)
        float(checksum(out))
        print(f"{mode}: first dispatch {time.time() - t0:.1f}s", flush=True)
        iters = 2 if mode == "full-rrdb" else 4
        t0 = time.time()
        for _ in range(iters):
            cur = enh._enhance_j(enh._vars, cur, use_bg=bg_pair is not None)
        _ = float(checksum(cur))
        dt = time.time() - t0
        print(f"enhance[{mode}] chunk {B}: {iters * B / dt:.1f} fps/chip",
              flush=True)


if __name__ == "__main__":
    main()
