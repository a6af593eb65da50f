"""Round-5 config-4 decomposition + lane-skip measurements (VERDICT r4
items 2 and 3).

One compiled fused program per (targets, SR seat, chunk/group) config;
lane occupancy rides as the `present_override` INPUT (pipeline/swap.py
_detect_swap), so all-present / 1-of-2-present / 0-present are three
executions of the SAME program — no per-occupancy recompiles, and the
all-present row measures exactly the work the similarity_th=-2.0
settlement methodology measured in r04 (BENCH_EXTRA_r04).

Rows:
  * t2_c128_student_{all,one,zero}: the distilled SRVGG(32f/16c) seat
    (the PRODUCT SRVGGStudentSeat — ADVICE r4: no inline bench replica)
    at chunk 128/group 32 — the config the VERDICT asked to try for
    >=120.
  * t2_c128_nosr_{all,one,zero}: the same program without SR — the
    non-SR T=2 base the 108.5-fps floor left undecomposed.
  * t1_c128_student_all: single-identity + SR serving case.
  * t2_c32_g16_student_all: continuity row vs r04's 97.3 fps.

Methodology: chained iterations (chunk i's blended output feeds chunk
i+1), execution forced by a data-dependent checksum scalar
(block_until_ready unreliable over this relay), compile cache at
/tmp/ghost_tpu_jax_cache. Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_extra_r05.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

RESULTS_PATH = "/root/repo/BENCH_EXTRA_r05.json"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def build_models():
    import jax

    from ghost_tpu.core.precision import DEFAULT_POLICY
    from ghost_tpu.pipeline.swap import SwapConfig, build_random_pipeline

    cfg = SwapConfig(chunk_size=32, max_faces=4, crop_size=224,
                     match_faces=2)
    base = build_random_pipeline(cfg, policy=DEFAULT_POLICY,
                                 arcface_layers=(3, 13, 30, 3))
    return [(base.det_mod, base.det_vars), (base.arc_mod, base.arc_vars),
            (base.gen_mod, base.gen_vars), (base.lmk_mod, base.lmk_vars)]


def build_student_seat():
    import jax
    import jax.numpy as jnp

    from ghost_tpu.core.precision import DEFAULT_POLICY
    from ghost_tpu.models.sr.srvgg import SRVGGNetCompact, SRVGGStudentSeat

    stu = SRVGGNetCompact(num_feat=32, num_conv=16, upscale=2,
                          policy=DEFAULT_POLICY)
    sv = stu.init(jax.random.key(7), jnp.zeros((1, 128, 128, 3)))
    return (SRVGGStudentSeat(stu), sv)


def measure(models, sr, t, chunk, group, occupancies, iters=4):
    """Compile ONE fused program for this config and time each
    occupancy pattern through it. Returns {name: fps}."""
    import jax
    import jax.numpy as jnp

    from ghost_tpu.pipeline.swap import SwapConfig, SwapPipeline

    cfg = SwapConfig(chunk_size=chunk, max_faces=4, crop_size=224,
                     match_faces=2, fused_group=group,
                     use_sr=sr is not None)
    pipe = SwapPipeline(*models, sr=sr, config=cfg)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(
        0, 255, (chunk, 1080, 1920, 3), dtype=np.uint8))
    src = jnp.asarray(rng.normal(0, 1, (t, 512)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(0, 1, (t, 512)).astype(np.float32))
    tgt = tgt / jnp.linalg.norm(tgt, axis=-1, keepdims=True)
    mp = jnp.tile(jnp.asarray([[5.0, 5.0, 5.0, 2.0]], jnp.float32), (t, 1))

    checksum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    _ = float(checksum(frames))

    out = {}
    first = True
    for name, lanes in occupancies.items():
        pov = jnp.asarray(
            np.tile(np.asarray(lanes, bool)[None], (chunk, 1)))
        t0 = time.time()
        res = pipe._detect_swap(frames, tgt, src, mp, True, pov)
        _ = float(checksum(res))
        if first:
            log(f"T={t} sr={'y' if sr else 'n'} c{chunk}/g{group}: "
                f"first dispatch {time.time() - t0:.1f}s")
            first = False
        cur = frames
        t0 = time.time()
        for _ in range(iters):
            cur = pipe._detect_swap(cur, tgt, src, mp, True, pov)
        _ = float(checksum(cur))
        fps = iters * chunk / (time.time() - t0)
        out[name] = round(fps, 1)
        log(f"  {name}: {out[name]} fps")
    return out


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ghost_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    results = {}

    def save():
        with open(RESULTS_PATH, "w") as f:
            json.dump(results, f, indent=1)
        log(f"saved {RESULTS_PATH}")

    log("building models (eager inits over the relay — minutes)")
    models = build_models()
    seat = build_student_seat()

    plan = [
        # the VERDICT-asked config: student seat, T=2, chunk 128/gr 32
        ("t2_c128_student", seat, 2, 128, 32,
         {"all": (1, 1), "one": (1, 0), "zero": (0, 0)}),
        # decomposition: the same program without SR
        ("t2_c128_nosr", None, 2, 128, 32,
         {"all": (1, 1), "one": (1, 0), "zero": (0, 0)}),
        # single-identity + SR (the common serving case for --use_sr)
        ("t1_c128_student", seat, 1, 128, 32, {"all": (1,), "zero": (0,)}),
        # continuity vs r04's 97.3 (chunk 32/group 16 settlement config)
        ("t2_c32_student", seat, 2, 32, 16, {"all": (1, 1)}),
    ]
    for name, sr, t, chunk, group, occ in plan:
        try:
            results[name] = measure(models, sr, t, chunk, group, occ)
        except Exception as e:  # OOM/compile failure: keep the rest
            log(f"{name} FAILED: {e!r}")
            results[name] = {"error": repr(e)[:300]}
        save()

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
