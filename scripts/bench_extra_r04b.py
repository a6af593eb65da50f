"""BENCH_EXTRA_r04 part 2: the ALL-PRESENT config-4 measurements.

Part 1 (bench_extra_r04.py) measured the two config-4 pipes on random
noise frames — where the random-weights matcher's cosine similarities
(~N(0, 1/sqrt(512)), |sim| ~ 0.04) never clear the 0.15 threshold, so
the round-3 SR lane-skip took the empty branch on EVERY lane and both
numbers came out ~108 fps: that is the 0-present floor (lane-skip
provably working in serving), not the SR cost. Round 3's 64.1 fps ran
SR unconditionally (no lane-skip existed yet), so the honest
continuity number needs all lanes PRESENT.

This script forces presence through the production program by setting
similarity_th=-2.0 (cosine sim is in [-1,1], so `sim > -2` is
all-true by construction — same traced structure, one constant
changed) and re-measures both SR seats. Merges into
BENCH_EXTRA_r04.json and rewrites config4_summary.

TPU job — run in background, no timeout, one at a time:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_extra_r04b.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH_EXTRA_r04.json")


def _log(msg):
    print(msg, flush=True)


def _load():
    with open(OUT) as f:
        return json.load(f)


def _save(results):
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


def _mk_pipe_allpresent(sr_pair, t_ids=2, chunk=32, group=16):
    import jax

    from ghost_tpu.core.precision import DEFAULT_POLICY
    from ghost_tpu.pipeline.swap import SwapConfig, build_random_pipeline

    cfg = SwapConfig(chunk_size=chunk, max_faces=4, crop_size=224,
                     match_faces=t_ids, fused_group=group, use_sr=True,
                     similarity_th=-2.0)
    pipe = build_random_pipeline(cfg, policy=DEFAULT_POLICY,
                                 arcface_layers=(3, 13, 30, 3))
    pipe.sr = sr_pair
    pipe._vars["sr"] = sr_pair[1]
    pipe._swap_blend_j = jax.jit(pipe._swap_blend_impl,
                                 static_argnums=(6,))
    return pipe, cfg


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/ghost_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from bench_extra_r04 import _bench_pipe

    from ghost_tpu.core.precision import DEFAULT_POLICY
    from ghost_tpu.models.sr.generator import LIPSPADEGenerator
    from ghost_tpu.models.sr.srvgg import SRVGGNetCompact
    from ghost_tpu.nn.layers import resize

    results = _load()
    meas = results["measurements"]

    # re-label part 1's noise-frame numbers as what they are: the
    # 0-present lane-skip floor (both SR seats skipped on every lane)
    for key, seat in (("config4_multi_identity_sr_fps", "LIPSPADE"),
                      ("config4_distilled_seat_fps", "SRVGG student")):
        if key in meas and "0-present" not in str(meas[key].get("sr", "")):
            meas[key]["sr"] = (
                f"{seat} seat, 0-PRESENT FLOOR: random-weights matcher "
                "sim (~|0.04|) never clears similarity_th=0.15 on noise "
                "frames, so the r04 SR lane-skip cond took the empty "
                "branch on every lane — this measures the skip path "
                "(r03's 64.1 ran SR unconditionally; see the "
                "_allpresent rows for the honest SR-on continuity)")
    _save(results)

    # --- all-present: distilled student seat first (the number that
    # decides whether a quality path reaches the >=120 north star)
    student = SRVGGNetCompact(num_feat=32, num_conv=16, upscale=2,
                              policy=DEFAULT_POLICY)

    class StudentSeat:
        def apply(self, variables, y_pm1):
            y01 = y_pm1 * 0.5 + 0.5
            lq = resize(y01, (128, 128), method="area")
            out = student.apply(variables, lq)  # x2 -> 256
            return jnp.clip(out, 0.0, 1.0) * 2.0 - 1.0

    s_vars = student.init(jax.random.key(2), jnp.zeros((1, 128, 128, 3)))
    pipe, cfg = _mk_pipe_allpresent((StudentSeat(), s_vars))
    fps_student = _bench_pipe(pipe, cfg.chunk_size, 2)
    _log(f"config4 distilled-seat ALL-PRESENT fps={fps_student:.1f}")
    meas["config4_distilled_seat_allpresent_fps"] = {
        "fps_per_chip": round(fps_student, 1), "identities": 2,
        "chunk": cfg.chunk_size, "fused_group": cfg.fused_group,
        "sr": "SRVGG(32f/16c) x2 on the 128px-downscaled crop, ALL "
              "lanes present (similarity_th=-2.0 forces sim>th "
              "all-true through the production program)",
        "vs_baseline_120": round(fps_student / 120.0, 3)}
    _save(results)

    # --- all-present: LIPSPADE (the reference --use_sr quality path)
    sr_mod = LIPSPADEGenerator(policy=DEFAULT_POLICY)
    sr_vars = sr_mod.init(jax.random.key(1), jnp.zeros((1, 256, 256, 3)))
    pipe, cfg = _mk_pipe_allpresent((sr_mod, sr_vars))
    fps_lip = _bench_pipe(pipe, cfg.chunk_size, 2)
    _log(f"config4 LIPSPADE ALL-PRESENT fps={fps_lip:.1f}")
    meas["config4_lipspade_allpresent_fps"] = {
        "fps_per_chip": round(fps_lip, 1), "identities": 2,
        "chunk": cfg.chunk_size, "fused_group": cfg.fused_group,
        "sr": "LIPSPADE ngf=48 on every swapped 256^2 crop, ALL lanes "
              "present (the r03 64.1-fps configuration's honest "
              "continuity row)",
        "vs_baseline_120": round(fps_lip / 120.0, 3)}
    _save(results)

    roof = meas["lipspade_roofline_analysis"]
    iso = meas["lipspade_isolated_vs_roofline"]
    floor = meas["config4_multi_identity_sr_fps"]["fps_per_chip"]
    meas["config4_summary"] = {
        "lipspade_allpresent_fps": round(fps_lip, 1),
        "distilled_seat_allpresent_fps": round(fps_student, 1),
        "zero_present_floor_fps": floor,
        "lipspade_isolated_ms_per_crop": iso["measured_ms_per_crop"],
        "wall_adjusted_pred_ms": roof["wall_adjusted_pred_ms"],
        "pure_roofline_ms": roof["pure_roofline_ms"],
        "verdict": iso["conclusion"],
        "note": (
            "LIPSPADE-256 measures {:.2f} ms/crop vs the {:.2f} ms "
            "wall-adjusted prediction (small-channel conv wall, PERF.md "
            "S1) — compute(lowering)-walled. Even at the PURE bf16 "
            "roofline ({:.2f} ms/crop) the T=2 SR pass adds ~1.9 "
            "ms/frame to the ~10.7 ms T=2 swap frame -> ~79 fps "
            "ceiling: the reference's --use_sr quality path CANNOT "
            "reach the >=120 north star on this chip at any conv "
            "efficiency. The distilled SRVGG student seat (the "
            "cli/distill_enhancer product; learns real SR per "
            "DISTILL_VALUE_r04.json) is the quality path that can."
        ).format(iso["measured_ms_per_crop"],
                 roof["wall_adjusted_pred_ms"], roof["pure_roofline_ms"]),
    }
    _save(results)
    _log("done -> " + OUT)


if __name__ == "__main__":
    main()
