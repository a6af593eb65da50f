"""Exact-jaxpr roofline of the FUSED swap program (config-3/4 decomposition).

VERDICT r4 item 3: the config-4 gap (97.3 fps honest all-present vs the
>=120 north star) needed the same rigor as the LIPSPADE settlement
(scripts/roofline_sr.py). This traces the production fused
detect->match->swap->blend program (pipeline/swap.py _detect_swap_impl)
at T=1 and T=2, with no SR / the distilled SRVGG student seat /
LIPSPADE, and builds the exact op inventory:

  * conv/dot FLOPs -> pure roofline + the measured small-channel conv
    wall model (2.1 ns/px at C<=64, PERF.md §1) per op;
  * gather taps (the warp/rotation resamples) x the measured ~10 ns/tap
    flat-take floor (CLAUDE.md measured TPU facts);
  * per-frame wall-adjusted prediction = conv/dot wall + gather wall.

Trace-only — runs on CPU in ~2 min; compares against the measured fps
on the real chip (BENCH_EXTRA_r05). chunk=32/group=32 traces ungrouped
(g=1) so the jaxpr holds each op exactly once per chunk.

Usage: PYTHONPATH=/root/repo python scripts/roofline_swap.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo/scripts")

from roofline_sr import PEAK_BF16, op_inventory, wall_ns_per_px  # noqa: E402

GATHER_NS_PER_TAP = 10.0  # measured flat-take floor (CLAUDE.md)


def gather_taps(fn, *example_args):
    """Count gather output elements (taps) in fn's jaxpr."""
    import jax

    jaxpr = jax.make_jaxpr(fn)(*example_args)
    taps = [0]

    def walk(jx):
        for eqn in jx.eqns:
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    walk(sub.jaxpr)
                elif isinstance(sub, (list, tuple)):
                    for s in sub:
                        if hasattr(s, "jaxpr"):
                            walk(s.jaxpr)
            if eqn.primitive.name in ("gather", "take"):
                out = eqn.outvars[0].aval
                n = 1
                for s in out.shape:
                    n *= s
                taps[0] += n

    walk(jaxpr.jaxpr)
    return taps[0]


def build(t: int, sr_kind: str | None, chunk: int = 32):
    import jax
    import jax.numpy as jnp

    from ghost_tpu.core.precision import DEFAULT_POLICY
    from ghost_tpu.pipeline.swap import SwapConfig, SwapPipeline, \
        build_random_pipeline

    cfg = SwapConfig(chunk_size=chunk, max_faces=4, crop_size=224,
                     match_faces=2, fused_group=chunk,
                     similarity_th=-2.0, use_sr=sr_kind is not None)
    base = build_random_pipeline(cfg, policy=DEFAULT_POLICY,
                                 arcface_layers=(3, 13, 30, 3))
    sr = None
    if sr_kind == "lipspade":
        from ghost_tpu.models.sr.generator import LIPSPADEGenerator

        mod = LIPSPADEGenerator(ngf=48, param_free="syncbatch",
                                train=False, policy=DEFAULT_POLICY)
        sv = jax.eval_shape(lambda: mod.init(
            jax.random.key(0), jnp.zeros((1, 256, 256, 3))))
        sv = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), sv)
        sr = (mod, sv)
    elif sr_kind == "student":
        from ghost_tpu.models.sr.srvgg import (SRVGGNetCompact,
                                               SRVGGStudentSeat)

        stu = SRVGGNetCompact(num_feat=32, num_conv=16, upscale=2,
                              policy=DEFAULT_POLICY)
        sv = jax.eval_shape(lambda: stu.init(
            jax.random.key(0), jnp.zeros((1, 128, 128, 3))))
        sv = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), sv)
        sr = (SRVGGStudentSeat(stu), sv)
    pipe = SwapPipeline((base.det_mod, base.det_vars),
                        (base.arc_mod, base.arc_vars),
                        (base.gen_mod, base.gen_vars),
                        (base.lmk_mod, base.lmk_vars),
                        sr=sr, config=cfg)

    frames = jnp.zeros((chunk, 1080, 1920, 3), jnp.uint8)
    tgt = jnp.zeros((t, 512), jnp.float32)
    src = jnp.zeros((t, 512), jnp.float32)
    mp = jnp.zeros((t, 4), jnp.float32)
    fn = lambda v, f: pipe._detect_swap_impl(v, f, tgt, src, mp, True)
    return fn, pipe._vars, frames, chunk


def analyze_config(t, sr_kind, chunk=32):
    fn, variables, frames, chunk = build(t, sr_kind, chunk)
    ops = op_inventory(fn, variables, frames)
    taps = gather_taps(fn, variables, frames)
    flops = sum(o["flops"] for o in ops)
    wall_s = 0.0
    for o in ops:
        t_roof = o["flops"] / PEAK_BF16
        t_wall = o["batch"] * o["px"] * wall_ns_per_px(
            min(o["cin"], o["cout"])) * 1e-9
        wall_s += max(t_roof, t_wall)
    # taps counts OUTPUT ELEMENTS; the measured ~10 ns/tap floor is per
    # sampled POSITION (a position pulls 3-4 channels in one row), so
    # the position estimate divides by ~3. It is an UPPER BOUND: XLA
    # fuses some small gathers below the flat-take floor — use the
    # DELTAS between configs (per-lane / per-seat additions), which
    # cancel the shared over-count, not the absolute totals.
    positions = taps / 3.0
    gather_s = positions * GATHER_NS_PER_TAP * 1e-9
    total_s = wall_s + gather_s
    return {
        "targets": t,
        "sr": sr_kind or "none",
        "chunk": chunk,
        "conv_dot_ops": len(ops),
        "gflops_per_chunk": round(flops / 1e9, 1),
        "gather_mtaps_per_chunk": round(taps / 1e6, 1),
        "pure_roofline_ms_per_frame": round(
            flops / PEAK_BF16 * 1e3 / chunk, 3),
        "conv_wall_ms_per_frame": round(wall_s * 1e3 / chunk, 3),
        "gather_upper_ms_per_frame": round(gather_s * 1e3 / chunk, 3),
        "wall_pred_upper_ms_per_frame": round(total_s * 1e3 / chunk, 3),
        "wall_pred_fps_lower_bound": round(chunk / total_s, 1),
    }


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    out = []
    for t, sr_kind in [(1, None), (2, None), (2, "student"),
                       (2, "lipspade")]:
        r = analyze_config(t, sr_kind)
        out.append(r)
        print(json.dumps(r), flush=True)
    print(json.dumps({"all": out}))


if __name__ == "__main__":
    main()
