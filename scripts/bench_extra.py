"""Config-4/5 TPU numbers (BASELINE.json milestone ladder).

Config 4 — multi-identity (T=2) 1080p video swap with the LIPSPADE SR
generator in the loop (reference inference.py --use_sr + multiple
--source_paths): same methodology as bench.py (fused single-program
chunks, chained iterations, data-dependent scalar checksum), with the
SR forward applied to every swapped crop inside the fused program
(pipeline/swap.py:344-347).

Config 5 — AEI-Net + MultiscaleDiscriminator training step throughput
at reference scale (width=1.0, B=8, iresnet100 id loss), canonical AND
distill modes (reference train.py / train-self.py). Steps are
state-chained, so every iteration depends on the previous one.

Writes/updates BENCH_EXTRA_r03.json after EVERY measurement (the
round-2 deliverability lesson: never let one slow compile cost every
artifact). Run one at a time on the relay, in background, no timeout:

  PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/bench_extra.py > /tmp/bench_extra.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BENCH_EXTRA_r03.json")

RESULTS = {
    "round": 3,
    "methodology": "config 4: fused detect->swap(+SR)->blend chunks, "
    "chained iterations, scalar checksum forces execution (relay "
    "block_until_ready is unreliable). config 5: state-chained jitted "
    "G/D steps, width=1.0, B=8, iresnet100. Relay timing drifts +-25% "
    "between runs; these are single clean-queue runs, not A/Bs.",
    "measurements": {},
}


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _record(key, value):
    RESULTS["measurements"][key] = value
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    _log(f"recorded {key}: {json.dumps(value)}")


def bench_config4():
    import jax
    import jax.numpy as jnp

    from ghost_tpu.core.precision import DEFAULT_POLICY
    from ghost_tpu.models.sr.generator import LIPSPADEGenerator
    from ghost_tpu.pipeline.swap import (SwapConfig, SwapPipeline,
                                         build_random_pipeline)

    chunk, group, t_ids = 32, 16, 2
    cfg = SwapConfig(chunk_size=chunk, max_faces=4, crop_size=224,
                     match_faces=t_ids, fused_group=group, use_sr=True)
    base = build_random_pipeline(cfg, policy=DEFAULT_POLICY,
                                 arcface_layers=(3, 13, 30, 3))
    sr_mod = LIPSPADEGenerator(policy=DEFAULT_POLICY)  # ngf=48 reference scale
    sr_vars = sr_mod.init(jax.random.key(1), jnp.zeros((1, 256, 256, 3)))
    pipe = SwapPipeline((base.det_mod, base.det_vars),
                        (base.arc_mod, base.arc_vars),
                        (base.gen_mod, base.gen_vars),
                        (base.lmk_mod, base.lmk_vars),
                        sr=(sr_mod, sr_vars), config=cfg)

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (chunk, 1080, 1920, 3), dtype=np.uint8)
    sources = rng.integers(0, 255, (t_ids, 224, 224, 3), dtype=np.uint8)
    src_emb = pipe.embed_sources(np.asarray(sources))
    tgt_emb = pipe.embed_targets(np.asarray(sources))
    frames_d = jnp.asarray(frames)
    mask_params = jnp.asarray([[5.0, 5.0, 5.0, 2.0]] * t_ids, jnp.float32)

    t0 = time.time()
    out = pipe._detect_swap(frames_d, tgt_emb, src_emb, mask_params)
    jax.block_until_ready(out)
    _log(f"config4 first dispatch {time.time() - t0:.1f}s")

    checksum_fn = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    _ = float(checksum_fn(frames_d))

    iters = 4
    cur = frames_d
    t0 = time.time()
    for _ in range(iters):
        cur = pipe._detect_swap(cur, tgt_emb, src_emb, mask_params)
    _ = float(checksum_fn(cur))
    dt = time.time() - t0
    fps = iters * chunk / dt
    _record("config4_multi_identity_sr_fps", {
        "fps_per_chip": round(fps, 2),
        "identities": t_ids, "chunk": chunk, "fused_group": group,
        "sr": "LIPSPADE ngf=48 on every swapped 256^2 crop",
        "vs_baseline_120": round(fps / 120.0, 3),
    })
    return fps


def _train_setup(mode):
    import jax
    import jax.numpy as jnp

    from ghost_tpu.core.precision import DEFAULT_POLICY
    from ghost_tpu.models.aei import AEINet
    from ghost_tpu.models.arcface import IResNet
    from ghost_tpu.models.discriminator import MultiscaleDiscriminator
    from ghost_tpu.train.losses import GeneratorLossWeights
    from ghost_tpu.train.train_step import (TrainStepConfig,
                                            init_train_state,
                                            make_train_steps)

    key = jax.random.key(0)
    gen = AEINet(backbone="unet", num_blocks=2, policy=DEFAULT_POLICY,
                 train=True)
    g_vars = gen.init(key, jnp.zeros((1, 256, 256, 3)), jnp.zeros((1, 512)))
    disc = MultiscaleDiscriminator(n_layers=5, num_D=3, norm="instance",
                                   policy=DEFAULT_POLICY)
    d_vars = disc.init(key, jnp.zeros((1, 256, 256, 3)))
    arc = IResNet(layers=(3, 13, 30, 3), policy=DEFAULT_POLICY)
    a_vars = arc.init(key, jnp.zeros((1, 112, 112, 3)))
    arc_apply = lambda x: arc.apply(a_vars, x)
    cfg = TrainStepConfig(mode=mode)
    g_step, d_step = make_train_steps(gen, disc, arc_apply, cfg,
                                      GeneratorLossWeights())
    state = init_train_state(g_vars, d_vars, cfg)
    return g_step, d_step, state


def bench_config5(mode):
    import jax
    import jax.numpy as jnp

    B = 8
    g_step, d_step, state = _train_setup(mode)
    jit_g = jax.jit(g_step)
    jit_d = jax.jit(d_step)

    rng = np.random.default_rng(0)
    batch = {
        "xs": jnp.asarray(rng.uniform(-1, 1, (B, 256, 256, 3)).astype(np.float32)),
        "xt": jnp.asarray(rng.uniform(-1, 1, (B, 256, 256, 3)).astype(np.float32)),
        "embed": jnp.asarray(rng.normal(0, 1, (B, 512)).astype(np.float32)),
        "same_person": jnp.zeros((B,), jnp.float32),
    }
    if mode == "distill":
        batch["teacher_y"] = jnp.asarray(
            rng.uniform(-1, 1, (B, 256, 256, 3)).astype(np.float32))

    t0 = time.time()
    state, metrics, y = jit_g(state, batch)
    _ = float(metrics["lossG"])
    _log(f"config5[{mode}] G first dispatch {time.time() - t0:.1f}s")
    t0 = time.time()
    state, ld = jit_d(state, y, batch["xs"])
    _ = float(ld)
    _log(f"config5[{mode}] D first dispatch {time.time() - t0:.1f}s")

    iters = 10
    t0 = time.time()
    for _ in range(iters):
        state, metrics, y = jit_g(state, batch)
        state, ld = jit_d(state, y, batch["xs"])
    _ = float(metrics["lossG"]) + float(ld)
    dt = time.time() - t0
    steps_s = iters / dt
    _record(f"config5_train_step_{mode}", {
        "steps_per_sec": round(steps_s, 3),
        "imgs_per_sec": round(steps_s * B, 1),
        "ms_per_step_G_plus_D": round(dt / iters * 1000, 1),
        "batch": B, "width": 1.0, "arcface": "iresnet100",
    })
    return steps_s


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ghost_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    for name, fn in (
        ("config5_canonical", lambda: bench_config5("canonical")),
        ("config5_distill", lambda: bench_config5("distill")),
        ("config4", bench_config4),
    ):
        try:
            fn()
        except Exception as e:  # pragma: no cover - defensive
            _log(f"{name} failed: {e!r}")
            _record(f"{name}_error", repr(e))


if __name__ == "__main__":
    main()
