"""Train-step MFU statement (VERDICT r4 item 6).

Walks the canonical train step's jaxpr with the same tooling that
proved the LIPSPADE wall (scripts/roofline_sr.py op_inventory): exact
conv/dot FLOP inventory of the G step (fwd + bwd + optimizer) and the
D step at the measured serving point (B=8, width 1.0, iresnet100
ArcFace in the loss), then relates the measured steps/s
(scripts/profile_train.py on the real chip: 14.8 steps/s canonical) to
the v5e bf16 peak.

Reference counterpart: reference train.py:62-459 — whose per-sample
teacher loop is CPU/ONNX-bound (SURVEY.md §3.2), i.e. its MFU is
bounded by the host, not the chip; this quantifies how far the TPU
rebuild sits from the chip roofline instead.

Trace-only — runs on CPU. Usage:
  PYTHONPATH=/root/repo python scripts/mfu_train.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo/scripts")

from roofline_sr import PEAK_BF16, analyze, op_inventory  # noqa: E402


def build_steps(B=8):
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
    g_vars = jax.eval_shape(
        lambda: gen.init(key, jnp.zeros((1, 256, 256, 3)),
                         jnp.zeros((1, 512))))
    g_vars = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), g_vars)
    disc = MultiscaleDiscriminator(n_layers=5, num_D=3, norm="instance",
                                   policy=DEFAULT_POLICY)
    d_vars = jax.eval_shape(
        lambda: disc.init(key, jnp.zeros((1, 256, 256, 3))))
    d_vars = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), d_vars)
    arc = IResNet(layers=(3, 13, 30, 3), policy=DEFAULT_POLICY)
    a_vars = jax.eval_shape(
        lambda: arc.init(key, jnp.zeros((1, 112, 112, 3))))
    a_vars = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), a_vars)
    arc_apply = lambda x: arc.apply(a_vars, x)

    cfg = TrainStepConfig(mode="canonical")
    g_step, d_step = make_train_steps(gen, disc, arc_apply, cfg,
                                      GeneratorLossWeights())
    state = init_train_state(g_vars, d_vars, cfg)
    batch = {
        "xs": jnp.zeros((B, 256, 256, 3), jnp.float32),
        "xt": jnp.zeros((B, 256, 256, 3), jnp.float32),
        "embed": jnp.zeros((B, 512), jnp.float32),
        "same_person": jnp.zeros((B,), jnp.float32),
    }
    return g_step, d_step, state, batch


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    B = 8
    g_step, d_step, state, batch = build_steps(B)

    g_ops = op_inventory(g_step, state, batch)
    g_flops = sum(o["flops"] for o in g_ops)

    _, _, y = jax.eval_shape(g_step, state, batch)
    import jax.numpy as jnp
    y0 = jnp.zeros(y.shape, jnp.float32)
    d_ops = op_inventory(d_step, state, y0, batch["xs"])
    d_flops = sum(o["flops"] for o in d_ops)

    # measured on the real chip (scripts/profile_train.py, PERF.md):
    # G step 527 ms at B=8 => 14.8 img/s... see PERF.md row; steps/s
    # here is G steps/s with D every d_interval=10
    measured_g_ms = float(sys.argv[1]) if len(sys.argv) > 1 else None

    top = sorted(g_ops, key=lambda o: -o["flops"])[:10]
    res = {
        "batch": B,
        "g_step_gflops": round(g_flops / 1e9, 1),
        "d_step_gflops": round(d_flops / 1e9, 1),
        "effective_gflops_per_iter_dint10": round(
            (g_flops + d_flops / 10) / 1e9, 1),
        "g_conv_dot_ops": len(g_ops),
        "v5e_bf16_peak_tflops": PEAK_BF16 / 1e12,
        "g_pure_roofline_ms": round(g_flops / PEAK_BF16 * 1e3, 2),
        # per-op max(roofline, measured small-channel conv wall) — the
        # same wall model that predicted the LIPSPADE crop time to 1.07x
        "g_wall_adjusted_ms": analyze(g_ops)["wall_adjusted_pred_ms"],
        "d_wall_adjusted_ms": analyze(d_ops)["wall_adjusted_pred_ms"],
        "top_g_ops": [
            {k: (int(v) if k != "op" else v) for k, v in o.items()
             if k != "flops"} | {"gflops": round(o["flops"] / 1e9, 2)}
            for o in top
        ],
    }
    if measured_g_ms:
        res["measured_g_ms"] = measured_g_ms
        res["mfu_pct"] = round(
            g_flops / PEAK_BF16 / (measured_g_ms / 1e3) * 100, 1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
