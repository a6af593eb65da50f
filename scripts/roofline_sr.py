"""Roofline/MFU analysis of the config-4 SR pass (LIPSPADE-on-crops).

VERDICT round 3 weak #1: config 4 (multi-identity + SR serving) runs at
64.1 fps/chip = 0.53x the >=120 north star with no roofline argument on
file. This module derives one the same way the RRDB wall was proven,
but mechanically: trace the SR forward, walk the jaxpr, and build the
exact op inventory (every conv_general_dilated and dot_general with
shapes and FLOPs). From that:

  * pure-FLOP roofline time at the v5e bf16 peak (197 TFLOP/s);
  * a WALL-ADJUSTED prediction using the repo's measured lowering
    walls (CLAUDE.md/PERF.md): small-channel 3x3 convs run ~2.1 ns/px
    at C<=64 (measured at every shape tried; half-empty lanes), ~mid
    between wall and roofline at C=96, roofline-ish at C>=128. Each
    op's predicted time = max(flops/peak, px * wall_ns(C)).

bench_extra_r04.py runs this on CPU (tracing only — no execution) and
compares the prediction against the measured per-crop SR time on the
real chip. Standalone: PYTHONPATH=... python scripts/roofline_sr.py
"""

from __future__ import annotations

import json

PEAK_BF16 = 197e12  # TPU v5e peak bf16 FLOP/s (public spec)


def wall_ns_per_px(c_min: int) -> float:
    """Measured small-channel conv wall (PERF.md §1): ~2.1 ns/output-px
    for 3x3 convs at C<=64 on this chip/toolchain; assume linear relief
    until the lanes fill at C>=128 (where measured convs sit near the
    bf16 roofline)."""
    if c_min >= 128:
        return 0.0  # roofline term dominates
    if c_min <= 64:
        return 2.1
    # linear interpolation 64 -> 128
    return 2.1 * (128 - c_min) / 64.0


def op_inventory(fn, *example_args):
    """Trace fn and return the conv/matmul op list with shapes/flops."""
    import jax

    jaxpr = jax.make_jaxpr(fn)(*example_args)
    ops = []

    def walk(jx):
        for eqn in jx.eqns:
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    walk(sub.jaxpr)
                elif isinstance(sub, (list, tuple)):
                    for s in sub:
                        if hasattr(s, "jaxpr"):
                            walk(s.jaxpr)
            name = eqn.primitive.name
            if name == "conv_general_dilated":
                lhs = eqn.invars[0].aval.shape
                rhs = eqn.invars[1].aval.shape
                out = eqn.outvars[0].aval.shape
                # dimension_numbers tells the layout; ours are NHWC/HWIO
                dn = eqn.params["dimension_numbers"]
                c_in = lhs[dn.lhs_spec[1]]
                c_out = out[dn.out_spec[1]]
                spatial = [out[i] for i in dn.out_spec[2:]]
                k_spatial = [rhs[i] for i in dn.rhs_spec[2:]]
                px = 1
                for s in spatial:
                    px *= s
                k = 1
                for s in k_spatial:
                    k *= s
                batch = lhs[dn.lhs_spec[0]]
                flops = 2 * batch * px * c_in * c_out * k / eqn.params[
                    "feature_group_count"]
                ops.append({"op": "conv", "batch": batch, "px": px,
                            "cin": c_in, "cout": c_out, "k": k,
                            "flops": flops})
            elif name == "dot_general":
                a = eqn.invars[0].aval.shape
                b = eqn.invars[1].aval.shape
                dn = eqn.params["dimension_numbers"]
                (lc, rc), (lb, rb) = dn
                m = 1
                for i, s in enumerate(a):
                    if i not in lc and i not in lb:
                        m *= s
                n = 1
                for i, s in enumerate(b):
                    if i not in rc and i not in rb:
                        n *= s
                kdim = 1
                for i in lc:
                    kdim *= a[i]
                bsz = 1
                for i in lb:
                    bsz *= a[i]
                ops.append({"op": "dot", "batch": bsz, "px": m,
                            "cin": kdim, "cout": n, "k": 1,
                            "flops": 2.0 * bsz * m * n * kdim})

    walk(jaxpr.jaxpr)
    return ops


def analyze(ops):
    """Roofline + wall-adjusted totals for an op inventory."""
    total_flops = sum(o["flops"] for o in ops)
    roofline_ms = total_flops / PEAK_BF16 * 1e3
    wall_ms = 0.0
    for o in ops:
        t_roof = o["flops"] / PEAK_BF16
        c_min = min(o["cin"], o["cout"])
        # the px wall applies to CONVs (vector-lane underfill on the
        # small-channel 3x3s); 1x1s lowered as dot ride the MXU but
        # share the underfill when channels are tiny
        t_wall = o["batch"] * o["px"] * wall_ns_per_px(c_min) * 1e-9
        wall_ms += max(t_roof, t_wall) * 1e3
    return {
        "total_gflops": round(total_flops / 1e9, 2),
        "pure_roofline_ms": round(roofline_ms, 3),
        "wall_adjusted_pred_ms": round(wall_ms, 3),
        "ops": len(ops),
    }


def lipspade_inventory(batch: int = 1, size: int = 256, ngf: int = 48):
    import jax
    import jax.numpy as jnp

    from ghost_tpu.core.precision import DEFAULT_POLICY
    from ghost_tpu.models.sr.generator import LIPSPADEGenerator

    mod = LIPSPADEGenerator(ngf=ngf, param_free="syncbatch", train=False,
                            policy=DEFAULT_POLICY)
    x = jnp.zeros((batch, size, size, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda: mod.init(jax.random.key(0), x))
    variables = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables)
    return op_inventory(lambda v, t: mod.apply(v, t), variables, x)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    ops = lipspade_inventory()
    res = analyze(ops)
    # top contributors by wall-adjusted time
    detail = []
    for o in sorted(ops, key=lambda o: -max(
            o["flops"] / PEAK_BF16,
            o["batch"] * o["px"] * wall_ns_per_px(
                min(o["cin"], o["cout"])) * 1e-9))[:12]:
        detail.append({k: int(v) if k != "op" else v
                       for k, v in o.items() if k != "flops"}
                      | {"gflops": round(o["flops"] / 1e9, 2)})
    print(json.dumps({"lipspade_256_b1": res, "top_ops": detail},
                     indent=1))


if __name__ == "__main__":
    main()
