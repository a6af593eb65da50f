"""Distributed checkpointing: ZeRO/mesh-sharded state round-trips.

The reference checkpoints single-GPU state dicts only (reference
train.py:449-456); apex's distributed optimizers have no checkpoint
story at all. Here the orbax manager must save mesh-sharded
jax.Arrays per addressable shard (NO host materialization — a full
device_get of a multi-device array aborts this backend, see CLAUDE.md)
and restore them INTO their shardings, exactly. Two-phase pattern per
apex/apex/contrib/sparsity/test/checkpointing_test_part1/part2: save
mid-run, restore, continue, compare against an uninterrupted run.

Runs on an 8-virtual-device CPU mesh in a SUBPROCESS.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest


def test_sharded_checkpoint_roundtrip(tmp_path):
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        flags += " --xla_force_host_platform_device_count=8"
    env["XLA_FLAGS"] = flags.strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), str(tmp_path)],
        env=env, capture_output=True, text=True, timeout=1500)
    if r.returncode == -6 and ("endezvous" in r.stderr
                               or "Termination timeout" in r.stderr):
        pytest.skip("XLA:CPU collective watchdog fired (1-core starvation)")
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "CKPT-SHARDED-OK" in r.stdout


def _run(tmpdir):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ghost_tpu.core.checkpoint import CheckpointManager
    from ghost_tpu.parallel.zero import opt_state_shardings

    if len(jax.devices()) < 8:
        print("CKPT-SHARDED-OK (skipped: <8 devices)")
        return

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("data",))
    rng = np.random.default_rng(0)
    params = {
        "w": jnp.asarray(rng.standard_normal((16, 8), np.float32)),
        "b": jnp.zeros((8,), jnp.float32),
    }
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    # ZeRO-shard the moments over the data axis; replicate params
    repl = NamedSharding(mesh, P())
    params = jax.device_put(params, repl)
    opt_state = jax.device_put(
        opt_state, opt_state_shardings(mesh, opt_state))

    xs = jnp.asarray(rng.standard_normal((32, 16), np.float32))
    ys = jnp.asarray(rng.standard_normal((32, 8), np.float32))

    @jax.jit
    def step(params, opt_state, x, y):
        def loss(p):
            return jnp.mean((x @ p["w"] + p["b"] - y) ** 2)

        g = jax.grad(loss)(params)
        updates, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    # uninterrupted two steps
    p_ref, s_ref = step(params, opt_state, xs, ys)
    p_ref, s_ref = step(p_ref, s_ref, xs, ys)

    # one step -> save -> restore -> second step
    p1, s1 = step(params, opt_state, xs, ys)
    mgr = CheckpointManager(os.path.join(tmpdir, "ckpt"), keep=2)
    mgr.save(1, {"params": p1, "opt": s1})

    mgr2 = CheckpointManager(os.path.join(tmpdir, "ckpt"), keep=2)
    restored = mgr2.restore(like={"params": p1, "opt": s1})
    rp, rs = restored["params"], restored["opt"]

    # restored arrays carry the same shardings (per-leaf check)
    for a, b in zip(jax.tree.leaves(rs), jax.tree.leaves(s1)):
        if hasattr(a, "sharding"):
            assert a.sharding.is_equivalent_to(b.sharding, a.ndim), (
                a.sharding, b.sharding)

    p2, s2 = step(rp, rs, xs, ys)

    # compare on-device (scalar crossings only — multi-device
    # np.asarray aborts this backend)
    @jax.jit
    def maxdiff(a, b):
        return jnp.max(jnp.asarray([
            jnp.max(jnp.abs(x - y))
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))]))

    assert float(maxdiff(p2, p_ref)) == 0.0
    assert float(maxdiff(s2, s_ref)) == 0.0
    print("CKPT-SHARDED-OK")


if __name__ == "__main__":
    _run(sys.argv[1])
