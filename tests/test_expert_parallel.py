"""Expert parallelism (parallel/ep.py): exactness vs the dense MoE.

Sharding the expert stack and psum-ing partial gate-weighted sums must
match `nn.moe.moe_apply` — fwd and grads. Runs on an 8-virtual-device
CPU mesh in a SUBPROCESS (multi-device host materialization aborts
this backend mid-suite — see CLAUDE.md measured facts).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest


def test_expert_parallel_matches_dense():
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
        pytest.skip("XLA:CPU collective watchdog fired (1-core starvation)")
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "EP-OK" in r.stdout


def _run():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ghost_tpu.nn.moe import init_moe_params, moe_apply
    from ghost_tpu.parallel.ep import (
        make_expert_mesh,
        moe_apply_expert_parallel,
    )

    if len(jax.devices()) < 8:
        print("EP-OK (skipped: <8 devices)")
        return

    rng = np.random.default_rng(0)
    d_model, d_hidden, num_experts = 16, 32, 8
    params = init_moe_params(jax.random.key(0), d_model, d_hidden,
                             num_experts)
    x = jnp.asarray(rng.standard_normal((4, 6, d_model), np.float32))

    for n_dev, top_k in [(8, 2), (4, 2), (2, 8), (1, 1)]:
        mesh = make_expert_mesh(n_dev)
        ref = np.asarray(moe_apply(params, x, top_k=top_k))
        got = jax.jit(
            lambda p, xx, _m=mesh, _k=top_k: moe_apply_expert_parallel(
                p, xx, mesh=_m, top_k=_k))(params, x)
        for sh in got.addressable_shards:
            np.testing.assert_allclose(
                np.asarray(sh.data), ref[sh.index], atol=1e-5)
    print("fwd equivalence ok (1/2/4/8 devices, top-k 1/2/all)")

    # grads (params and input) match the dense reference
    mesh = make_expert_mesh(4)

    def loss_ep(p, xx):
        y = moe_apply_expert_parallel(p, xx, mesh=mesh, top_k=2)
        return jnp.sum(y * y)

    def loss_dense(p, xx):
        y = moe_apply(p, xx, top_k=2)
        return jnp.sum(y * y)

    g_ep = jax.jit(jax.grad(loss_ep, argnums=(0, 1)))(params, x)
    g_ref = jax.jit(jax.grad(loss_dense, argnums=(0, 1)))(params, x)
    for le, lr in zip(jax.tree.leaves(g_ep), jax.tree.leaves(g_ref)):
        ref_np = np.asarray(lr)
        for sh in le.addressable_shards:
            np.testing.assert_allclose(
                np.asarray(sh.data), ref_np[sh.index], atol=1e-4)
    print("EP-OK")


if __name__ == "__main__":
    _run()
