"""Ring attention (parallel/sp.py): exactness vs materializing attention.

Sequence-sharded online-softmax with KV rotation must match the
single-device softmax(QK^T)V — fwd and grads, causal and not, bf16 and
f32. Runs on an 8-virtual-device CPU mesh in a SUBPROCESS (multi-device
host materialization aborts this backend mid-suite; per-shard reads are
the only safe crossings — see CLAUDE.md measured facts).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest


def test_ring_attention_matches_reference():
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
    assert "SP-OK" in r.stdout


def _shards_match(got, ref_np, atol):
    import numpy as np

    for sh in got.addressable_shards:
        np.testing.assert_allclose(
            np.asarray(sh.data), ref_np[sh.index], atol=atol)


def _run():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ghost_tpu.parallel.sp import (
        attention_reference,
        make_seq_mesh,
        ring_attention,
    )

    if len(jax.devices()) < 8:
        print("SP-OK (skipped: <8 devices)")
        return

    rng = np.random.default_rng(0)
    b, s, h, d = 2, 64, 2, 8
    q = jnp.asarray(rng.standard_normal((b, s, h, d), np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, h, d), np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, h, d), np.float32))

    for n_dev in (8, 4, 1):
        mesh = make_seq_mesh(n_dev)
        for causal in (False, True):
            ref = np.asarray(attention_reference(q, k, v, causal=causal))
            got = jax.jit(
                lambda qq, kk, vv, _m=mesh, _c=causal: ring_attention(
                    qq, kk, vv, mesh=_m, causal=_c))(q, k, v)
            _shards_match(got, ref, atol=2e-6)
    print("fwd equivalence ok (1/4/8 devices, causal and not)")

    # bf16 inputs: f32 accumulators keep the result at bf16 resolution
    mesh = make_seq_mesh(8)
    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))
    ref = np.asarray(
        attention_reference(qb, kb, vb, causal=True), np.float32)
    got = jax.jit(lambda a, b_, c: ring_attention(
        a, b_, c, mesh=mesh, causal=True))(qb, kb, vb)
    for sh in got.addressable_shards:
        np.testing.assert_allclose(
            np.asarray(sh.data, dtype=np.float32), ref[sh.index], atol=3e-2)
    print("bf16 ok")

    # grads: d/dq,k,v of a scalar loss match the materializing reference
    def loss_ring(qq, kk, vv):
        y = ring_attention(qq, kk, vv, mesh=mesh, causal=True)
        return jnp.sum(y * y)

    def loss_ref(qq, kk, vv):
        y = attention_reference(qq, kk, vv, causal=True)
        return jnp.sum(y * y)

    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for gr, gf in zip(g_ring, g_ref):
        _shards_match(gr, np.asarray(gf), atol=1e-4)
    print("grads ok")

    # MultiheadAttention(seq_mesh=...) routes through the ring core
    # with an unchanged param tree and matching outputs
    from ghost_tpu.core.precision import FULL_PRECISION
    from ghost_tpu.nn.modules import MultiheadAttention

    xin = jnp.asarray(rng.standard_normal((2, 64, 16), np.float32))
    mha = MultiheadAttention(num_heads=2, head_dim=8, causal=True,
                             policy=FULL_PRECISION)
    variables = mha.init(jax.random.key(0), xin)
    ref = np.asarray(mha.apply(variables, xin))
    mha_sp = MultiheadAttention(num_heads=2, head_dim=8, causal=True,
                                seq_mesh=mesh, policy=FULL_PRECISION)
    got = jax.jit(lambda v_, x_: mha_sp.apply(v_, x_))(variables, xin)
    _shards_match(got, ref, atol=1e-5)
    print("SP-OK")


if __name__ == "__main__":
    _run()
