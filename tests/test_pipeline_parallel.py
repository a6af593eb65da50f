"""GPipe pipeline parallelism (parallel/pp.py): schedule equivalence.

The pipeline is an execution-schedule change only — outputs (and grads,
incl. under remat) must match the sequential block chain. Runs on an
8-virtual-device CPU mesh in a SUBPROCESS (multi-device host
materialization aborts this backend mid-suite; scalars and per-shard
reads are the only safe crossings — see CLAUDE.md measured facts).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest


def test_pipeline_parallel_matches_sequential():
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
    assert "PP-OK" in r.stdout


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

    from ghost_tpu.parallel.pp import (
        make_pipe_mesh,
        pipeline_apply,
        stack_block_params,
        unstack_block_params,
    )

    if len(jax.devices()) < 8:
        print("PP-OK (skipped: <8 devices)")
        return

    # --- generic residual blocks: exact schedule equivalence ---------
    rng = np.random.default_rng(0)
    n_blocks, feat = 8, 16
    blocks = [
        {"w": jnp.asarray(rng.standard_normal((feat, feat), np.float32) * 0.1),
         "b": jnp.asarray(rng.standard_normal((feat,), np.float32) * 0.1)}
        for _ in range(n_blocks)
    ]

    def block_apply(p, h):
        return h + jnp.tanh(h @ p["w"] + p["b"])

    stacked = stack_block_params(blocks)
    x = jnp.asarray(rng.standard_normal((8, feat), np.float32))

    ref = x
    for p in unstack_block_params(stacked):
        ref = block_apply(p, ref)
    ref_np = np.asarray(ref)

    for num_stages, m in [(4, 4), (4, 8), (8, 4), (1, 2)]:
        mesh = make_pipe_mesh(num_stages)
        got = jax.jit(
            lambda sp, xx: pipeline_apply(
                block_apply, sp, xx, mesh=mesh, num_microbatches=m)
        )(stacked, x)
        _shards_match(got, ref_np, atol=1e-6)
    print("schedule equivalence ok")

    # --- N % S != 0: trailing slots identity-padded --------------------
    stacked7 = stack_block_params(blocks[:7])
    ref7 = x
    for p in blocks[:7]:
        ref7 = block_apply(p, ref7)
    got7 = jax.jit(
        lambda sp, xx: pipeline_apply(
            block_apply, sp, xx, mesh=make_pipe_mesh(4),
            num_microbatches=4)
    )(stacked7, x)
    _shards_match(got7, np.asarray(ref7), atol=1e-6)
    print("padding equivalence ok")

    # --- gradients (remat=True) match the sequential chain -----------
    mesh = make_pipe_mesh(4)

    def loss_pp(sp, xx):
        y = pipeline_apply(block_apply, sp, xx, mesh=mesh,
                           num_microbatches=4, remat=True)
        return jnp.sum(y * y)

    def loss_seq(sp, xx):
        h = xx
        for i in range(n_blocks):
            h = block_apply(jax.tree.map(lambda l: l[i], sp), h)
        return jnp.sum(h * h)

    g_pp = jax.jit(jax.grad(loss_pp))(stacked, x)
    g_ref = jax.jit(jax.grad(loss_seq))(stacked, x)
    for leaf_pp, leaf_ref in zip(jax.tree.leaves(g_pp),
                                 jax.tree.leaves(g_ref)):
        _shards_match(leaf_pp, np.asarray(leaf_ref), atol=1e-4)
    print("grad equivalence ok")

    # --- the motivating case: a tiny RRDB trunk ----------------------
    from ghost_tpu.core.precision import FULL_PRECISION
    from ghost_tpu.models.sr.rrdb import RRDB

    block = RRDB(num_feat=8, num_grow_ch=4, policy=FULL_PRECISION)
    keys = jax.random.split(jax.random.key(0), 8)
    feats = jnp.asarray(rng.standard_normal((4, 6, 6, 8), np.float32))
    rrdb_blocks = [block.init(k, feats[:1])["params"] for k in keys]

    def rrdb_apply(p, h):
        return block.apply({"params": p}, h)

    stacked_rrdb = stack_block_params(rrdb_blocks)
    ref = feats
    for p in rrdb_blocks:
        ref = rrdb_apply(p, ref)
    got = jax.jit(
        lambda sp, xx: pipeline_apply(
            rrdb_apply, sp, xx, mesh=make_pipe_mesh(4), num_microbatches=4)
    )(stacked_rrdb, feats)
    _shards_match(got, np.asarray(ref), atol=1e-5)
    print("rrdb trunk ok")

    # --- full RRDBNet with the trunk pipelined (5 blocks / 4 stages:
    # exercises the identity-padding path on the real consumer) --------
    from ghost_tpu.models.sr.rrdb import RRDBNet, rrdb_forward_pipelined

    net = RRDBNet(num_feat=8, num_block=5, num_grow_ch=4, scale=4,
                  policy=FULL_PRECISION)
    imgs = jnp.asarray(rng.standard_normal((4, 8, 8, 3), np.float32))
    variables = net.init(jax.random.key(1), imgs[:1])
    ref_full = np.asarray(net.apply(variables, imgs))
    got_full = jax.jit(
        lambda v, xx: rrdb_forward_pipelined(
            net, v, xx, mesh=make_pipe_mesh(4), num_microbatches=4)
    )(variables, imgs)
    _shards_match(got_full, ref_full, atol=1e-5)
    print("PP-OK")


if __name__ == "__main__":
    _run()
