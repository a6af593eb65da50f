"""2-D parallelism composition: data x {pipe, seq, expert} meshes.

Production meshes combine data parallelism with the other schedules;
each schedule's collectives (ppermute / psum) must stay on its own
axis while the batch dim shards over "data", and outputs must still
match the single-device references exactly. Runs on an 8-virtual-
device CPU mesh in a SUBPROCESS (see CLAUDE.md measured facts).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest


def test_parallel_2d_composition():
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
    assert "P2D-OK" in r.stdout


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
    from jax.sharding import Mesh

    from ghost_tpu.nn.moe import init_moe_params, moe_apply
    from ghost_tpu.parallel.ep import moe_apply_expert_parallel
    from ghost_tpu.parallel.pp import pipeline_apply, stack_block_params
    from ghost_tpu.parallel.sp import attention_reference, ring_attention

    if len(jax.devices()) < 8:
        print("P2D-OK (skipped: <8 devices)")
        return

    devs = np.asarray(jax.devices()[:8])
    rng = np.random.default_rng(0)

    # --- data(2) x pipe(4) ------------------------------------------
    mesh_pp = Mesh(devs.reshape(2, 4), ("data", "pipe"))
    feat = 16
    blocks = [
        {"w": jnp.asarray(rng.standard_normal((feat, feat), np.float32) * 0.1),
         "b": jnp.asarray(rng.standard_normal((feat,), np.float32) * 0.1)}
        for _ in range(8)]

    def block_apply(p, h):
        return h + jnp.tanh(h @ p["w"] + p["b"])

    x = jnp.asarray(rng.standard_normal((8, feat), np.float32))
    ref = x
    for p in blocks:
        ref = block_apply(p, ref)
    got = jax.jit(lambda sp_, xx: pipeline_apply(
        block_apply, sp_, xx, mesh=mesh_pp, axis="pipe",
        num_microbatches=4, batch_axis="data"))(
            stack_block_params(blocks), x)
    _shards_match(got, np.asarray(ref), atol=1e-6)
    print("data x pipe ok")

    # --- data(2) x seq(4) -------------------------------------------
    mesh_sp = Mesh(devs.reshape(2, 4), ("data", "seq"))
    q, k, v = (jnp.asarray(rng.standard_normal((4, 32, 2, 8), np.float32))
               for _ in range(3))
    ref = np.asarray(attention_reference(q, k, v, causal=True))
    got = jax.jit(lambda a, b, c: ring_attention(
        a, b, c, mesh=mesh_sp, causal=True, batch_axis="data"))(q, k, v)
    _shards_match(got, ref, atol=2e-6)
    print("data x seq ok")

    # --- data(2) x expert(4) ----------------------------------------
    mesh_ep = Mesh(devs.reshape(2, 4), ("data", "expert"))
    params = init_moe_params(jax.random.key(0), 16, 32, 8)
    xe = jnp.asarray(rng.standard_normal((4, 6, 16), np.float32))
    ref = np.asarray(moe_apply(params, xe, top_k=2))
    got = jax.jit(lambda p, xx: moe_apply_expert_parallel(
        p, xx, mesh=mesh_ep, top_k=2, batch_axis="data"))(params, xe)
    _shards_match(got, ref, atol=1e-5)
    print("data x expert ok")

    # --- tile-axis sharding of the background upsampler --------------
    from ghost_tpu.core.precision import FULL_PRECISION
    from ghost_tpu.models.sr.rrdb import RRDBNet
    from ghost_tpu.pipeline.enhance import upscale_tiled

    mesh_tiles = Mesh(devs.reshape(8), ("data",))
    net = RRDBNet(num_feat=8, num_block=2, num_grow_ch=4, scale=4,
                  policy=FULL_PRECISION)
    frames = jnp.asarray(rng.random((2, 16, 16, 3), np.float32))
    nv = net.init(jax.random.key(2), frames[:1, :8, :8])
    ref = np.asarray(upscale_tiled(net, nv, frames, tile=(4, 4),
                                   tile_pad=2))
    got = jax.jit(lambda v_, f_: upscale_tiled(
        net, v_, f_, tile=(4, 4), tile_pad=2, mesh=mesh_tiles))(nv, frames)
    _shards_match(got, ref, atol=1e-5)
    print("tile sharding ok")

    # --- FaceEnhancer(bg_mesh=...) full chunk program -----------------
    # (compare the jitted impl per shard; .enhance()'s np.asarray of a
    # multi-device output is host-materialization, unsafe on this
    # backend but fine on real TPU hosts)
    from ghost_tpu.models.scrfd import SCRFD
    from ghost_tpu.models.sr.gfpgan import GFPGANClean
    from ghost_tpu.pipeline.enhance import FaceEnhancer

    key = jax.random.key(0)
    det = SCRFD()
    det_vars = det.init(key, jnp.zeros((1, 128, 128, 3)))
    gfp = GFPGANClean(out_size=64, num_style_feat=32,
                      channel_multiplier=2, num_mlp=2, narrow=0.25)
    gfp_vars = gfp.init(key, jnp.zeros((1, 64, 64, 3)))
    bgn = RRDBNet(num_feat=8, num_block=1, num_grow_ch=4, scale=4)
    bg_vars = bgn.init(key, jnp.zeros((1, 16, 16, 3)))
    frames_u8 = jnp.asarray(
        rng.integers(0, 255, (2, 96, 128, 3)).astype(np.uint8))

    kw = dict(det_size=128, max_faces=1, crop_size=64,
              bg_tile=(48, 32), bg_tile_pad=4)
    enh0 = FaceEnhancer((det, det_vars), (gfp, gfp_vars), (bgn, bg_vars),
                        **kw)
    ref = np.asarray(enh0._enhance_j(enh0._vars, frames_u8, use_bg=True))
    enh1 = FaceEnhancer((det, det_vars), (gfp, gfp_vars), (bgn, bg_vars),
                        bg_mesh=mesh_tiles, **kw)
    got = enh1._enhance_j(enh1._vars, frames_u8, use_bg=True)
    for sh in got.addressable_shards:
        diff = np.abs(np.asarray(sh.data).astype(np.int32)
                      - ref[sh.index].astype(np.int32))
        assert diff.max() <= 1, diff.max()  # u8 rounding at shard joins

    # _to_host assembles the same sharded output per shard (the path
    # FaceEnhancer.enhance takes when bg_mesh is set)
    from ghost_tpu.pipeline.enhance import _to_host

    buf = _to_host(got)
    assert buf.shape == ref.shape and buf.dtype == ref.dtype
    assert np.abs(buf.astype(np.int32) - ref.astype(np.int32)).max() <= 1
    print("P2D-OK")


if __name__ == "__main__":
    _run()
