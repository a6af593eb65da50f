"""Per-target lane-skip in stage B (SwapConfig.lane_skip).

Reference parity: the reference's swap loop runs only over DETECTED
identities (reference utils/inference/core.py:72-74), so an identity
absent from the video costs nothing. The lane-skip body restores that
on the fused TPU path. Contract tested here:

  1. all-present chunks are BIT-IDENTICAL to the all-lanes-batched body
     (lane_skip=False) under the production bf16 policy;
  2. a lane absent across the whole chunk contributes nothing: the T=2
     output with lane 1 absent equals the T=1 output on lane 0 alone;
  3. the probe path (mask-offset statistic) matches on present lanes;
  4. the contract holds with the SR seat in the loop (config 4).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ghost_tpu.core.precision import DEFAULT_POLICY, FULL_PRECISION
from ghost_tpu.pipeline.swap import SwapConfig, SwapPipeline, build_random_pipeline


def _mk_pipes(use_sr=False, **kw):
    cfg_l = SwapConfig(det_size=320, chunk_size=4, max_faces=4,
                       lane_skip=True, use_sr=use_sr, **kw)
    cfg_b = SwapConfig(det_size=320, chunk_size=4, max_faces=4,
                       lane_skip=False, use_sr=use_sr, **kw)
    base = build_random_pipeline(cfg_l, policy=DEFAULT_POLICY,
                                 arcface_layers=(1, 1, 1, 1))
    sr = None
    if use_sr:
        from ghost_tpu.models.sr.generator import LIPSPADEGenerator

        sr_mod = LIPSPADEGenerator(ngf=4, policy=FULL_PRECISION)
        sr_vars = sr_mod.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)))
        sr = (sr_mod, sr_vars)
    models = [(base.det_mod, base.det_vars), (base.arc_mod, base.arc_vars),
              (base.gen_mod, base.gen_vars), (base.lmk_mod, base.lmk_vars)]
    return (SwapPipeline(*models, sr=sr, config=cfg_l),
            SwapPipeline(*models, sr=sr, config=cfg_b))


def _inputs(rng, b=4, t=2, h=256, w=320):
    frames = jnp.asarray(
        rng.integers(0, 255, (b, h, w, 3), dtype=np.uint8))
    # plausible in-frame 5-pt faces: jittered around a template
    base = np.array([[120, 100], [180, 100], [150, 140],
                     [125, 180], [175, 180]], np.float32)
    kps = base[None, None] + rng.normal(0, 4, (b, t, 5, 2)).astype(np.float32)
    kps[:, 1] += np.array([40.0, -20.0], np.float32)  # offset lane 1
    src = jnp.asarray(rng.normal(0, 1, (t, 512)).astype(np.float32))
    return frames, jnp.asarray(kps), src


def test_lane_skip_all_present_bitmatch(rng):
    pipe_l, pipe_b = _mk_pipes()
    frames, kps, src = _inputs(rng)
    present = jnp.ones((4, 2), bool)
    mp = jnp.asarray([[5.0, 5.0, 5.0, 2.0], [10.0, 10.0, 8.0, 2.0]],
                     jnp.float32)
    out_l = np.asarray(pipe_l._swap_blend(frames, kps, present, src, mp))
    out_b = np.asarray(pipe_b._swap_blend(frames, kps, present, src, mp))
    assert out_l.dtype == np.uint8
    np.testing.assert_array_equal(out_l, out_b)


def test_lane_skip_absent_lane_equals_t1(rng):
    pipe_l, _ = _mk_pipes()
    frames, kps, src = _inputs(rng)
    present2 = jnp.asarray(np.array([[True, False]] * 4))
    mp = jnp.asarray([[5.0, 5.0, 5.0, 2.0], [5.0, 5.0, 5.0, 2.0]],
                     jnp.float32)
    out2 = np.asarray(pipe_l._swap_blend(frames, kps, present2, src, mp))
    out1 = np.asarray(pipe_l._swap_blend(
        frames, kps[:, :1], jnp.ones((4, 1), bool), src[:1], mp[:1]))
    np.testing.assert_array_equal(out2, out1)


def test_lane_skip_probe_offsets_match(rng):
    pipe_l, pipe_b = _mk_pipes()
    frames, kps, src = _inputs(rng)
    present = jnp.ones((4, 2), bool)
    mp = jnp.asarray([[5.0, 5.0, 5.0, 2.0], [5.0, 5.0, 5.0, 2.0]],
                     jnp.float32)
    out_l, offs_l = pipe_l._swap_blend(frames, kps, present, src, mp,
                                       probe=True)
    out_b, offs_b = pipe_b._swap_blend(frames, kps, present, src, mp,
                                       probe=True)
    np.testing.assert_array_equal(np.asarray(out_l), np.asarray(out_b))
    np.testing.assert_allclose(np.asarray(offs_l), np.asarray(offs_b),
                               atol=0, rtol=0)


def test_lane_skip_with_sr_bitmatch(rng):
    pipe_l, pipe_b = _mk_pipes(use_sr=True)
    frames, kps, src = _inputs(rng)
    present = jnp.ones((4, 2), bool)
    mp = jnp.asarray([[5.0, 5.0, 5.0, 2.0], [5.0, 5.0, 5.0, 2.0]],
                     jnp.float32)
    out_l = np.asarray(pipe_l._swap_blend(frames, kps, present, src, mp))
    out_b = np.asarray(pipe_b._swap_blend(frames, kps, present, src, mp))
    np.testing.assert_array_equal(out_l, out_b)

    # absent SR lane: identical skip contract through the SR seat
    present2 = jnp.asarray(np.array([[True, False]] * 4))
    out2 = np.asarray(pipe_l._swap_blend(frames, kps, present2, src, mp))
    out1 = np.asarray(pipe_l._swap_blend(
        frames, kps[:, :1], jnp.ones((4, 1), bool), src[:1], mp[:1]))
    np.testing.assert_array_equal(out2, out1)


def test_present_override_fused(rng):
    """The fused program's present_override measurement hook
    (scripts/bench_extra_r05.py): overriding every lane present must
    equal the similarity_th=-2 forced-all-present trace, and an
    all-False override must leave the frames untouched. Exercises the
    grouped (lax.map) path: chunk 4, fused_group 2."""
    import jax.numpy as jnp

    cfg_kw = dict(fused_group=2)  # chunk is 4 in _mk_pipes → 2 groups
    pipe_th, _ = _mk_pipes(similarity_th=-2.0, **cfg_kw)
    pipe_d, _ = _mk_pipes(**cfg_kw)  # default th (noise never clears it)
    frames = jnp.asarray(
        rng.integers(0, 255, (4, 256, 320, 3), dtype=np.uint8))
    src = jnp.asarray(rng.normal(0, 1, (2, 512)).astype(np.float32))
    tgt = src / jnp.linalg.norm(src, axis=-1, keepdims=True)
    mp = jnp.asarray([[5.0, 5.0, 5.0, 2.0]] * 2, jnp.float32)

    ref = np.asarray(pipe_th._detect_swap(frames, tgt, src, mp, True))
    ov = jnp.ones((4, 2), bool)
    out = np.asarray(pipe_d._detect_swap(frames, tgt, src, mp, True, ov))
    np.testing.assert_array_equal(out, ref)

    none_ov = jnp.zeros((4, 2), bool)
    out0 = np.asarray(pipe_d._detect_swap(frames, tgt, src, mp, True,
                                          none_ov))
    np.testing.assert_array_equal(out0, np.asarray(frames))


def test_lane_skip_fused_video_end_to_end(rng):
    """The fused no-smooth video path (the bench program) with
    lane_skip on: runs, preserves shape/dtype, and matches the batched
    config frame-for-frame when every lane is forced present
    (similarity_th=-2 — the config-4 settlement methodology)."""
    pipe_l, pipe_b = _mk_pipes(similarity_th=-2.0)
    frames = rng.integers(0, 255, (4, 256, 320, 3), dtype=np.uint8)
    sources = rng.integers(0, 255, (2, 224, 224, 3), dtype=np.uint8)
    targets = rng.integers(0, 255, (2, 224, 224, 3), dtype=np.uint8)
    out_l = pipe_l.swap_video_frames(frames, sources, targets, smooth=False)
    out_b = pipe_b.swap_video_frames(frames, sources, targets, smooth=False)
    assert out_l.shape == frames.shape and out_l.dtype == np.uint8
    np.testing.assert_array_equal(out_l, out_b)
