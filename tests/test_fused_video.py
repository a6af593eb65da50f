"""Fused steady-state video program vs the split two-stage path.

The fused detect->match->swap->blend program (one dispatch per chunk,
SwapPipeline._detect_swap) must reproduce the split stage A + stage B
path exactly, grouped or not; and the steady-state single-landmark-pass
stage B (probe=False) must blend identically to the probe variant run
with the same mask params (the reference only landmarks the target crop
while params are unset, video_processing.py:218-223; with cached params
face_mask_static never reads landmarks_tgt, masks.py:65-67).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from ghost_tpu.pipeline.swap import SwapConfig, build_random_pipeline


def _setup(chunk=4, fused_group=0, gen_groups=1):
    cfg = SwapConfig(chunk_size=chunk, max_faces=2, crop_size=224,
                     match_faces=2, gen_groups=gen_groups,
                     fused_group=fused_group, mask_per_shot=True)
    pipe = build_random_pipeline(cfg, seed=0)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 255, (chunk, 128, 160, 3), dtype=np.uint8))
    src_u8 = rng.integers(0, 255, (1, 224, 224, 3), dtype=np.uint8)
    src = pipe.embed_sources(src_u8)
    tgt = pipe.embed_targets(src_u8)
    params = jnp.asarray([[10.0, 10.0, 8.0, 2.0]], jnp.float32)
    return pipe, frames, src, tgt, params


def test_steady_state_matches_probe_blend():
    pipe, frames, src, tgt, params = _setup()
    kps, sim, scores, raw = pipe._detect_match(frames, tgt)
    present = jnp.ones((frames.shape[0], 1), bool)
    out_probe, offs = pipe._swap_blend(frames, kps, present, src, params,
                                       probe=True)
    out_steady = pipe._swap_blend(frames, kps, present, src, params)
    assert not isinstance(out_steady, tuple)
    assert offs.shape == (frames.shape[0], 1)
    # same params -> same mask -> same blend; the only difference is the
    # dropped second landmark pass (batch-size change in the landmark
    # net is deterministic per-sample)
    np.testing.assert_array_equal(np.asarray(out_probe),
                                  np.asarray(out_steady))


def test_fused_program_matches_split_stages():
    pipe, frames, src, tgt, params = _setup()
    kps, sim, scores, raw = pipe._detect_match(frames, tgt)
    present = sim > pipe.cfg.similarity_th
    split = pipe._swap_blend(frames, kps, present, src, params)
    fused = pipe._detect_swap(frames, tgt, src, params)
    np.testing.assert_array_equal(np.asarray(split), np.asarray(fused))

    # no-target selection branch (reference set_target=False semantics)
    kps2 = raw[:, :1]
    present2 = scores[:, :1] > 0.0
    split2 = pipe._swap_blend(frames, kps2, present2, src, params)
    fused2 = pipe._detect_swap(frames, tgt, src, params,
                               match_targets=False)
    np.testing.assert_array_equal(np.asarray(split2), np.asarray(fused2))


def test_fused_grouping_invariant():
    pipe, frames, src, tgt, params = _setup(chunk=4, fused_group=0)
    whole = pipe._detect_swap(frames, tgt, src, params)
    pipe_g, *_ = _setup(chunk=4, fused_group=2)
    grouped = pipe_g._detect_swap(frames, tgt, src, params)
    np.testing.assert_array_equal(np.asarray(whole), np.asarray(grouped))


def test_stream_no_smooth_uses_fused_and_matches_batch():
    pipe, frames, src, tgt, params = _setup(chunk=2)
    frames_np = np.asarray(
        np.random.default_rng(1).integers(0, 255, (5, 128, 160, 3),
                                          dtype=np.uint8))
    src_u8 = np.asarray(
        np.random.default_rng(0).integers(0, 255, (1, 224, 224, 3),
                                          dtype=np.uint8))
    batch = pipe.swap_video_frames(frames_np, src_u8, None, smooth=False)

    def chunks():
        for i in range(0, 5, 2):
            yield frames_np[i:i + 2]

    stream = np.concatenate(
        list(pipe.swap_video_stream(chunks(), src_u8, None, smooth=False)),
        axis=0)
    np.testing.assert_array_equal(batch, stream)


def test_stream_no_smooth_static_mask_params():
    """mask_per_shot=False: every chunk rides the fused program with the
    compile-time mask params (no probe dispatches at all)."""
    cfg = SwapConfig(chunk_size=2, max_faces=2, crop_size=224,
                     match_faces=2, gen_groups=1, mask_per_shot=False)
    pipe = build_random_pipeline(cfg, seed=0)
    rng = np.random.default_rng(2)
    frames_np = rng.integers(0, 255, (4, 128, 160, 3), dtype=np.uint8)
    src_u8 = rng.integers(0, 255, (1, 224, 224, 3), dtype=np.uint8)
    batch = pipe.swap_video_frames(frames_np, src_u8, None, smooth=False)
    stream = np.concatenate(
        list(pipe.swap_video_stream(iter([frames_np[:2], frames_np[2:]]),
                                    src_u8, None, smooth=False)), axis=0)
    np.testing.assert_array_equal(batch, stream)
