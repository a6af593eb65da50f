"""Per-shot mask params derive at each target's FIRST present frame.

The reference caches mask params from the first frame where the face
appears (video_processing.py:204,218-223) — not necessarily frame 0.
The drivers must probe the chunk holding each target's first presence
(and only that one), and the streaming no-smooth path must switch to
the fused program once every target is probed.
"""

import jax.numpy as jnp
import numpy as np

from ghost_tpu.pipeline.swap import SwapConfig, build_random_pipeline


def _pipe(chunk=2):
    cfg = SwapConfig(chunk_size=chunk, max_faces=2, crop_size=224,
                     match_faces=2, gen_groups=1, mask_per_shot=True)
    return build_random_pipeline(cfg, seed=0)


def _fake_detect(pipe, present_per_frame):
    """Replace stage A: deterministic kps, presence by schedule."""
    sched = np.asarray(present_per_frame, bool)  # (N,) one target

    state = {"cursor": 0}

    def fake(frames_u8, target_embeds):
        b = frames_u8.shape[0]
        i0 = state["cursor"]
        state["cursor"] += b
        idx = np.clip(np.arange(i0, i0 + b), 0, len(sched) - 1)
        pres = sched[idx]
        kps = np.tile(
            np.asarray([[40., 40.], [80., 40.], [60., 60.], [45., 85.],
                        [75., 85.]], np.float32)[None, None], (b, 1, 1, 1))
        sim = np.where(pres, 0.9, -1.0).astype(np.float32)[:, None]
        scores = np.where(pres, 0.9, 0.0).astype(np.float32)[:, None]
        scores = np.concatenate(
            [scores, np.zeros((b, 1), np.float32)], axis=1)
        return (jnp.asarray(kps), jnp.asarray(sim), jnp.asarray(scores),
                jnp.asarray(np.tile(kps, (1, 2, 1, 1))))

    pipe._detect_match = fake
    return state


def _count_probes(pipe):
    calls = {"probe": 0, "steady": 0, "fused": 0, "probe_chunks": []}
    orig_blend = pipe._swap_blend
    orig_fused = pipe._detect_swap

    def blend(frames, kps, present, src, mask_params=None, probe=False):
        if probe:
            calls["probe"] += 1
            calls["probe_chunks"].append(np.asarray(frames).shape[0])
        else:
            calls["steady"] += 1
        return orig_blend(frames, kps, present, src, mask_params, probe)

    def fused(frames, tgt, src, mask_params=None, match_targets=True):
        calls["fused"] += 1
        return orig_fused(frames, tgt, src, mask_params, match_targets)

    pipe._swap_blend = blend
    pipe._detect_swap = fused
    return calls


def test_batch_probe_fires_on_first_presence_chunk():
    pipe = _pipe(chunk=2)
    _fake_detect(pipe, [False, False, True, True])  # appears in chunk 1
    calls = _count_probes(pipe)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (4, 128, 160, 3), dtype=np.uint8)
    src = rng.integers(0, 255, (1, 224, 224, 3), dtype=np.uint8)
    out = pipe.swap_video_frames(frames, src, src, smooth=False)
    assert out.shape == frames.shape
    assert calls["probe"] == 1  # exactly one probe, on chunk 1


def test_stream_no_smooth_switches_to_fused_after_probe():
    pipe = _pipe(chunk=2)
    state = _fake_detect(pipe, [False, False, True, True, True, True])
    calls = _count_probes(pipe)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (6, 128, 160, 3), dtype=np.uint8)
    src = rng.integers(0, 255, (1, 224, 224, 3), dtype=np.uint8)

    outs = list(pipe.swap_video_stream(
        iter([frames[0:2], frames[2:4], frames[4:6]]), src, src,
        smooth=False))
    assert sum(o.shape[0] for o in outs) == 6
    # chunk 0: split, no presence -> no probe; chunk 1: split + probe;
    # chunk 2: fused
    assert calls["probe"] == 1
    assert calls["fused"] == 1


def test_never_present_target_keeps_defaults_no_probe():
    pipe = _pipe(chunk=2)
    _fake_detect(pipe, [False, False])
    calls = _count_probes(pipe)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (2, 128, 160, 3), dtype=np.uint8)
    src = rng.integers(0, 255, (1, 224, 224, 3), dtype=np.uint8)
    out = pipe.swap_video_frames(frames, src, src, smooth=False)
    assert out.shape == frames.shape
    assert calls["probe"] == 0


def test_stream_smooth_probes_at_first_presence():
    """Smooth streaming shares the same per-target probe logic inside
    run_b: one probe at the chunk holding the first present frame."""
    pipe = _pipe(chunk=2)
    _fake_detect(pipe, [False, False, True, True, True, True])
    calls = _count_probes(pipe)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (6, 128, 160, 3), dtype=np.uint8)
    src = rng.integers(0, 255, (1, 224, 224, 3), dtype=np.uint8)

    outs = list(pipe.swap_video_stream(
        iter([frames[0:2], frames[2:4], frames[4:6]]), src, src,
        smooth=True))
    assert sum(o.shape[0] for o in outs) == 6
    assert calls["probe"] == 1
    assert calls["fused"] == 0  # smoothing keeps the two-stage path
