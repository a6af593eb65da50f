"""Streaming swap path vs the in-RAM path.

The constant-memory generator (SwapPipeline.swap_video_stream over
data.frames.stream_video_chunks) must produce EXACTLY the frames of
swap_video_frames on the same video: the windowed lag-1 smoothing with
2-frame context tails is algebraically identical to full-video
smoothing for the reference's +-2-frame window, and the per-shot mask
probe fires on chunk 0 in both paths.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _make_video(path, n=5, h=96, w=128, fps=10):
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps,
                         (w, h))
    for i in range(n):
        f = np.roll(base, i * 3, axis=1)
        wr.write(f)
    wr.release()


def test_stream_matches_in_ram(tmp_path):
    from ghost_tpu.data.frames import stream_video_chunks
    from ghost_tpu.pipeline.swap import SwapConfig, build_random_pipeline
    from ghost_tpu.pipeline.video import read_video

    path = tmp_path / "in.mp4"
    _make_video(path, n=5)

    cfg = SwapConfig(chunk_size=2, max_faces=2, crop_size=224)
    pipe = build_random_pipeline(cfg, seed=0)
    rng = np.random.default_rng(1)
    sources = rng.integers(0, 255, (1, 224, 224, 3), dtype=np.uint8)

    frames, _fps = read_video(str(path))
    ref = pipe.swap_video_frames(frames, sources, None)

    outs = list(pipe.swap_video_stream(
        stream_video_chunks(str(path), cfg.chunk_size), sources, None))
    got = np.concatenate(outs, axis=0)
    assert got.shape == ref.shape == frames.shape
    np.testing.assert_array_equal(got, ref)


def test_stream_video_chunks_yields_all_frames(tmp_path):
    from ghost_tpu.data.frames import stream_video_chunks

    path = tmp_path / "in.mp4"
    _make_video(path, n=7)
    chunks = list(stream_video_chunks(str(path), 3))
    assert [c.shape[0] for c in chunks] == [3, 3, 1]
    assert all(c.dtype == np.uint8 for c in chunks)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
