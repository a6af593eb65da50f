"""Video IO round trip + ArcMargin head + BGR augmentation."""

import numpy as np
import pytest


def test_video_write_read_roundtrip(tmp_path, rng):
    import cv2  # noqa: F401 - skip if absent

    from ghost_tpu.pipeline.video import iter_video_chunks, read_video, write_video

    # smooth content (lossy codecs destroy noise)
    ys = np.linspace(0, 255, 64)[:, None, None]
    xs = np.linspace(0, 255, 96)[None, :, None]
    base = np.broadcast_to(
        np.concatenate([ys + 0 * xs, 0 * ys + xs, (ys + xs) / 2], axis=2),
        (64, 96, 3),
    )
    frames = np.stack([
        np.clip(base + i * 3, 0, 255).astype(np.uint8) for i in range(12)
    ])
    path = str(tmp_path / "t.mp4")
    write_video(path, frames, fps=10.0)
    back, fps = read_video(path)
    assert fps == pytest.approx(10.0, rel=0.05)
    assert back.shape == frames.shape
    assert np.abs(back.astype(int) - frames.astype(int)).mean() < 8

    chunks = list(iter_video_chunks(path, chunk_size=5))
    assert [c.shape[0] for c in chunks] == [5, 5, 2]


def test_frame_ring_stream(tmp_path, rng):
    import cv2  # noqa: F401

    from ghost_tpu.data.frames import stream_video_chunks
    from ghost_tpu.pipeline.video import write_video

    frames = rng.integers(0, 255, (9, 32, 32, 3), dtype=np.uint8)
    path = str(tmp_path / "s.mp4")
    write_video(path, frames, fps=10.0)
    chunks = list(stream_video_chunks(path, chunk_size=4))
    assert sum(c.shape[0] for c in chunks) == 9


def test_arc_margin_head(rng):
    import jax
    import jax.numpy as jnp

    from ghost_tpu.train.arcface_margin import ArcMarginHead

    head = ArcMarginHead(num_classes=10, margin=0.5, scale=64.0)
    e = jnp.asarray(rng.standard_normal((4, 16), dtype=np.float32))
    labels = jnp.asarray([0, 3, 7, 9])
    variables = head.init(jax.random.key(0), e, labels)
    logits = head.apply(variables, e, labels)
    assert logits.shape == (4, 10)
    # the margin makes the target logit SMALLER than plain scaled cosine
    w = np.asarray(variables["params"]["weight"])
    wn = w / np.linalg.norm(w, axis=0, keepdims=True)
    en = np.asarray(e) / np.linalg.norm(np.asarray(e), axis=1, keepdims=True)
    cos = en @ wn
    for i, l in enumerate([0, 3, 7, 9]):
        assert logits[i, l] <= 64.0 * cos[i, l] + 1e-4


def test_bgr_augmentation(rng):
    import random

    from ghost_tpu.data.datasets import random_rgb_to_bgr

    img = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
    r = random.Random(0)
    out = random_rgb_to_bgr(img, r, probability=1.0)
    np.testing.assert_array_equal(out, img[:, :, ::-1])
    out2 = random_rgb_to_bgr(img, r, probability=0.0)
    np.testing.assert_array_equal(out2, img)
