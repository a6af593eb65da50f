"""End-to-end swap pipeline smoke test (tiny models, CPU).

Covers BASELINE configs 1-3 structurally: image swap, multi-face
batched swap, chunked video swap with smoothing and paste-back.
Random weights: asserts shapes, dtype, in-range output, and that the
blend actually modifies only face regions when present, and nothing
when absent.
"""

import numpy as np
import pytest

from ghost_tpu.core.precision import FULL_PRECISION
from ghost_tpu.pipeline.swap import SwapConfig, build_random_pipeline


@pytest.fixture(scope="module")
def pipe():
    cfg = SwapConfig(det_size=320, chunk_size=2, max_faces=4, crop_size=224)
    return build_random_pipeline(cfg, policy=FULL_PRECISION,
                                 arcface_layers=(1, 1, 1, 1))


def test_video_swap_shapes_and_dtype(pipe, rng):
    frames = rng.integers(0, 255, (3, 256, 320, 3), dtype=np.uint8)
    sources = rng.integers(0, 255, (1, 224, 224, 3), dtype=np.uint8)
    targets = rng.integers(0, 255, (1, 224, 224, 3), dtype=np.uint8)
    out = pipe.swap_video_frames(frames, sources, targets)
    assert out.shape == frames.shape
    assert out.dtype == np.uint8


def test_image_swap(pipe, rng):
    frame = rng.integers(0, 255, (256, 320, 3), dtype=np.uint8)
    sources = rng.integers(0, 255, (1, 224, 224, 3), dtype=np.uint8)
    out = pipe.swap_image(frame, sources, None)
    assert out.shape == frame.shape


def test_crop_faces_contract(pipe, rng):
    img = rng.integers(0, 255, (256, 320, 3), dtype=np.uint8)
    crops, scores = pipe.crop_faces(img)
    assert scores.shape == (4,)
    if crops.shape[0]:
        assert crops.shape[1:] == (224, 224, 3)


def test_absent_faces_pass_through(pipe, rng):
    """With an impossible similarity threshold nothing may change."""
    frames = rng.integers(0, 255, (2, 256, 320, 3), dtype=np.uint8)
    sources = rng.integers(0, 255, (1, 224, 224, 3), dtype=np.uint8)
    targets = rng.integers(0, 255, (1, 224, 224, 3), dtype=np.uint8)
    import dataclasses

    strict = dataclasses.replace(pipe.cfg, similarity_th=2.0)  # cos sim <= 1
    old = pipe.cfg
    try:
        pipe.cfg = strict
        out = pipe.swap_video_frames(frames, sources, targets)
    finally:
        pipe.cfg = old
    np.testing.assert_array_equal(out, frames)


def test_fused_image_swap_matches_two_stage():
    """swap_image_fused (one device program, on-device per-face mask
    params) must reproduce the two-stage swap_image exactly on a single
    image."""
    import numpy as np

    from ghost_tpu.pipeline.swap import SwapConfig, build_random_pipeline

    rng = np.random.default_rng(0)
    cfg = SwapConfig(chunk_size=2, max_faces=2, crop_size=224)
    pipe = build_random_pipeline(cfg, seed=0)
    frame = rng.integers(0, 255, (160, 200, 3), dtype=np.uint8)
    sources = rng.integers(0, 255, (1, 224, 224, 3), dtype=np.uint8)

    two_stage = pipe.swap_image(frame, sources, None)
    fused = pipe.swap_image_fused(frame, sources, None)
    assert fused.shape == frame.shape and fused.dtype == np.uint8
    np.testing.assert_array_equal(fused, two_stage)
