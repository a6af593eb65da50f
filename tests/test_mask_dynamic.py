"""Dynamic-parameter soft mask: traced params match the static version."""

import jax
import jax.numpy as jnp
import numpy as np

from ghost_tpu.ops.mask import (
    mask_offset_from_landmarks,
    mask_params_from_offset,
    soft_face_mask,
    soft_face_mask_dynamic,
)


def circle_landmarks(r=60.0, c=112.0):
    th = np.linspace(0, 2 * np.pi, 106, endpoint=False)
    return np.stack([c + r * np.cos(th), c + r * np.sin(th)], axis=1)


def test_dynamic_matches_static():
    lm = jnp.asarray(circle_landmarks(), jnp.float32)
    static = np.asarray(soft_face_mask(lm, 224, erode=5.0, sigma_x=5.0,
                                       sigma_y=5.0, eyebrow_mod=0.0))
    dynamic = np.asarray(soft_face_mask_dynamic(
        lm, 224, erode=jnp.float32(5.0), sigma_x=jnp.float32(5.0),
        sigma_y=jnp.float32(5.0), eyebrow_mod=jnp.float32(0.0)))
    # static uses cv2-rule kernel radius (4*sigma), dynamic a fixed wide
    # support; difference is tail truncation only
    assert np.abs(static - dynamic).max() < 0.02


def test_dynamic_params_traced_no_retrace():
    lm = jnp.asarray(circle_landmarks(), jnp.float32)
    traces = []

    @jax.jit
    def f(lm, erode, sx, sy, mod):
        traces.append(1)
        return soft_face_mask_dynamic(lm, 224, erode, sx, sy, mod)

    for params in [(5.0, 5.0, 5.0, 2.0), (15.0, 15.0, 10.0, 2.7),
                   (-5.0, 5.0, 10.0, 0.5)]:
        out = f(lm, *[jnp.float32(p) for p in params])
        assert np.isfinite(np.asarray(out)).all()
    assert len(traces) == 1  # one trace across all parameter sets


def test_offset_statistic_and_selection():
    lm_swap = circle_landmarks()
    lm_tgt = circle_landmarks()
    lm_swap[[1, 2, 13], 0] += 3.0  # push left stats positive
    off = float(mask_offset_from_landmarks(jnp.asarray(lm_swap),
                                           jnp.asarray(lm_tgt)))
    assert off > 6.0
    assert mask_params_from_offset(off) == (15.0, 15.0, 10.0, 2.7)
    assert mask_params_from_offset(0.0) == (5.0, 5.0, 5.0, 2.0)
    assert mask_params_from_offset(-5.0) == (-5.0, 5.0, 10.0, 0.5)


def test_pipeline_per_shot_params_no_retrace():
    """Stage B with per-shot params: traced (T,4) array switches values
    without retracing, returns the offset statistic, and the driver
    path (swap_video_frames with mask_per_shot) runs end to end."""
    import numpy as _np

    from ghost_tpu.pipeline.swap import SwapConfig, build_random_pipeline

    cfg = SwapConfig(chunk_size=2, max_faces=2, crop_size=224,
                     mask_per_shot=True)
    pipe = build_random_pipeline(cfg, seed=0)
    rng = _np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 255, (2, 128, 160, 3), dtype=_np.uint8))
    kps = jnp.asarray(
        rng.uniform(30, 100, (2, 1, 5, 2)).astype(_np.float32))
    present = jnp.ones((2, 1), bool)
    src = pipe.embed_sources(
        rng.integers(0, 255, (1, 224, 224, 3), dtype=_np.uint8))

    p1 = jnp.asarray([[5.0, 5.0, 5.0, 2.0]], jnp.float32)
    p2 = jnp.asarray([[15.0, 15.0, 10.0, 2.7]], jnp.float32)
    out1, off1 = pipe._swap_blend(frames, kps, present, src, p1,
                                  probe=True)
    n_traces = pipe._swap_blend_j._cache_size()
    out2, off2 = pipe._swap_blend(frames, kps, present, src, p2,
                                  probe=True)
    assert pipe._swap_blend_j._cache_size() == n_traces  # no retrace
    assert out1.shape == frames.shape and out1.dtype == jnp.uint8
    assert off1.shape == (2, 1)
    assert _np.allclose(_np.asarray(off1), _np.asarray(off2))

    # driver end to end (probe + reprocess)
    res = pipe.swap_video_frames(
        _np.asarray(frames),
        _np.asarray(rng.integers(0, 255, (1, 224, 224, 3), dtype=_np.uint8)),
        None, smooth=False)
    assert res.shape == frames.shape


def test_mask_params_traced_matches_host():
    """mask_params_from_offset_traced is the single on-device source for
    the fused program's "auto" param selection (pipeline/swap.py uses it
    in both the batched and lane-skip bodies); it must match the host
    threshold table exactly, including at the boundaries."""
    from ghost_tpu.ops.mask import mask_params_from_offset_traced

    for off in (-5.0, -3.0, -2.9, 0.0, 3.0, 3.1, 4.5, 6.0, 6.1, 7.2):
        host = np.asarray(mask_params_from_offset(off), np.float32)
        traced = np.asarray(
            mask_params_from_offset_traced(jnp.asarray(off, jnp.float32)))
        assert np.array_equal(host, traced), off
