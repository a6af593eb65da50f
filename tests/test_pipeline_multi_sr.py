"""Config-4 coverage: multi-identity video swap with the SR generator
in the loop (reference inference.py --use_sr + multiple sources)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ghost_tpu.core.precision import FULL_PRECISION
from ghost_tpu.models.sr.generator import LIPSPADEGenerator
from ghost_tpu.pipeline.swap import SwapConfig, SwapPipeline, build_random_pipeline


@pytest.fixture(scope="module")
def sr_pipe():
    cfg = SwapConfig(det_size=320, chunk_size=2, max_faces=4, use_sr=True)
    base = build_random_pipeline(cfg, policy=FULL_PRECISION,
                                 arcface_layers=(1, 1, 1, 1))
    sr_mod = LIPSPADEGenerator(ngf=4, policy=FULL_PRECISION)
    sr_vars = sr_mod.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)))
    return SwapPipeline(
        (base.det_mod, base.det_vars),
        (base.arc_mod, base.arc_vars),
        (base.gen_mod, base.gen_vars),
        (base.lmk_mod, base.lmk_vars),
        sr=(sr_mod, sr_vars),
        config=cfg,
    )


def test_multi_identity_sr_video(sr_pipe, rng):
    frames = rng.integers(0, 255, (2, 256, 320, 3), dtype=np.uint8)
    sources = rng.integers(0, 255, (2, 224, 224, 3), dtype=np.uint8)
    targets = rng.integers(0, 255, (2, 224, 224, 3), dtype=np.uint8)
    out = sr_pipe.swap_video_frames(frames, sources, targets)
    assert out.shape == frames.shape
    assert out.dtype == np.uint8


class _IdentitySR:
    """SR seat returning its [-1,1] input unchanged."""

    def apply(self, variables, x):
        return x


class _ShiftSR:
    """SR seat darkening its input by 0.5 in [-1,1] (~64 gray levels):
    any pasted pixel it touches moves visibly."""

    def apply(self, variables, x):
        import jax.numpy as jnp

        return jnp.clip(x - 0.5, -1.0, 1.0)


def test_sr_lane_skip_semantics(rng):
    """The per-target-lane SR cond skip (pipeline/swap.py sr_lane) must
    be semantically transparent: with an IDENTITY SR seat the full
    video-swap output matches the sr=None pipeline (up to the f32
    normalize round-trip inside the SR wrapper and the final u8
    rounding), while a visibly shifted SR seat changes the pasted face
    region — proving the lax.cond takes the live branch on present
    lanes rather than skipping everywhere. Detection + landmark
    templates (utils/face_template) give the random-weight detector and
    mask real geometry so the paste-back actually runs.

    reference: the unconditional per-frame SR at
    utils/inference/video_processing.py:263-285 — the skip is our
    absent-lane optimization; present lanes must reproduce it."""
    from ghost_tpu.models.aei import AEINet
    from ghost_tpu.models.arcface import IResNet
    from ghost_tpu.models.landmark import Landmark106
    from ghost_tpu.models.scrfd import SCRFD
    from ghost_tpu.utils.face_template import (inject_detection_template,
                                               inject_landmark_template)

    cfg = SwapConfig(det_size=320, chunk_size=2, max_faces=4, use_sr=True,
                     det_thresh=0.5)
    key = jax.random.key(0)
    det = SCRFD(policy=FULL_PRECISION)
    det_vars = inject_detection_template(
        det.init(key, jnp.zeros((1, 320, 320, 3))))
    arc = IResNet(layers=(1, 1, 1, 1), policy=FULL_PRECISION)
    arc_vars = arc.init(key, jnp.zeros((1, 112, 112, 3)))
    gen = AEINet(backbone="unet", num_blocks=2, width=1.0 / 8,
                 policy=FULL_PRECISION)
    gen_vars = gen.init(key, jnp.zeros((1, 256, 256, 3)),
                        jnp.zeros((1, 512)))
    lmk = Landmark106(policy=FULL_PRECISION)
    lmk_vars = inject_landmark_template(
        lmk.init(key, jnp.zeros((1, 192, 192, 3))))

    def mk(sr):
        return SwapPipeline((det, det_vars), (arc, arc_vars),
                            (gen, gen_vars), (lmk, lmk_vars), sr=sr,
                            config=cfg)

    frames = rng.integers(0, 255, (2, 256, 320, 3), dtype=np.uint8)
    sources = rng.integers(0, 255, (2, 224, 224, 3), dtype=np.uint8)
    targets = rng.integers(0, 255, (2, 224, 224, 3), dtype=np.uint8)

    out_none = mk(None).swap_video_frames(frames, sources, targets,
                                          smooth=False)
    out_id = mk((_IdentitySR(), {})).swap_video_frames(
        frames, sources, targets, smooth=False)
    out_shift = mk((_ShiftSR(), {})).swap_video_frames(
        frames, sources, targets, smooth=False)

    # identity seat: transparent (u8 rounding of the f32 round-trip)
    d_id = np.abs(out_id.astype(np.int32) - out_none.astype(np.int32))
    assert d_id.max() <= 1, d_id.max()

    # shifted seat: the live branch ran on present lanes — some pasted
    # pixels move by a large fraction of the 64-level shift
    d_shift = np.abs(out_shift.astype(np.int32) - out_none.astype(np.int32))
    assert d_shift.max() >= 16, d_shift.max()
    assert (d_shift >= 8).sum() > 100, (d_shift >= 8).sum()
