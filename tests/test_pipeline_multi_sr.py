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


def test_srvgg_student_seat_contract(rng):
    """The distilled-student SR seat (models/sr/srvgg.SRVGGStudentSeat,
    the cli --sr_model srvgg_student serving path): hyperparams are
    inferred back off the checkpoint tree, the seat maps [-1,1] crops
    to [-1,1] at the SAME resolution via downscale->student->clip, and
    a crop size not divisible by the student's factor raises."""
    from ghost_tpu.models.sr.srvgg import (SRVGGNetCompact,
                                           SRVGGStudentSeat,
                                           srvgg_from_variables)
    from ghost_tpu.nn.layers import resize

    student = SRVGGNetCompact(num_feat=8, num_conv=2, upscale=2,
                              policy=FULL_PRECISION)
    s_vars = student.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))

    # checkpoint-shape inference round-trips the hyperparameters
    rebuilt = srvgg_from_variables(s_vars, policy=FULL_PRECISION)
    assert (rebuilt.num_feat, rebuilt.num_conv, rebuilt.upscale) == (8, 2, 2)

    seat = SRVGGStudentSeat(student)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 3)), jnp.float32)
    y = seat.apply(s_vars, x)
    assert y.shape == x.shape
    assert float(jnp.min(y)) >= -1.0 and float(jnp.max(y)) <= 1.0

    # the seat IS the documented composition
    ref = jnp.clip(student.apply(
        s_vars, resize(x * 0.5 + 0.5, (8, 8), method="area")),
        0.0, 1.0) * 2.0 - 1.0
    assert float(jnp.max(jnp.abs(y - ref))) == 0.0

    with pytest.raises(ValueError):
        seat.apply(s_vars, jnp.zeros((1, 15, 15, 3)))

    # a non-student tree is rejected, not mis-inferred
    with pytest.raises((ValueError, KeyError)):
        srvgg_from_variables({"params": {"conv_0": s_vars["params"]["conv_0"],
                                         "conv_last": {"Conv_0": {
                                             "kernel": jnp.zeros((3, 3, 8, 7))
                                         }}}})


def test_multi_identity_srvgg_student_video(rng):
    """End-to-end video swap with the student seat mounted as the SR
    pair — the config-4 serving alternative runs through the production
    pipeline (BENCH_EXTRA_r04 measured this construct at full width)."""
    from ghost_tpu.models.sr.srvgg import SRVGGNetCompact, SRVGGStudentSeat

    cfg = SwapConfig(det_size=320, chunk_size=2, max_faces=4, use_sr=True)
    base = build_random_pipeline(cfg, policy=FULL_PRECISION,
                                 arcface_layers=(1, 1, 1, 1))
    student = SRVGGNetCompact(num_feat=8, num_conv=2, upscale=2,
                              policy=FULL_PRECISION)
    s_vars = student.init(jax.random.key(1), jnp.zeros((1, 128, 128, 3)))
    pipe = SwapPipeline(
        (base.det_mod, base.det_vars),
        (base.arc_mod, base.arc_vars),
        (base.gen_mod, base.gen_vars),
        (base.lmk_mod, base.lmk_vars),
        sr=(SRVGGStudentSeat(student), s_vars),
        config=cfg,
    )
    frames = rng.integers(0, 255, (2, 256, 320, 3), dtype=np.uint8)
    sources = rng.integers(0, 255, (2, 224, 224, 3), dtype=np.uint8)
    targets = rng.integers(0, 255, (2, 224, 224, 3), dtype=np.uint8)
    out = pipe.swap_video_frames(frames, sources, targets)
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
