"""Execute the SHIPPED seat-student checkpoint end-to-end.

assets/srvgg_student_x2_r05.msgpack is the trained serving-seat SR
student (scripts/train_student_seat_r05.py: SRVGGNetCompact 32f/16c x2
trained on the 658-video-crop + portrait corpus; held-out metrics in
docs/student_seat_r05.json). These tests prove the committed artifact —
not a session-local one — loads through the exact CLI path
(core.checkpoint.load_msgpack -> srvgg_from_variables ->
SRVGGStudentSeat, cli/inference.py load_pipeline) and actually restores:
it must beat bilinear upscaling on a degraded held-out image it never
trained on.

Reference counterpart: realesr-general-x4v3, the compact distilled
weight the reference serves (reference Dockerfile:65-68).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "assets", "srvgg_student_x2_r05.msgpack")
HELD_OUT_IMG = "/root/reference/examples/images/beckham.jpg"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="shipped seat checkpoint absent")

needs_reference = pytest.mark.skipif(
    not os.path.exists(HELD_OUT_IMG),
    reason="reference example images not mounted")


@pytest.fixture(scope="module")
def seat():
    from ghost_tpu.core.checkpoint import load_msgpack
    from ghost_tpu.core.precision import FULL_PRECISION
    from ghost_tpu.models.sr.srvgg import (SRVGGStudentSeat,
                                           srvgg_from_variables)

    variables = load_msgpack(CKPT)
    student = srvgg_from_variables(variables, policy=FULL_PRECISION)
    return SRVGGStudentSeat(student), variables, student


def test_cli_finds_bundled_checkpoint():
    from ghost_tpu.cli.inference import bundled_student_ckpt

    path = bundled_student_ckpt()
    assert path == CKPT  # --sr_model srvgg_student w/o --sr_path uses it


def test_checkpoint_infers_seat_config(seat):
    _, _, student = seat
    assert (student.num_feat, student.num_conv, student.upscale) == (
        32, 16, 2)


def test_seat_contract_shape_and_range(seat):
    s, variables, _ = seat
    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (2, 128, 128, 3)).astype(np.float32))
    y = s.apply(variables, x)
    assert y.shape == x.shape
    y = np.asarray(y)
    assert np.isfinite(y).all()
    assert y.min() >= -1.0 - 1e-5 and y.max() <= 1.0 + 1e-5


@needs_reference
def test_shipped_weights_beat_bilinear_on_held_out(seat):
    """The committed weights restore a degraded held-out portrait better
    than bilinear x2 upscaling (the DISTILL_VALUE_r05 bar, applied to
    the shipped artifact; docs/student_seat_r05.json records the full
    48-patch margin)."""
    import cv2

    from ghost_tpu.nn.layers import resize
    from ghost_tpu.train.distill_enhancer import degrade
    from ghost_tpu.utils.quality import psnr

    _, variables, student = seat
    img = cv2.imread(HELD_OUT_IMG)[:, :, ::-1].astype(np.float32) / 255.0
    h, w = img.shape[:2]
    y0, x0 = (h - 128) // 2, (w - 128) // 2
    hq = jnp.asarray(img[None, y0:y0 + 128, x0:x0 + 128])

    lq = degrade(jax.random.key(99), hq, (64, 64))
    sr = jnp.clip(student.apply(variables, lq).astype(jnp.float32), 0, 1)
    bl = jnp.clip(resize(lq, (128, 128), method="bilinear"), 0, 1)
    s_db = float(jnp.mean(psnr(sr * 255.0, hq * 255.0)))
    b_db = float(jnp.mean(psnr(bl * 255.0, hq * 255.0)))
    assert s_db > b_db + 0.1, (s_db, b_db)
