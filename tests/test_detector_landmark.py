"""SCRFD detector graph + 106-landmark net: shapes, NMS, decode."""

import jax
import jax.numpy as jnp
import numpy as np

from ghost_tpu.core.precision import FULL_PRECISION
from ghost_tpu.models.landmark import (
    LMK_IM,
    LMK_M,
    Landmark106,
    landmarks_from_crops,
)
from ghost_tpu.models.scrfd import (
    SCRFD,
    _batched_nms,
    _iou_matrix,
    decode_detections,
    preprocess_frames,
)


def test_scrfd_head_shapes():
    model = SCRFD(policy=FULL_PRECISION)
    x = jnp.zeros((1, 320, 320, 3))  # smaller canvas for CPU test speed
    variables = model.init(jax.random.key(0), x)
    outs = model.apply(variables, x)
    assert len(outs) == 3
    for (score, bbox, kps), stride in zip(outs, (8, 16, 32)):
        n = 320 // stride
        assert score.shape == (1, n, n, 2)
        assert bbox.shape == (1, n, n, 8)
        assert kps.shape == (1, n, n, 20)


def test_decode_shapes():
    model = SCRFD(policy=FULL_PRECISION)
    x = jnp.zeros((2, 320, 320, 3))
    variables = model.init(jax.random.key(0), x)
    outs = model.apply(variables, x)
    scores, boxes, kps = decode_detections(outs, input_size=320, max_faces=8)
    assert scores.shape == (2, 8)
    assert boxes.shape == (2, 8, 4)
    assert kps.shape == (2, 8, 5, 2)


def test_iou_matrix():
    boxes = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
                        jnp.float32)
    iou = np.asarray(_iou_matrix(boxes))
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-6)
    assert abs(iou[0, 1] - 25.0 / 175.0) < 1e-5
    assert iou[0, 2] == 0.0


def test_nms_suppresses_overlaps():
    scores = jnp.asarray([[0.9, 0.8, 0.7, -1.0]])
    boxes = jnp.asarray([[[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30],
                          [0, 0, 1, 1]]], jnp.float32)
    kps = jnp.zeros((1, 4, 5, 2))
    s, b, k = _batched_nms(scores, boxes, kps, max_faces=4, iou_thresh=0.4)
    s = np.asarray(s[0])
    # box1 suppressed by box0 (IoU ~0.68), box2 kept, padding -1
    assert s[0] == 0.9
    assert abs(s[1] - 0.7) < 1e-6
    assert s[2] == -1.0 and s[3] == -1.0
    np.testing.assert_allclose(np.asarray(b[0, 1]), [20, 20, 30, 30])


def test_preprocess_letterbox():
    frames = jnp.full((1, 90, 160, 3), 255, jnp.uint8)
    canvas, scale = preprocess_frames(frames, det_size=320)
    assert canvas.shape == (1, 320, 320, 3)
    assert abs(scale - 2.0) < 1e-6
    c = np.asarray(canvas)
    assert c[0, 0, 0, 0] > 0.9  # content top-left
    assert c[0, 200, 0, 0] < -0.9  # below content = padding (-127.5/128)


def test_landmark_net_contract():
    model = Landmark106(width=16, policy=FULL_PRECISION)
    x = jnp.zeros((2, 192, 192, 3))
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 106, 2)
    assert np.abs(np.asarray(out)).max() <= 1.0


def test_lmk_matrices_are_inverse():
    m3 = np.vstack([LMK_M, [0, 0, 1]])
    im3 = np.vstack([LMK_IM, [0, 0, 1]])
    np.testing.assert_allclose(m3 @ im3, np.eye(3), atol=1e-5)


def test_landmarks_from_crops_coordinates():
    """A net that always returns the center must land all points at the
    crop center regardless of the warp."""
    model = Landmark106(width=16, policy=FULL_PRECISION)
    x = jnp.zeros((1, 192, 192, 3))
    variables = model.init(jax.random.key(0), x)

    def fake_apply(v, imgs):
        return jnp.zeros((imgs.shape[0], 106, 2))  # center of net space

    pts = landmarks_from_crops(fake_apply, variables,
                               jnp.zeros((3, 224, 224, 3)), 224)
    assert pts.shape == (3, 106, 2)
    # net center (96,96) -> IM -> 1.75*96-56 = 112 = crop center
    np.testing.assert_allclose(np.asarray(pts), 112.0, atol=1e-4)


def test_detection_template_injection():
    """inject_detection_template turns a random-weight SCRFD into a
    plausible-geometry face proposer: detections fire, kps are a
    non-degenerate 5-pt constellation with eyes above mouth and a
    left/right split (so umeyama alignment to the FFHQ template is
    well-conditioned), and runs are deterministic."""
    from ghost_tpu.utils.face_template import inject_detection_template

    det = SCRFD(policy=FULL_PRECISION)
    # small input keeps the test fast; strides still produce anchors
    size = 320
    variables = det.init(jax.random.key(3), jnp.zeros((1, size, size, 3)))
    variables = inject_detection_template(variables)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (1, size, size, 3))
                    .astype(np.float32))
    outs = det.apply(variables, x)
    scores, boxes, kps = decode_detections(outs, input_size=size,
                                           score_thresh=0.5, max_faces=2)
    scores = np.asarray(scores)[0]
    kps = np.asarray(kps)[0]
    boxes = np.asarray(boxes)[0]
    assert (scores > 0).all(), scores  # template fires everywhere

    for lane in range(2):
        k = kps[lane]  # (5,2): [eyeL, eyeR, nose, mouthL, mouthR]
        # non-degenerate spread
        assert np.ptp(k[:, 0]) > 1.0 and np.ptp(k[:, 1]) > 1.0, k
        # eyes above mouth (y grows downward)
        assert k[0, 1] < k[3, 1] and k[1, 1] < k[4, 1], k
        # left/right split
        assert k[0, 0] < k[1, 0] and k[3, 0] < k[4, 0], k
        # kps inside the proposed box (loose)
        x0, y0, x1, y1 = boxes[lane]
        assert (k[:, 0] > x0 - 5).all() and (k[:, 0] < x1 + 5).all()

    # deterministic
    outs2 = det.apply(variables, x)
    s2, _, k2 = decode_detections(outs2, input_size=size,
                                  score_thresh=0.5, max_faces=2)
    np.testing.assert_array_equal(np.asarray(k2)[0], kps)
