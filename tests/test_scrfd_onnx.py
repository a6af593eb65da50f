"""SCRFDOnnx adapter: insightface-style ONNX detector graphs drive the
pipeline's decode unchanged.

Builds a synthetic 9-output SCRFD-shaped ONNX graph (per-stride
score/bbox/kps heads with constant biases, the real pack's layout) and
checks the adapter + decode_detections recover the planted detection
values exactly. The real scrfd_10g_bnkps.onnx slots in unchanged."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")  # for the shared proto writer deps

from test_onnx_exec import model_bytes, node  # noqa: E402


def _head(stride_idx, stride, bias_score, bias_box):
    """Nodes producing (1, h*h*2, C) outputs for one stride."""
    s = 640 // stride
    nodes = [
        node("AveragePool", ["x"], [f"p{stride}"],
             kernel_shape=[stride, stride], strides=[stride, stride]),
        node("Conv", [f"p{stride}", "w_zero_s", f"b_score{stride_idx}"],
             [f"cs{stride}"], kernel_shape=[1, 1], strides=[1, 1],
             pads=[0, 0, 0, 0]),
        node("Sigmoid", [f"cs{stride}"], [f"sig{stride}"]),
        node("Transpose", [f"sig{stride}"], [f"st{stride}"],
             perm=[0, 2, 3, 1]),
        node("Reshape", [f"st{stride}", "score_shape"], [f"score_{stride}"]),
        node("Conv", [f"p{stride}", "w_zero_b", f"b_box{stride_idx}"],
             [f"cb{stride}"], kernel_shape=[1, 1], strides=[1, 1],
             pads=[0, 0, 0, 0]),
        node("Transpose", [f"cb{stride}"], [f"bt{stride}"], perm=[0, 2, 3, 1]),
        node("Reshape", [f"bt{stride}", "box_shape"], [f"bbox_{stride}"]),
        node("Conv", [f"p{stride}", "w_zero_k", "b_kps"], [f"ck{stride}"],
             kernel_shape=[1, 1], strides=[1, 1], pads=[0, 0, 0, 0]),
        node("Transpose", [f"ck{stride}"], [f"kt{stride}"], perm=[0, 2, 3, 1]),
        node("Reshape", [f"kt{stride}", "kps_shape"], [f"kps_{stride}"]),
    ]
    return nodes


def test_scrfd_onnx_adapter_decodes_planted_values(tmp_path):
    import jax.numpy as jnp

    from ghost_tpu.models.scrfd import decode_detections, preprocess_frames
    from ghost_tpu.models.scrfd_onnx import SCRFDOnnx

    score_vals = (0.9, 0.2)  # anchor 0 hot, anchor 1 cold (uniform maps)
    box_d = (2.0, 1.0, 2.0, 1.0)  # distances in stride units
    nodes = []
    for i, s in enumerate((8, 16, 32)):
        nodes += _head(i, s, score_vals, box_d)
    inits = {
        "w_zero_s": np.zeros((2, 3, 1, 1), np.float32),
        "w_zero_b": np.zeros((8, 3, 1, 1), np.float32),
        "w_zero_k": np.zeros((20, 3, 1, 1), np.float32),
        "score_shape": np.asarray([1, -1, 1], np.int64),
        "box_shape": np.asarray([1, -1, 4], np.int64),
        "kps_shape": np.asarray([1, -1, 10], np.int64),
        "b_kps": np.zeros((20,), np.float32),
    }

    def logit(p):
        return float(np.log(p / (1 - p)))

    for i, sc in enumerate(((0.9, 0.2), (0.3, 0.1), (0.2, 0.1))):
        inits[f"b_score{i}"] = np.asarray([logit(sc[0]), logit(sc[1])],
                                          np.float32)
        inits[f"b_box{i}"] = np.tile(np.asarray(box_d, np.float32), 2)

    p = tmp_path / "scrfd.onnx"
    p.write_bytes(model_bytes(nodes, inits, ["x"],
                              [f"score_{s}" for s in (8, 16, 32)]
                              + [f"bbox_{s}" for s in (8, 16, 32)]
                              + [f"kps_{s}" for s in (8, 16, 32)]))

    det = SCRFDOnnx(str(p))
    assert det.has_kps

    frames = jnp.zeros((1, 640, 640, 3), jnp.uint8)
    canvas, _scale = preprocess_frames(frames, 640)
    outs = det.apply({}, canvas)
    assert len(outs) == 3
    scores, boxes, kps = decode_detections(outs, input_size=640,
                                           score_thresh=0.5, max_faces=4)
    s0 = float(scores[0, 0])
    assert abs(s0 - 0.9) < 1e-3  # sigmoid/logit roundtrip is faithful
    # planted distances: box = center -+ d*stride, kps = centers
    b0 = np.asarray(boxes[0, 0])
    w = b0[2] - b0[0]
    h = b0[3] - b0[1]
    assert abs(w - (2.0 + 2.0) * 8) < 1e-3
    assert abs(h - (1.0 + 1.0) * 8) < 1e-3
    k0 = np.asarray(kps[0, 0])
    cx, cy = (b0[0] + b0[2]) / 2, (b0[1] + b0[3]) / 2
    np.testing.assert_allclose(k0, np.tile([[cx, cy]], (5, 1)), atol=1e-3)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
