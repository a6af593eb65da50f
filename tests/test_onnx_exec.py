"""Native ONNX executor vs torch semantics.

Builds real .onnx files byte-by-byte (a minimal protobuf writer — the
inverse of convert/onnx_reader.py) and checks the JAX executor against
torch CPU for each op family the reference graphs use. No onnx/
onnxruntime needed.
"""

import struct

import numpy as np
import pytest

torch = pytest.importorskip("torch")


# ------------------------------------------------------------ proto writer
def _varint(v: int) -> bytes:
    out = b""
    v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wire: int, payload) -> bytes:
    key = _varint(num << 3 | wire)
    if wire == 0:
        return key + _varint(payload)
    if wire == 2:
        return key + _varint(len(payload)) + payload
    if wire == 5:
        return key + payload
    raise ValueError(wire)


_DT = {np.dtype(np.float32): 1, np.dtype(np.int64): 7,
       np.dtype(np.int32): 6, np.dtype(np.uint8): 2}


def tensor_proto(name: str, arr: np.ndarray) -> bytes:
    arr = np.asarray(arr)
    out = b"".join(_field(1, 0, int(d)) for d in arr.shape)
    out += _field(2, 0, _DT[arr.dtype])
    out += _field(8, 2, name.encode())
    out += _field(9, 2, arr.tobytes())
    return out


def attr(name: str, value) -> bytes:
    out = _field(1, 2, name.encode())
    if isinstance(value, float):
        out += _field(2, 5, struct.pack("<f", value))
    elif isinstance(value, int):
        out += _field(3, 0, value)
    elif isinstance(value, str):
        out += _field(4, 2, value.encode())
    elif isinstance(value, np.ndarray):
        out += _field(5, 2, tensor_proto("", value))
    elif isinstance(value, (list, tuple)):
        for v in value:
            out += _field(8, 0, int(v))
    else:
        raise TypeError(type(value))
    return out


def node(op: str, ins, outs, **attrs) -> bytes:
    out = b"".join(_field(1, 2, i.encode()) for i in ins)
    out += b"".join(_field(2, 2, o.encode()) for o in outs)
    out += _field(4, 2, op.encode())
    out += b"".join(_field(5, 2, attr(k, v)) for k, v in attrs.items())
    return out


def value_info(name: str) -> bytes:
    return _field(1, 2, name.encode())


def model_bytes(nodes, inits, inputs, outputs) -> bytes:
    g = b"".join(_field(1, 2, n) for n in nodes)
    g += b"".join(_field(5, 2, tensor_proto(k, v)) for k, v in inits.items())
    g += b"".join(_field(11, 2, value_info(i)) for i in inputs)
    g += b"".join(_field(12, 2, value_info(o)) for o in outputs)
    return _field(7, 2, g)


def run_graph(tmp_path, nodes, inits, inputs, outputs, feeds):
    import jax.numpy as jnp

    from ghost_tpu.convert.onnx_exec import OnnxExecutor
    from ghost_tpu.convert.onnx_reader import read_onnx_graph

    p = tmp_path / "m.onnx"
    p.write_bytes(model_bytes(nodes, inits, list(feeds), outputs))
    graph = read_onnx_graph(str(p))
    assert graph.inputs == list(feeds)
    ex = OnnxExecutor(graph)
    outs = ex({k: jnp.asarray(v) for k, v in feeds.items()})
    return [np.asarray(o) for o in outs]


# ------------------------------------------------------------------- tests
def test_conv_bn_relu_pool_gemm_vs_torch(tmp_path):
    torch.manual_seed(0)
    x = np.random.default_rng(0).normal(0, 1, (2, 3, 16, 16)).astype(np.float32)
    w = np.random.default_rng(1).normal(0, 0.2, (8, 3, 3, 3)).astype(np.float32)
    b = np.random.default_rng(2).normal(0, 0.2, (8,)).astype(np.float32)
    scale = np.abs(np.random.default_rng(3).normal(1, 0.1, (8,))).astype(np.float32)
    bias = np.random.default_rng(4).normal(0, 0.1, (8,)).astype(np.float32)
    mean = np.random.default_rng(5).normal(0, 0.1, (8,)).astype(np.float32)
    var = np.abs(np.random.default_rng(6).normal(1, 0.1, (8,))).astype(np.float32)
    fc_w = np.random.default_rng(7).normal(0, 0.1, (4, 8 * 8 * 8)).astype(np.float32)
    fc_b = np.zeros(4, np.float32)

    nodes = [
        node("Conv", ["x", "w", "b"], ["c"], kernel_shape=[3, 3],
             strides=[1, 1], pads=[1, 1, 1, 1]),
        node("BatchNormalization", ["c", "s", "bb", "m", "v"], ["bn"],
             epsilon=1e-5),
        node("Relu", ["bn"], ["r"]),
        node("MaxPool", ["r"], ["p"], kernel_shape=[2, 2], strides=[2, 2]),
        node("Flatten", ["p"], ["f"], axis=1),
        node("Gemm", ["f", "fw", "fb"], ["y"], transB=1),
    ]
    inits = {"w": w, "b": b, "s": scale, "bb": bias, "m": mean, "v": var,
             "fw": fc_w, "fb": fc_b}
    (y,) = run_graph(tmp_path, nodes, inits, ["x"], ["y"], {"x": x})

    with torch.no_grad():
        t = torch.nn.functional.conv2d(torch.tensor(x), torch.tensor(w),
                                       torch.tensor(b), padding=1)
        t = torch.nn.functional.batch_norm(
            t, torch.tensor(mean), torch.tensor(var), torch.tensor(scale),
            torch.tensor(bias), eps=1e-5)
        t = torch.relu(t)
        t = torch.nn.functional.max_pool2d(t, 2)
        t = t.flatten(1) @ torch.tensor(fc_w).T + torch.tensor(fc_b)
    np.testing.assert_allclose(y, t.numpy(), atol=2e-5)


def test_convtranspose_instancenorm_vs_torch(tmp_path):
    x = np.random.default_rng(0).normal(0, 1, (1, 4, 8, 8)).astype(np.float32)
    w = np.random.default_rng(1).normal(0, 0.2, (4, 6, 4, 4)).astype(np.float32)
    s = np.abs(np.random.default_rng(2).normal(1, 0.1, (6,))).astype(np.float32)
    bb = np.random.default_rng(3).normal(0, 0.1, (6,)).astype(np.float32)
    nodes = [
        node("ConvTranspose", ["x", "w"], ["d"], kernel_shape=[4, 4],
             strides=[2, 2], pads=[1, 1, 1, 1]),
        node("InstanceNormalization", ["d", "s", "bb"], ["y"], epsilon=1e-5),
    ]
    (y,) = run_graph(tmp_path, nodes, {"w": w, "s": s, "bb": bb},
                     ["x"], ["y"], {"x": x})
    with torch.no_grad():
        t = torch.nn.functional.conv_transpose2d(
            torch.tensor(x), torch.tensor(w), stride=2, padding=1)
        t = torch.nn.functional.instance_norm(
            t, weight=torch.tensor(s), bias=torch.tensor(bb), eps=1e-5)
    np.testing.assert_allclose(y, t.numpy(), atol=2e-5)


def test_shape_reshape_slice_concat_resize(tmp_path):
    x = np.arange(2 * 3 * 4 * 4, dtype=np.float32).reshape(2, 3, 4, 4)
    nodes = [
        node("Shape", ["x"], ["sh"]),
        node("Gather", ["sh", "zero"], ["b"], axis=0),
        node("Unsqueeze", ["b"], ["b1"], axes=[0]),
        node("Concat", ["b1", "minus1"], ["newshape"], axis=0),
        node("Reshape", ["x", "newshape"], ["flat"]),
        node("Slice", ["flat", "st", "en", "ax"], ["sl"]),
        node("Resize", ["x", "", "scales"], ["up"], mode="nearest"),
    ]
    inits = {"zero": np.asarray(0, np.int64),
             "minus1": np.asarray([-1], np.int64),
             "st": np.asarray([0], np.int64),
             "en": np.asarray([5], np.int64),
             "ax": np.asarray([1], np.int64),
             "scales": np.asarray([1, 1, 2, 2], np.float32)}
    flat, sl, up = run_graph(tmp_path, nodes, inits, ["x"],
                             ["flat", "sl", "up"], {"x": x})
    assert flat.shape == (2, 48)
    np.testing.assert_allclose(sl, x.reshape(2, -1)[:, :5])
    with torch.no_grad():
        t = torch.nn.functional.interpolate(torch.tensor(x), scale_factor=2,
                                            mode="nearest")
    np.testing.assert_allclose(up, t.numpy())


def test_prelu_pad_avgpool_leaky(tmp_path):
    x = np.random.default_rng(0).normal(0, 1, (1, 2, 6, 6)).astype(np.float32)
    slope = np.asarray([0.1, 0.3], np.float32)
    nodes = [
        node("PRelu", ["x", "slope"], ["p"]),
        node("Pad", ["p", "pads"], ["pp"], mode="constant"),
        node("AveragePool", ["pp"], ["a"], kernel_shape=[2, 2],
             strides=[2, 2]),
        node("LeakyRelu", ["a"], ["y"], alpha=0.2),
    ]
    inits = {"slope": slope,
             "pads": np.asarray([0, 0, 1, 1, 0, 0, 1, 1], np.int64)}
    (y,) = run_graph(tmp_path, nodes, inits, ["x"], ["y"], {"x": x})
    with torch.no_grad():
        t = torch.nn.functional.prelu(torch.tensor(x), torch.tensor(slope))
        t = torch.nn.functional.pad(t, (1, 1, 1, 1))
        t = torch.nn.functional.avg_pool2d(t, 2)
        t = torch.nn.functional.leaky_relu(t, 0.2)
    np.testing.assert_allclose(y, t.numpy(), atol=1e-6)


def test_unsupported_op_raises(tmp_path):
    from ghost_tpu.convert.onnx_exec import OnnxExecutor
    from ghost_tpu.convert.onnx_reader import read_onnx_graph

    p = tmp_path / "bad.onnx"
    p.write_bytes(model_bytes([node("NonMaxSuppression", ["x"], ["y"])],
                              {}, ["x"], ["y"]))
    with pytest.raises(NotImplementedError, match="NonMaxSuppression"):
        OnnxExecutor(read_onnx_graph(str(p)))


def test_negative_int64_initializer_roundtrip(tmp_path):
    """ADVICE r1: negative packed int64s must not decode as huge
    positives."""
    from ghost_tpu.convert.onnx_reader import read_onnx_graph

    vals = np.asarray([-1, -1000, 3], np.int64)
    p = tmp_path / "neg.onnx"
    p.write_bytes(model_bytes([], {"t": vals}, [], []))
    got = read_onnx_graph(str(p)).initializers["t"]
    np.testing.assert_array_equal(got, vals)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_native_inswapper_teacher_structure(tmp_path):
    """NativeInswapperTeacher on a synthetic inswapper-SHAPED graph:
    (target blob 128 NCHW, source latent 512) + emap initializer ->
    (B,3,128,128). Verifies the teacher plumbing (resize, emap
    projection + normalize, executor, resize back) end to end; the real
    inswapper_128.onnx slots in with zero code changes."""
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.1, (3, 3, 3, 3)).astype(np.float32)
    proj = rng.normal(0, 0.1, (512, 3)).astype(np.float32)
    emap = rng.normal(0, 0.05, (512, 512)).astype(np.float32)
    nodes = [
        node("Conv", ["target", "w"], ["c"], kernel_shape=[3, 3],
             strides=[1, 1], pads=[1, 1, 1, 1]),
        node("MatMul", ["source", "proj"], ["sty"]),
        node("Unsqueeze", ["sty"], ["sty1"], axes=[2, 3]),
        node("Add", ["c", "sty1"], ["m"]),
        node("Sigmoid", ["m"], ["out"]),  # real inswapper emits [0,1]
    ]
    p = tmp_path / "swapper.onnx"
    p.write_bytes(model_bytes(nodes, {"w": w, "proj": proj, "emap": emap},
                              ["target", "source"], ["out"]))

    from ghost_tpu.train.distill_native import NativeInswapperTeacher

    teacher = NativeInswapperTeacher(str(p))
    np.testing.assert_allclose(teacher.emap, emap)
    xt = rng.uniform(-1, 1, (2, 256, 256, 3)).astype(np.float32)
    z = rng.normal(0, 1, (2, 512)).astype(np.float32)
    out = teacher(xt, z)
    assert out["teacher_y"].shape == (2, 256, 256, 3)
    assert np.isfinite(out["teacher_y"]).all()
    assert np.abs(out["teacher_y"]).max() <= 1.0 + 1e-5
