"""ONNX wire-format reader vs a hand-encoded protobuf fixture."""

import struct

import numpy as np

from ghost_tpu.convert.onnx_reader import read_onnx_initializers


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wire: int, payload: bytes | int) -> bytes:
    key = _varint((num << 3) | wire)
    if wire == 0:
        return key + _varint(payload)
    if wire == 2:
        return key + _varint(len(payload)) + payload
    raise ValueError(wire)


def _tensor(name: str, arr: np.ndarray) -> bytes:
    msg = b""
    for d in arr.shape:
        msg += _field(1, 0, d)
    dtype_code = {np.dtype("float32"): 1, np.dtype("int64"): 7}[arr.dtype]
    msg += _field(2, 0, dtype_code)
    msg += _field(8, 2, name.encode())
    msg += _field(9, 2, arr.tobytes())
    return msg


def make_fake_onnx(tensors) -> bytes:
    graph = b""
    for name, arr in tensors.items():
        graph += _field(5, 2, _tensor(name, arr))
    # some unrelated graph fields the reader must skip
    graph += _field(2, 2, b"graph-name")
    model = _field(1, 0, 8)  # ir_version
    model += _field(7, 2, graph)
    return model


def test_reader_roundtrip(tmp_path, rng):
    tensors = {
        "conv1.weight": rng.standard_normal((4, 3, 3, 3)).astype(np.float32),
        "bn.running_mean": rng.standard_normal(4).astype(np.float32),
        "shape_const": np.asarray([1, 3, 640, 640], np.int64),
    }
    path = tmp_path / "fake.onnx"
    path.write_bytes(make_fake_onnx(tensors))

    out = read_onnx_initializers(str(path))
    assert set(out) == set(tensors)
    for k, v in tensors.items():
        np.testing.assert_array_equal(out[k], v)
        assert out[k].dtype == v.dtype
