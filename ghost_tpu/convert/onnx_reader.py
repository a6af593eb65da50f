"""Dependency-free ONNX weight extraction (protobuf wire-format reader).

The reference ships its detector/recognizer as ONNX graphs
(scrfd_10g_bnkps.onnx, glintr100.onnx, inswapper_128.onnx — reference
download_models.sh:6-8, train.py:44) but this image has neither `onnx`
nor `onnxruntime`. ONNX files are protobuf; the initializer tensors
(weights) live in well-known field numbers, so a ~150-line wire-format
walker suffices to pull `name -> ndarray` out of any .onnx file:

  ModelProto.graph      = field 7 (message GraphProto)
  GraphProto.initializer = field 5 (repeated TensorProto)
  TensorProto.dims       = field 1 (repeated int64)
  TensorProto.data_type  = field 2 (enum: 1=f32, 6=i32, 7=i64, 10=f16, ...)
  TensorProto.name       = field 8 (string)
  TensorProto.raw_data   = field 9 (bytes)
  TensorProto.float_data = field 4 (packed floats, alt encoding)

This gives converters real access to reference ONNX weights; mapping a
specific graph's names onto a ghost-tpu module tree is the per-model
converter's job (see convert/torch_loader.py for the torch analogue).
"""

from __future__ import annotations

import struct
from typing import Dict, Iterator, Tuple

import numpy as np

_DTYPE = {
    1: np.float32,
    2: np.uint8,
    3: np.int8,
    4: np.uint16,
    5: np.int16,
    6: np.int32,
    7: np.int64,
    9: np.bool_,
    10: np.float16,
    11: np.float64,
    12: np.uint32,
    13: np.uint64,
}


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long (corrupt protobuf)")


def _iter_fields(buf: bytes) -> Iterator[Tuple[int, int, bytes | int]]:
    """Yield (field_number, wire_type, value) over one message's fields."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
            yield field, wire, val
        elif wire == 1:  # 64-bit
            yield field, wire, buf[pos:pos + 8]
            pos += 8
        elif wire == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            yield field, wire, buf[pos:pos + ln]
            pos += ln
        elif wire == 5:  # 32-bit
            yield field, wire, buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")


def _parse_tensor(buf: bytes) -> Tuple[str, np.ndarray]:
    dims = []
    dtype = np.float32
    name = ""
    raw = None
    floats = []
    int64s = []
    for field, wire, val in _iter_fields(buf):
        if field == 1 and wire == 0:
            dims.append(int(val))
        elif field == 1 and wire == 2:  # packed dims
            pos = 0
            while pos < len(val):
                d, pos = _read_varint(val, pos)
                dims.append(d)
        elif field == 2 and wire == 0:
            dtype = _DTYPE.get(int(val), np.float32)
        elif field == 4 and wire == 2:  # packed float_data
            floats.extend(struct.unpack(f"<{len(val) // 4}f", val))
        elif field == 4 and wire == 5:
            floats.append(struct.unpack("<f", val)[0])
        elif field == 7 and wire == 2:  # packed int64_data
            pos = 0
            while pos < len(val):
                d, pos = _read_varint(val, pos)
                int64s.append(d)
        elif field == 8 and wire == 2:
            name = val.decode("utf-8")
        elif field == 9 and wire == 2:
            raw = val
    if raw is not None:
        arr = np.frombuffer(raw, dtype=dtype)
    elif floats:
        arr = np.asarray(floats, np.float32)
    elif int64s:
        arr = np.asarray(int64s, np.int64)
    else:
        arr = np.zeros(0, dtype)
    if dims:
        arr = arr.reshape(dims)
    return name, arr


def read_onnx_initializers(path: str) -> Dict[str, np.ndarray]:
    """Extract all initializer tensors (name -> ndarray) from an .onnx file."""
    with open(path, "rb") as f:
        model = f.read()
    out: Dict[str, np.ndarray] = {}
    for field, wire, val in _iter_fields(model):
        if field == 7 and wire == 2:  # ModelProto.graph
            for gfield, gwire, gval in _iter_fields(val):
                if gfield == 5 and gwire == 2:  # GraphProto.initializer
                    name, arr = _parse_tensor(gval)
                    out[name] = arr
                elif gfield == 4 and gwire == 2:  # nested subgraph nodes? skip
                    pass
    return out
