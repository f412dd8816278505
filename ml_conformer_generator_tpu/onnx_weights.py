"""Minimal ONNX weight extraction (no onnx/onnxruntime dependency).

The reference distributes its checkpoints both as torch ``.pt`` state dicts
and as ONNX graphs for the torch-free runtime
(``conformer_generator_onnx.py:66-73``; HF hosting per ``README.md:34-39``).
``checkpoint.py`` converts the former; this module covers the latter: a
hand-rolled protobuf *wire-format* reader that pulls the named initializer
tensors out of an ``.onnx`` file — the only part of ONNX needed to recover
weights — so reference users with only the ONNX artifacts can still switch.

Wire-format subset (see the public onnx.proto3 schema):
ModelProto.graph = field 7; GraphProto.initializer = repeated field 5
(TensorProto); TensorProto: dims=1 (varint, possibly packed), data_type=2,
float_data=4 (packed), int64_data=7 (packed), name=8, raw_data=9.
"""

from __future__ import annotations

import struct
from typing import Dict, Iterator, List, Tuple

import numpy as np

__all__ = ["read_onnx_initializers"]

# TensorProto.DataType -> numpy dtype
_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16, 5: np.int16,
    6: np.int32, 7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64,
    12: np.uint32, 13: np.uint64,
}


def _varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, bytes]]:
    """Yield (field_number, wire_type, payload) over a message buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:          # varint
            val, pos = _varint(buf, pos)
            yield field, wire, val
        elif wire == 1:        # 64-bit
            yield field, wire, buf[pos: pos + 8]
            pos += 8
        elif wire == 2:        # length-delimited
            ln, pos = _varint(buf, pos)
            yield field, wire, buf[pos: pos + ln]
            pos += ln
        elif wire == 5:        # 32-bit
            yield field, wire, buf[pos: pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")


def _parse_tensor(buf: bytes) -> Tuple[str, np.ndarray]:
    dims: List[int] = []
    dtype = 1
    name = ""
    raw = b""
    floats: List[float] = []
    int64s: List[int] = []
    for field, wire, val in _fields(buf):
        if field == 1:                       # dims
            if wire == 0:
                dims.append(val)
            else:                            # packed
                pos = 0
                while pos < len(val):
                    d, pos = _varint(val, pos)
                    dims.append(d)
        elif field == 2 and wire == 0:
            dtype = val
        elif field == 4:                     # float_data (packed)
            floats.extend(struct.unpack(f"<{len(val) // 4}f", val))
        elif field == 7:                     # int64_data (packed varints)
            pos = 0
            while pos < len(val):
                v, pos = _varint(val, pos)
                int64s.append(v)
        elif field == 8 and wire == 2:
            name = val.decode("utf-8")
        elif field == 9 and wire == 2:
            raw = val
    np_dtype = _DTYPES.get(dtype)
    if np_dtype is None:
        raise ValueError(f"initializer {name!r}: unsupported dtype {dtype}")
    if raw:
        arr = np.frombuffer(raw, dtype=np_dtype)
    elif floats:
        arr = np.asarray(floats, dtype=np.float32)
    elif int64s:
        arr = np.asarray(int64s, dtype=np.int64)
    else:
        arr = np.zeros(0, dtype=np_dtype)
    return name, arr.reshape(dims) if dims else arr


def read_onnx_initializers(path: str) -> Dict[str, np.ndarray]:
    """All named initializer tensors of an ONNX model file.

    Dynamo-based torch exports (the reference's export path,
    ``onnx_export/onnx_export_utils.py:13-61``) keep parameter FQNs; common
    mechanical prefixes are stripped so the names line up with the torch
    state-dict names that ``checkpoint.torch_names_to_egnn_params`` expects.
    """
    with open(path, "rb") as f:
        model = f.read()
    out: Dict[str, np.ndarray] = {}
    for field, wire, val in _fields(model):
        if field == 7 and wire == 2:         # ModelProto.graph
            for gfield, gwire, gval in _fields(val):
                if gfield == 5 and gwire == 2:   # GraphProto.initializer
                    name, arr = _parse_tensor(gval)
                    for prefix in ("p_", "model.", "module."):
                        if name.startswith(prefix):
                            name = name[len(prefix):]
                    out[name] = arr
    return out
