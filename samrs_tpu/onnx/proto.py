"""Minimal ONNX protobuf wire-format codec (no `onnx` / `protobuf` deps).

The environment ships neither the `onnx` package nor its protobuf runtime, so
this module hand-encodes the ONNX ModelProto subset needed to serialize the
SAM decoder graph (samrs_tpu/sam/onnx_export.py) for onnxruntime consumers,
plus a symmetric decoder used by the round-trip tests and the in-repo numpy
evaluator (samrs_tpu/onnx/interpreter.py).

The message schema mirrors onnx/onnx.proto3 (public spec, IR version 8 /
opset 17): only fields we emit are modeled; unknown fields are skipped on
decode.  Messages are represented as plain Python dicts keyed by field name;
repeated fields are lists.

Reference for behavior being exported: GD/segment_anything/utils/onnx.py:17-144
(`SamOnnxModel`), whose onnxruntime artifact this replaces.
"""

from __future__ import annotations

import struct
from typing import Any, Dict, List, Tuple

# ---------------------------------------------------------------------------
# schemas: field name -> (field number, kind[, sub-schema])
# kinds: int (varint), str/bytes (len-delim), float (fixed32),
#        msg (len-delim sub message), rint/rfloat (packed repeated scalars),
#        rstr/rbytes (repeated len-delim), rmsg (repeated sub message)
# ---------------------------------------------------------------------------

DIM = {"dim_value": (1, "int"), "dim_param": (2, "str")}
SHAPE = {"dim": (1, "rmsg", DIM)}
TENSOR_TYPE = {"elem_type": (1, "int"), "shape": (2, "msg", SHAPE)}
TYPE = {"tensor_type": (1, "msg", TENSOR_TYPE)}
VALUE_INFO = {"name": (1, "str"), "type": (2, "msg", TYPE)}
TENSOR = {
    "dims": (1, "rint"),
    "data_type": (2, "int"),
    "name": (8, "str"),
    "raw_data": (9, "bytes"),
}
ATTRIBUTE = {
    "name": (1, "str"),
    "f": (2, "float"),
    "i": (3, "int"),
    "s": (4, "bytes"),
    "t": (5, "msg", TENSOR),
    "floats": (7, "rfloat"),
    "ints": (8, "rint"),
    "strings": (9, "rbytes"),
    "type": (20, "int"),
}
NODE = {
    "input": (1, "rstr"),
    "output": (2, "rstr"),
    "name": (3, "str"),
    "op_type": (4, "str"),
    "attribute": (5, "rmsg", ATTRIBUTE),
    "domain": (7, "str"),
}
GRAPH = {
    "node": (1, "rmsg", NODE),
    "name": (2, "str"),
    "initializer": (5, "rmsg", TENSOR),
    "doc_string": (10, "str"),
    "input": (11, "rmsg", VALUE_INFO),
    "output": (12, "rmsg", VALUE_INFO),
    "value_info": (13, "rmsg", VALUE_INFO),
}
OPSET = {"domain": (1, "str"), "version": (2, "int")}
MODEL = {
    "ir_version": (1, "int"),
    "producer_name": (2, "str"),
    "producer_version": (3, "str"),
    "domain": (4, "str"),
    "model_version": (5, "int"),
    "doc_string": (6, "str"),
    "graph": (7, "msg", GRAPH),
    "opset_import": (8, "rmsg", OPSET),
}

# onnx.TensorProto.DataType values (onnx.proto3 enum)
FLOAT = 1
UINT8 = 2
INT8 = 3
INT32 = 6
INT64 = 7
BOOL = 9
DOUBLE = 11

# onnx.AttributeProto.AttributeType values
ATTR_FLOAT = 1
ATTR_INT = 2
ATTR_STRING = 3
ATTR_TENSOR = 4
ATTR_FLOATS = 6
ATTR_INTS = 7
ATTR_STRINGS = 8


def _varint(v: int) -> bytes:
    if v < 0:  # two's-complement 64-bit, per protobuf int64 varint rules
        v += 1 << 64
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def encode(msg: Dict[str, Any], schema: Dict[str, tuple]) -> bytes:
    out = bytearray()
    for key, val in msg.items():
        if key not in schema:
            raise KeyError(f"field {key!r} not in schema")
        spec = schema[key]
        field, kind = spec[0], spec[1]
        if kind == "int":
            out += _tag(field, 0) + _varint(int(val))
        elif kind == "float":
            out += _tag(field, 5) + struct.pack("<f", float(val))
        elif kind == "str":
            out += _len_delim(field, str(val).encode("utf-8"))
        elif kind == "bytes":
            out += _len_delim(field, bytes(val))
        elif kind == "msg":
            out += _len_delim(field, encode(val, spec[2]))
        elif kind == "rint":  # packed
            payload = b"".join(_varint(int(v)) for v in val)
            out += _len_delim(field, payload)
        elif kind == "rfloat":  # packed
            out += _len_delim(field, struct.pack(f"<{len(val)}f", *val))
        elif kind == "rstr":
            for v in val:
                out += _len_delim(field, str(v).encode("utf-8"))
        elif kind == "rbytes":
            for v in val:
                out += _len_delim(field, bytes(v))
        elif kind == "rmsg":
            for v in val:
                out += _len_delim(field, encode(v, spec[2]))
        else:  # pragma: no cover
            raise ValueError(kind)
    return bytes(out)


def _read_varint(data: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return result, pos


def decode(data: bytes, schema: Dict[str, tuple]) -> Dict[str, Any]:
    """Parse wire bytes into a dict per schema; unknown fields are skipped."""
    by_num = {spec[0]: (name, spec) for name, spec in schema.items()}
    msg: Dict[str, Any] = {}
    pos = 0
    while pos < len(data):
        key, pos = _read_varint(data, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            raw, pos = _read_varint(data, pos)
            payload: Any = raw
        elif wire == 5:
            payload = struct.unpack_from("<f", data, pos)[0]
            pos += 4
        elif wire == 1:
            payload = struct.unpack_from("<d", data, pos)[0]
            pos += 8
        elif wire == 2:
            n, pos = _read_varint(data, pos)
            payload = data[pos : pos + n]
            pos += n
        else:  # pragma: no cover
            raise ValueError(f"unsupported wire type {wire}")
        if field not in by_num:
            continue
        name, spec = by_num[field]
        kind = spec[1]
        if kind == "int":
            v = payload if payload < (1 << 63) else payload - (1 << 64)
            msg[name] = v
        elif kind == "float":
            msg[name] = payload
        elif kind == "str":
            msg[name] = payload.decode("utf-8")
        elif kind == "bytes":
            msg[name] = bytes(payload)
        elif kind == "msg":
            msg[name] = decode(payload, spec[2])
        elif kind == "rint":
            vals = msg.setdefault(name, [])
            if wire == 2:  # packed
                p = 0
                while p < len(payload):
                    v, p = _read_varint(payload, p)
                    vals.append(v if v < (1 << 63) else v - (1 << 64))
            else:
                vals.append(payload if payload < (1 << 63) else payload - (1 << 64))
        elif kind == "rfloat":
            vals = msg.setdefault(name, [])
            if wire == 2:
                vals.extend(
                    struct.unpack(f"<{len(payload) // 4}f", bytes(payload))
                )
            else:
                vals.append(payload)
        elif kind == "rstr":
            msg.setdefault(name, []).append(payload.decode("utf-8"))
        elif kind == "rbytes":
            msg.setdefault(name, []).append(bytes(payload))
        elif kind == "rmsg":
            msg.setdefault(name, []).append(decode(payload, spec[2]))
    return msg


def encode_model(model: Dict[str, Any]) -> bytes:
    return encode(model, MODEL)


def decode_model(data: bytes) -> Dict[str, Any]:
    return decode(data, MODEL)
