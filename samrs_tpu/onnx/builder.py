"""ONNX graph builder: a small op-emission DSL over samrs_tpu.onnx.proto.

Tensors are referred to by name (str).  `GraphBuilder` tracks nodes,
initializers (numpy constants / weights) and graph IO; `op()` is the generic
node emitter and the named helpers below cover the op set the SAM decoder
export uses (all standard ONNX ops, opset 17, default domain).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np

from samrs_tpu.onnx import proto

_NP_TO_ONNX = {
    np.dtype(np.float32): proto.FLOAT,
    np.dtype(np.float64): proto.DOUBLE,
    np.dtype(np.int64): proto.INT64,
    np.dtype(np.int32): proto.INT32,
    np.dtype(np.bool_): proto.BOOL,
    np.dtype(np.uint8): proto.UINT8,
    np.dtype(np.int8): proto.INT8,
}
ONNX_TO_NP = {v: k for k, v in _NP_TO_ONNX.items()}


def tensor_proto(arr: np.ndarray, name: str) -> Dict[str, Any]:
    shape = np.shape(arr)
    # note: ascontiguousarray promotes 0-d to (1,); restore the true shape
    arr = np.ascontiguousarray(arr).reshape(shape)
    if arr.dtype not in _NP_TO_ONNX:
        raise TypeError(f"unsupported dtype {arr.dtype}")
    return {
        "dims": list(arr.shape),
        "data_type": _NP_TO_ONNX[arr.dtype],
        "name": name,
        "raw_data": arr.tobytes(),
    }


def tensor_to_numpy(t: Dict[str, Any]) -> np.ndarray:
    dt = ONNX_TO_NP[t["data_type"]]
    arr = np.frombuffer(t.get("raw_data", b""), dtype=dt)
    return arr.reshape(t.get("dims", []))


def _attr(name: str, value: Any) -> Dict[str, Any]:
    if isinstance(value, bool):
        return {"name": name, "i": int(value), "type": proto.ATTR_INT}
    if isinstance(value, (int, np.integer)):
        return {"name": name, "i": int(value), "type": proto.ATTR_INT}
    if isinstance(value, float):
        return {"name": name, "f": value, "type": proto.ATTR_FLOAT}
    if isinstance(value, str):
        return {"name": name, "s": value.encode(), "type": proto.ATTR_STRING}
    if isinstance(value, np.ndarray):
        return {"name": name, "t": tensor_proto(value, name), "type": proto.ATTR_TENSOR}
    if isinstance(value, (list, tuple)):
        if all(isinstance(v, (int, np.integer)) for v in value):
            return {"name": name, "ints": [int(v) for v in value], "type": proto.ATTR_INTS}
        if all(isinstance(v, (float, int)) for v in value):
            return {"name": name, "floats": [float(v) for v in value], "type": proto.ATTR_FLOATS}
        if all(isinstance(v, str) for v in value):
            return {"name": name, "strings": [v.encode() for v in value], "type": proto.ATTR_STRINGS}
    raise TypeError(f"attribute {name}: unsupported value {value!r}")


def value_info(name: str, elem_type: int, shape: Sequence[Union[int, str, None]]) -> Dict[str, Any]:
    dims = []
    for d in shape:
        if d is None:
            dims.append({})
        elif isinstance(d, str):
            dims.append({"dim_param": d})
        else:
            dims.append({"dim_value": int(d)})
    return {
        "name": name,
        "type": {"tensor_type": {"elem_type": elem_type, "shape": {"dim": dims}}},
    }


class GraphBuilder:
    def __init__(self, name: str = "graph"):
        self.name = name
        self.nodes: List[Dict[str, Any]] = []
        self.initializers: List[Dict[str, Any]] = []
        self.inputs: List[Dict[str, Any]] = []
        self.outputs: List[Dict[str, Any]] = []
        self._counter = 0

    # -- naming / constants --------------------------------------------------
    def fresh(self, hint: str = "t") -> str:
        self._counter += 1
        return f"{hint}_{self._counter}"

    def const(self, arr: Any, name: Optional[str] = None, dtype=None) -> str:
        arr = np.asarray(arr, dtype=dtype)
        name = name or self.fresh("const")
        self.initializers.append(tensor_proto(arr, name))
        return name

    def i64(self, values: Sequence[int], name: Optional[str] = None) -> str:
        return self.const(np.asarray(values, np.int64), name)

    def add_input(self, name: str, elem_type: int, shape) -> str:
        self.inputs.append(value_info(name, elem_type, shape))
        return name

    def add_output(self, name: str, elem_type: int, shape) -> str:
        self.outputs.append(value_info(name, elem_type, shape))
        return name

    # -- generic emitter ------------------------------------------------------
    def op(
        self,
        op_type: str,
        inputs: Sequence[str],
        n_outputs: int = 1,
        name: Optional[str] = None,
        **attrs: Any,
    ):
        outs = [self.fresh(name or op_type.lower()) for _ in range(n_outputs)]
        node = {
            "input": list(inputs),
            "output": outs,
            "name": self.fresh(f"n_{op_type}"),
            "op_type": op_type,
        }
        if attrs:
            node["attribute"] = [_attr(k, v) for k, v in attrs.items()]
        self.nodes.append(node)
        return outs[0] if n_outputs == 1 else outs

    # -- op helpers ------------------------------------------------------------
    def add(self, a, b):
        return self.op("Add", [a, b])

    def sub(self, a, b):
        return self.op("Sub", [a, b])

    def mul(self, a, b):
        return self.op("Mul", [a, b])

    def div(self, a, b):
        return self.op("Div", [a, b])

    def matmul(self, a, b):
        return self.op("MatMul", [a, b])

    def softmax(self, x, axis=-1):
        return self.op("Softmax", [x], axis=axis)

    def relu(self, x):
        return self.op("Relu", [x])

    def erf(self, x):
        return self.op("Erf", [x])

    def sin(self, x):
        return self.op("Sin", [x])

    def cos(self, x):
        return self.op("Cos", [x])

    def sqrt(self, x):
        return self.op("Sqrt", [x])

    def floor(self, x):
        return self.op("Floor", [x])

    def equal(self, a, b):
        return self.op("Equal", [a, b])

    def cast(self, x, to: int):
        return self.op("Cast", [x], to=to)

    def where(self, c, a, b):
        return self.op("Where", [c, a, b])

    def shape(self, x):
        return self.op("Shape", [x])

    def reshape(self, x, shape: Union[str, Sequence[int]]):
        if not isinstance(shape, str):
            shape = self.i64(shape)
        return self.op("Reshape", [x, shape])

    def transpose(self, x, perm: Sequence[int]):
        return self.op("Transpose", [x], perm=list(perm))

    def concat(self, xs: Sequence[str], axis: int):
        return self.op("Concat", list(xs), axis=axis)

    def slice_(self, x, starts, ends, axes, steps=None):
        ins = [
            x,
            starts if isinstance(starts, str) else self.i64(starts),
            ends if isinstance(ends, str) else self.i64(ends),
            axes if isinstance(axes, str) else self.i64(axes),
        ]
        if steps is not None:
            ins.append(steps if isinstance(steps, str) else self.i64(steps))
        return self.op("Slice", ins)

    def gather(self, x, indices, axis=0):
        if not isinstance(indices, str):
            indices = self.i64(indices)
        return self.op("Gather", [x, indices], axis=axis)

    def unsqueeze(self, x, axes: Sequence[int]):
        return self.op("Unsqueeze", [x, self.i64(axes)])

    def expand(self, x, shape):
        if not isinstance(shape, str):
            shape = self.i64(shape)
        return self.op("Expand", [x, shape])

    def reduce_mean(self, x, axes: Sequence[int], keepdims=True):
        # opset 17: axes is still an attribute for ReduceMean
        return self.op("ReduceMean", [x], axes=list(axes), keepdims=int(keepdims))

    def reduce_sum(self, x, axes: Sequence[int], keepdims=True):
        # opset 13+: axes is an input
        return self.op("ReduceSum", [x, self.i64(axes)], keepdims=int(keepdims))

    def reduce_max(self, x, axes: Sequence[int], keepdims=True):
        return self.op("ReduceMax", [x], axes=list(axes), keepdims=int(keepdims))

    def argmax(self, x, axis: int, keepdims=False):
        return self.op("ArgMax", [x], axis=axis, keepdims=int(keepdims))

    def conv(self, x, w, b=None, strides=(1, 1), pads=(0, 0, 0, 0)):
        ins = [x, w] + ([b] if b is not None else [])
        return self.op("Conv", ins, strides=list(strides), pads=list(pads))

    def conv_transpose(self, x, w, b=None, strides=(2, 2)):
        ins = [x, w] + ([b] if b is not None else [])
        return self.op("ConvTranspose", ins, strides=list(strides))

    def layer_norm(self, x, scale, bias, axis=-1, epsilon=1e-5):
        return self.op("LayerNormalization", [x, scale, bias], axis=axis, epsilon=epsilon)

    def resize_linear(self, x, sizes):
        """Bilinear resize matching torch F.interpolate(align_corners=False)."""
        if not isinstance(sizes, str):
            sizes = self.i64(sizes)
        return self.op(
            "Resize",
            [x, "", "", sizes],
            mode="linear",
            coordinate_transformation_mode="pytorch_half_pixel",
        )

    def gelu_erf(self, x):
        """Exact-erf gelu: 0.5 * x * (1 + erf(x / sqrt(2)))."""
        half = self.const(np.float32(0.5))
        one = self.const(np.float32(1.0))
        inv_sqrt2 = self.const(np.float32(1.0 / np.sqrt(2.0)))
        return self.mul(self.mul(x, half), self.add(one, self.erf(self.mul(x, inv_sqrt2))))

    # -- assembly ---------------------------------------------------------------
    def model(self, opset: int = 17, producer: str = "samrs-tpu", doc: str = "") -> Dict[str, Any]:
        return {
            "ir_version": 8,
            "producer_name": producer,
            "producer_version": "1.0",
            "graph": {
                "node": self.nodes,
                "name": self.name,
                "initializer": self.initializers,
                "doc_string": doc,
                "input": self.inputs,
                "output": self.outputs,
            },
            "opset_import": [{"domain": "", "version": opset}],
        }

    def serialize(self, opset: int = 17, doc: str = "") -> bytes:
        return proto.encode_model(self.model(opset=opset, doc=doc))
