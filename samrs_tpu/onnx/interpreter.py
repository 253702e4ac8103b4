"""Numpy evaluator for the ONNX op subset emitted by samrs_tpu.onnx.builder.

Serves two purposes:
  * validation oracle — tests execute the serialized SAM decoder graph and
    compare against the JAX decode path (onnxruntime is not in this image);
  * a host-side fallback runtime so the exported artifact is usable in-repo.

Semantics follow the ONNX operator spec (opset 17); only the attributes the
builder emits are honored.  Conv/ConvTranspose/Resize are NCHW, matching the
exported graph (and the reference SamOnnxModel, GD/segment_anything/utils/
onnx.py:17-144).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence

import numpy as np

from samrs_tpu.onnx import proto
from samrs_tpu.onnx.builder import ONNX_TO_NP, tensor_to_numpy

try:  # scipy ships in this image; fall back to a ufunc over math.erf
    from scipy.special import erf as _erf
except ImportError:  # pragma: no cover
    _erf = np.vectorize(math.erf, otypes=[np.float64])


def _attrs(node: Dict[str, Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for a in node.get("attribute", []):
        t = a.get("type")
        if t == proto.ATTR_INT:
            out[a["name"]] = a.get("i", 0)
        elif t == proto.ATTR_FLOAT:
            out[a["name"]] = a.get("f", 0.0)
        elif t == proto.ATTR_STRING:
            out[a["name"]] = a.get("s", b"").decode()
        elif t == proto.ATTR_INTS:
            out[a["name"]] = list(a.get("ints", []))
        elif t == proto.ATTR_FLOATS:
            out[a["name"]] = list(a.get("floats", []))
        elif t == proto.ATTR_TENSOR:
            out[a["name"]] = tensor_to_numpy(a["t"])
    return out


def _conv2d(x, w, b, strides, pads):
    # x (N,C,H,W), w (M,C,kh,kw); pads (t,l,b,r)
    n, c, h, wd = x.shape
    m, _, kh, kw = w.shape
    sh, sw = strides
    pt, pl_, pb, pr = pads
    if any(pads):
        x = np.pad(x, ((0, 0), (0, 0), (pt, pb), (pl_, pr)))
        h, wd = x.shape[2:]
    oh = (h - kh) // sh + 1
    ow = (wd - kw) // sw + 1
    # im2col
    cols = np.empty((n, c, kh, kw, oh, ow), x.dtype)
    for i in range(kh):
        for j in range(kw):
            cols[:, :, i, j] = x[:, :, i : i + sh * oh : sh, j : j + sw * ow : sw]
    out = np.einsum("ncklhw,mckl->nmhw", cols, w, optimize=True)
    if b is not None:
        out = out + b[None, :, None, None]
    return out


def _conv_transpose2d(x, w, b, strides):
    # x (N,C,H,W), w (C,M,kh,kw) per ONNX ConvTranspose weight layout
    n, c, h, wd = x.shape
    _, m, kh, kw = w.shape
    sh, sw = strides
    oh, ow = (h - 1) * sh + kh, (wd - 1) * sw + kw
    out = np.zeros((n, m, oh, ow), x.dtype)
    contrib = np.einsum("nchw,cmkl->nmhwkl", x, w, optimize=True)
    for i in range(kh):
        for j in range(kw):
            out[:, :, i : i + sh * h : sh, j : j + sw * wd : sw] += contrib[..., i, j]
    if b is not None:
        out = out + b[None, :, None, None]
    return out


def _resize_linear_2d(x, out_hw):
    """Bilinear NCHW resize, pytorch_half_pixel (torch align_corners=False)."""
    n, c, h, w = x.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])

    def coords(osz, isz):
        if osz == 1:
            return np.zeros(1)
        scale = isz / osz
        return np.clip((np.arange(osz) + 0.5) * scale - 0.5, 0, None)

    ys, xs = coords(oh, h), coords(ow, w)
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0).astype(x.dtype)
    wx = (xs - x0).astype(x.dtype)
    top = x[:, :, y0][:, :, :, x0] * (1 - wx) + x[:, :, y0][:, :, :, x1] * wx
    bot = x[:, :, y1][:, :, :, x0] * (1 - wx) + x[:, :, y1][:, :, :, x1] * wx
    return top * (1 - wy[None, None, :, None]) + bot * wy[None, None, :, None]


def run(model: Dict[str, Any], feeds: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Execute a decoded ModelProto dict on numpy inputs; returns all graph
    outputs by name."""
    g = model["graph"]
    env: Dict[str, np.ndarray] = {}
    for t in g.get("initializer", []):
        env[t["name"]] = tensor_to_numpy(t)
    for vi in g.get("input", []):
        name = vi["name"]
        if name not in feeds and name not in env:
            raise KeyError(f"missing input {name}")
        if name in feeds:
            env[name] = np.asarray(feeds[name])

    for node in g.get("node", []):
        op = node["op_type"]
        ins = [env[i] if i else None for i in node.get("input", [])]
        at = _attrs(node)
        if op == "Add":
            res = ins[0] + ins[1]
        elif op == "Sub":
            res = ins[0] - ins[1]
        elif op == "Mul":
            res = ins[0] * ins[1]
        elif op == "Div":
            res = ins[0] / ins[1]
        elif op == "MatMul":
            res = ins[0] @ ins[1]
        elif op == "Sqrt":
            res = np.sqrt(ins[0])
        elif op == "Erf":
            res = _erf(ins[0]).astype(ins[0].dtype)
        elif op == "Sin":
            res = np.sin(ins[0])
        elif op == "Cos":
            res = np.cos(ins[0])
        elif op == "Floor":
            res = np.floor(ins[0])
        elif op == "Relu":
            res = np.maximum(ins[0], 0)
        elif op == "Softmax":
            ax = at.get("axis", -1)
            z = ins[0] - ins[0].max(axis=ax, keepdims=True)
            e = np.exp(z)
            res = e / e.sum(axis=ax, keepdims=True)
        elif op == "Equal":
            res = ins[0] == ins[1]
        elif op == "Where":
            res = np.where(ins[0], ins[1], ins[2])
        elif op == "Cast":
            res = ins[0].astype(ONNX_TO_NP[at["to"]])
        elif op == "Shape":
            res = np.asarray(ins[0].shape, np.int64)
        elif op == "Reshape":
            # ONNX semantics: 0 copies the input dim, -1 infers
            tgt = [
                ins[0].shape[i] if int(v) == 0 else int(v)
                for i, v in enumerate(ins[1])
            ]
            res = ins[0].reshape(tgt)
        elif op == "Transpose":
            res = np.transpose(ins[0], at["perm"])
        elif op == "Concat":
            res = np.concatenate([i for i in ins], axis=at["axis"])
        elif op == "Slice":
            data, starts, ends = ins[0], ins[1], ins[2]
            axes = ins[3] if len(ins) > 3 and ins[3] is not None else list(range(len(starts)))
            steps = ins[4] if len(ins) > 4 and ins[4] is not None else [1] * len(starts)
            sl = [slice(None)] * data.ndim
            for s, e, a, st in zip(starts, ends, axes, steps):
                sl[int(a)] = slice(int(s), int(e), int(st))
            res = data[tuple(sl)]
        elif op == "Gather":
            res = np.take(ins[0], ins[1].astype(np.int64), axis=at.get("axis", 0))
        elif op == "Unsqueeze":
            res = ins[0]
            for a in sorted(int(v) for v in ins[1]):
                res = np.expand_dims(res, a)
        elif op == "Expand":
            res = np.broadcast_to(
                ins[0], np.broadcast_shapes(ins[0].shape, tuple(int(v) for v in ins[1]))
            )
        elif op == "ReduceMean":
            res = ins[0].mean(axis=tuple(at["axes"]), keepdims=bool(at.get("keepdims", 1)))
        elif op == "ReduceSum":
            res = ins[0].sum(axis=tuple(int(v) for v in ins[1]),
                             keepdims=bool(at.get("keepdims", 1)))
        elif op == "ReduceMax":
            res = ins[0].max(axis=tuple(at["axes"]), keepdims=bool(at.get("keepdims", 1)))
        elif op == "ArgMax":
            res = np.argmax(ins[0], axis=at["axis"])
            if at.get("keepdims", 1):
                res = np.expand_dims(res, at["axis"])
            res = res.astype(np.int64)
        elif op == "LayerNormalization":
            x, scale, bias = ins
            ax = at.get("axis", -1)
            eps = at.get("epsilon", 1e-5)
            mu = x.mean(axis=ax, keepdims=True)
            var = ((x - mu) ** 2).mean(axis=ax, keepdims=True)
            res = (x - mu) / np.sqrt(var + eps) * scale + bias
        elif op == "Conv":
            res = _conv2d(ins[0], ins[1], ins[2] if len(ins) > 2 else None,
                          at.get("strides", [1, 1]), at.get("pads", [0, 0, 0, 0]))
        elif op == "ConvTranspose":
            res = _conv_transpose2d(ins[0], ins[1], ins[2] if len(ins) > 2 else None,
                                    at.get("strides", [1, 1]))
        elif op == "Resize":
            sizes = ins[3]
            assert at.get("mode") == "linear"
            assert at.get("coordinate_transformation_mode") == "pytorch_half_pixel"
            res = _resize_linear_2d(ins[0], sizes[-2:])
        else:
            raise NotImplementedError(f"op {op}")
        outs = node["output"]
        env[outs[0] if isinstance(outs, list) else outs] = np.asarray(res)

    return {vi["name"]: env[vi["name"]] for vi in g.get("output", [])}


def run_bytes(data: bytes, feeds: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return run(proto.decode_model(data), feeds)
