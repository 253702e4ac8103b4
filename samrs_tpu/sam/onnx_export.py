"""Real ONNX export of the SAM decode path (onnxruntime-consumable).

Behavioral reference: GD/segment_anything/utils/onnx.py:17-144 (`SamOnnxModel`)
— the decoder-only wrapper the reference exports for onnxruntime.  This module
rebuilds that exact graph, op by op, from the JAX parameter tree, serialized
with the in-repo protobuf codec (samrs_tpu/onnx/proto.py) since neither the
`onnx` package nor `torch.onnx`'s serializer is available in this image.

Interface parity with the reference artifact:
  inputs : image_embeddings (1, 256, 64, 64) f32
           point_coords     (num_labels, num_points, 2) f32
           point_labels     (num_labels, num_points) f32
           mask_input       (1, 1, 256, 256) f32
           has_mask_input   (1,) f32
           orig_im_size     (2,) f32
  outputs: masks (num_labels, M, H, W) f32  [dynamic H/W = orig_im_size]
           iou_predictions (num_labels, M) f32
           low_res_masks (num_labels, M, 256, 256) f32
with M = 4 mask tokens, or 1 when ``return_single_mask`` (the reference's
score-reweight argmax selection, onnx.py:96-110).  ``use_stability_score`` and
``return_extra_metrics`` are not exported (both default off in the reference
export script).

Validation: tests/test_onnx_export.py executes the serialized graph with the
numpy interpreter and compares against the JAX decode path (and transitively
the torch reference via the existing decoder parity tests).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from samrs_tpu.onnx import proto
from samrs_tpu.onnx.builder import GraphBuilder


def _np(p) -> np.ndarray:
    return np.asarray(p, np.float32)


def _dense(g: GraphBuilder, x: str, params: Dict[str, Any], name: str) -> str:
    w = g.const(_np(params["kernel"]), f"{name}.weight")
    b = g.const(_np(params["bias"]), f"{name}.bias")
    return g.add(g.matmul(x, w), b)


def _layer_norm(g: GraphBuilder, x: str, params: Dict[str, Any], name: str,
                epsilon: float = 1e-5) -> str:
    s = g.const(_np(params["scale"]), f"{name}.scale")
    b = g.const(_np(params["bias"]), f"{name}.bias")
    return g.layer_norm(x, s, b, axis=-1, epsilon=epsilon)


def _attention(g: GraphBuilder, params: Dict[str, Any], name: str,
               q: str, k: str, v: str, embed_dim: int, num_heads: int,
               downsample_rate: int = 1) -> str:
    """TwoWay attention with internal downsample (transformer.py:185-240)."""
    internal = embed_dim // downsample_rate
    hd = internal // num_heads
    q = _dense(g, q, params["q_proj"], f"{name}.q")
    k = _dense(g, k, params["k_proj"], f"{name}.k")
    v = _dense(g, v, params["v_proj"], f"{name}.v")

    def split(x):
        x = g.reshape(x, [0, -1, num_heads, hd])
        return g.transpose(x, [0, 2, 1, 3])  # (B, nH, N, hd)

    qh, kh, vh = split(q), split(k), split(v)
    attn = g.matmul(qh, g.transpose(kh, [0, 1, 3, 2]))
    attn = g.div(attn, g.const(np.float32(np.sqrt(hd))))
    attn = g.softmax(attn, axis=-1)
    out = g.matmul(attn, vh)
    out = g.transpose(out, [0, 2, 1, 3])
    out = g.reshape(out, [0, -1, internal])
    return _dense(g, out, params["out_proj"], f"{name}.out")


def _mlp_block(g: GraphBuilder, x: str, params: Dict[str, Any], name: str) -> str:
    """lin1 -> relu -> lin2 (the TwoWay blocks use ReLU, transformer.py:163)."""
    h = g.relu(_dense(g, x, params["lin1"], f"{name}.lin1"))
    return _dense(g, h, params["lin2"], f"{name}.lin2")


def _mlp(g: GraphBuilder, x: str, params: Dict[str, Any], name: str,
         num_layers: int) -> str:
    """Dense stack with ReLU between (mask_decoder.py:179-201)."""
    for i in range(num_layers):
        x = _dense(g, x, params[f"layers_{i}"], f"{name}.{i}")
        if i < num_layers - 1:
            x = g.relu(x)
    return x


def _ln2d_nchw(g: GraphBuilder, x: str, params: Dict[str, Any], name: str) -> str:
    """Channel LayerNorm on an NCHW tensor (common.py:31-43, eps 1e-6)."""
    x = g.transpose(x, [0, 2, 3, 1])
    x = _layer_norm(g, x, params, name, epsilon=1e-6)
    return g.transpose(x, [0, 3, 1, 2])


def _conv_nchw(g: GraphBuilder, x: str, params: Dict[str, Any], name: str,
               strides=(1, 1)) -> str:
    """flax NHWC conv params -> ONNX NCHW Conv node."""
    k = _np(params["kernel"]).transpose(3, 2, 0, 1)  # (kh,kw,ci,co)->(co,ci,kh,kw)
    w = g.const(k, f"{name}.weight")
    b = g.const(_np(params["bias"]), f"{name}.bias")
    return g.conv(x, w, b, strides=strides)


def _conv_transpose2x_nchw(g: GraphBuilder, x: str, params: Dict[str, Any],
                           name: str) -> str:
    """ConvTranspose2x params -> ONNX ConvTranspose (2x2, stride 2).

    The flax module applies its (2,2,Cin,Cout) kernel spatially flipped
    (nn/layers.py ConvTranspose2x), so the direct-tap ONNX weight is
    kernel[::-1, ::-1] transposed to (Cin, Cout, kh, kw).
    """
    k = _np(params["kernel"])[::-1, ::-1].transpose(2, 3, 0, 1)
    w = g.const(k, f"{name}.weight")
    b = g.const(_np(params["bias"]), f"{name}.bias")
    return g.conv_transpose(x, w, b, strides=(2, 2))


def _dense_pe_grid(pe_params: Dict[str, Any], size: int) -> np.ndarray:
    """get_dense_pe as a baked constant (prompt_encoder.py:62-71): (1, HW, C)."""
    gauss = _np(pe_params["positional_encoding_gaussian_matrix"])
    ys = (np.arange(size, dtype=np.float32) + 0.5) / size
    xs = (np.arange(size, dtype=np.float32) + 0.5) / size
    gx, gy = np.meshgrid(xs, ys)  # each (H, W)
    coords = np.stack([gx, gy], axis=-1)  # (H, W, 2) xy order
    c = (2.0 * coords - 1.0) @ gauss * (2.0 * np.pi)
    pe = np.concatenate([np.sin(c), np.cos(c)], axis=-1).astype(np.float32)
    return pe.reshape(1, size * size, -1)


def build_decoder_onnx(
    model,
    variables: Dict[str, Any],
    return_single_mask: bool = False,
    num_points_static: Optional[int] = None,
) -> Dict[str, Any]:
    """Build the SamOnnxModel-equivalent graph; returns a ModelProto dict.

    ``num_points_static`` is only needed with ``return_single_mask`` (the
    reference bakes point_coords.shape[1] into the score reweight,
    onnx.py:96-103,133).
    """
    cfg = model.cfg
    pe = variables["params"]["prompt_encoder"]
    md = variables["params"]["mask_decoder"]
    gs = cfg.grid_size            # 64
    C = cfg.prompt_embed_dim      # 256
    img = cfg.image_size          # 1024
    num_tokens = md["mask_tokens"].shape[0]  # 4
    heads = cfg.decoder_num_heads

    g = GraphBuilder("sam_mask_decoder")
    emb = g.add_input("image_embeddings", proto.FLOAT, [1, C, gs, gs])
    coords = g.add_input("point_coords", proto.FLOAT, ["num_labels", "num_points", 2])
    labels = g.add_input("point_labels", proto.FLOAT, ["num_labels", "num_points"])
    mask_in = g.add_input("mask_input", proto.FLOAT, [1, 1, 4 * gs, 4 * gs])
    has_mask = g.add_input("has_mask_input", proto.FLOAT, [1])
    orig_size = g.add_input("orig_im_size", proto.FLOAT, [2])

    # ---- _embed_points (onnx.py:50-67) ------------------------------------
    x = g.add(coords, g.const(np.float32(0.5)))
    x = g.div(x, g.const(np.float32(img)))
    x = g.sub(g.mul(x, g.const(np.float32(2.0))), g.const(np.float32(1.0)))
    x = g.matmul(x, g.const(_np(pe["pe_layer"]["positional_encoding_gaussian_matrix"]),
                            "pe_gaussian"))
    x = g.mul(x, g.const(np.float32(2.0 * np.pi)))
    point_pe = g.concat([g.sin(x), g.cos(x)], axis=-1)  # (B, N, C)

    lab = g.unsqueeze(labels, [-1])  # (B, N, 1)

    def lab_mask(value: float) -> str:
        return g.cast(g.equal(lab, g.const(np.float32(value))), proto.FLOAT)

    m_neg1 = lab_mask(-1.0)
    keep = g.sub(g.const(np.float32(1.0)), m_neg1)
    sparse = g.add(
        g.mul(point_pe, keep),
        g.mul(g.const(_np(pe["not_a_point_embed"]), "not_a_point"), m_neg1),
    )
    for i in range(4):
        sparse = g.add(
            sparse, g.mul(g.const(_np(pe[f"point_embed_{i}"]), f"point_embed_{i}"),
                          lab_mask(float(i)))
        )

    # ---- _embed_masks (onnx.py:69-74) --------------------------------------
    d = _conv_nchw(g, mask_in, pe["mask_conv1"], "mask_conv1", strides=(2, 2))
    d = _ln2d_nchw(g, d, pe["mask_ln1"], "mask_ln1")
    d = g.gelu_erf(d)
    d = _conv_nchw(g, d, pe["mask_conv2"], "mask_conv2", strides=(2, 2))
    d = _ln2d_nchw(g, d, pe["mask_ln2"], "mask_ln2")
    d = g.gelu_erf(d)
    d = _conv_nchw(g, d, pe["mask_conv3"], "mask_conv3")  # (1, C, gs, gs)
    h1 = g.reshape(has_mask, [1, 1, 1, 1])
    no_mask = g.const(_np(pe["no_mask_embed"]).reshape(1, C, 1, 1), "no_mask_embed")
    dense = g.add(g.mul(h1, d),
                  g.mul(g.sub(g.const(np.float32(1.0)), h1), no_mask))

    # ---- decoder core (mask_decoder.py:91-167 predict_masks) ---------------
    out_tok = np.concatenate([_np(md["iou_token"]), _np(md["mask_tokens"])], axis=0)
    out_tokens = g.const(out_tok[None], "output_tokens")  # (1, 1+M, C)
    zeros_like_sparse = g.mul(sparse, g.const(np.float32(0.0)))
    bcast = g.add(out_tokens, g.reduce_sum(zeros_like_sparse, axes=[1], keepdims=True))
    tokens = g.concat([bcast, sparse], axis=1)  # (B, 1+M+N, C)

    src = g.add(emb, dense)                       # (1, C, gs, gs)
    keys = g.transpose(g.reshape(src, [0, C, gs * gs]), [0, 2, 1])  # (1, HW, C)
    key_pe = g.const(_dense_pe_grid(pe["pe_layer"], gs), "image_pe")  # (1, HW, C)

    tr = md["transformer"]
    queries = tokens
    for i in range(cfg.decoder_depth):
        blk = tr[f"layers_{i}"]
        nm = f"layer{i}"
        # 1. token self-attention (first layer skips PE, transformer.py:151-158)
        if i == 0:
            attn = _attention(g, blk["self_attn"], f"{nm}.self", queries, queries,
                              queries, C, heads)
            queries = attn
        else:
            q = g.add(queries, tokens)
            attn = _attention(g, blk["self_attn"], f"{nm}.self", q, q, queries, C, heads)
            queries = g.add(queries, attn)
        queries = _layer_norm(g, queries, blk["norm1"], f"{nm}.norm1")
        # 2. token -> image cross-attention
        q = g.add(queries, tokens)
        k = g.add(keys, key_pe)
        attn = _attention(g, blk["cross_attn_token_to_image"], f"{nm}.t2i", q, k,
                          keys, C, heads, downsample_rate=2)
        queries = g.add(queries, attn)
        queries = _layer_norm(g, queries, blk["norm2"], f"{nm}.norm2")
        # 3. MLP
        queries = g.add(queries, _mlp_block(g, queries, blk["mlp"], f"{nm}.mlp"))
        queries = _layer_norm(g, queries, blk["norm3"], f"{nm}.norm3")
        # 4. image -> token cross-attention
        q = g.add(queries, tokens)
        k = g.add(keys, key_pe)
        attn = _attention(g, blk["cross_attn_image_to_token"], f"{nm}.i2t", k, q,
                          queries, C, heads, downsample_rate=2)
        keys = g.add(keys, attn)
        keys = _layer_norm(g, keys, blk["norm4"], f"{nm}.norm4")

    q = g.add(queries, tokens)
    k = g.add(keys, key_pe)
    attn = _attention(g, tr["final_attn_token_to_image"], "final_t2i", q, k, keys,
                      C, heads, downsample_rate=2)
    queries = g.add(queries, attn)
    queries = _layer_norm(g, queries, tr["norm_final_attn"], "norm_final")

    iou_token_out = g.gather(queries, g.const(np.int64(0)), axis=1)  # (B, C)
    iou_pred = _mlp(g, iou_token_out, md["iou_head"], "iou_head", cfg.iou_head_depth)

    # upscaling (mask_decoder.py:53-59): src comes back from the transformer
    src2 = g.transpose(keys, [0, 2, 1])            # (B, C, HW)
    src2 = g.reshape(src2, [0, C, gs, gs])
    up = _conv_transpose2x_nchw(g, src2, md["upscale_conv1"], "upscale_conv1")
    up = _ln2d_nchw(g, up, md["upscale_ln"], "upscale_ln")
    up = g.gelu_erf(up)
    up = _conv_transpose2x_nchw(g, up, md["upscale_conv2"], "upscale_conv2")
    up = g.gelu_erf(up)                            # (B, C/8, 4gs, 4gs)
    up_flat = g.reshape(up, [0, C // 8, 16 * gs * gs])

    hypers = []
    for i in range(num_tokens):
        tok = g.gather(queries, g.const(np.int64(1 + i)), axis=1)  # (B, C)
        h = _mlp(g, tok, md[f"hyper_mlp_{i}"], f"hyper_{i}", 3)    # (B, C/8)
        hypers.append(g.unsqueeze(h, [1]))
    hyper_in = g.concat(hypers, axis=1)            # (B, M, C/8)
    low_res = g.reshape(g.matmul(hyper_in, up_flat), [0, num_tokens, 4 * gs, 4 * gs])

    # optional single-mask selection (onnx.py:96-110)
    if return_single_mask:
        assert num_points_static is not None, (
            "return_single_mask bakes num_points into the score reweight"
        )
        reweight = np.zeros((1, num_tokens), np.float32)
        reweight[0, 0] = 1000.0
        score = g.add(iou_pred, g.const((num_points_static - 2.5) * reweight,
                                        "score_reweight"))
        best = g.argmax(score, axis=1, keepdims=True)  # (B, 1) int64
        onehot = g.cast(
            g.equal(g.const(np.arange(num_tokens, dtype=np.int64)), best), proto.FLOAT
        )  # (B, M)
        iou_out = g.reduce_sum(g.mul(iou_pred, onehot), axes=[1], keepdims=True)
        oh4 = g.reshape(onehot, [0, num_tokens, 1, 1])
        low_res = g.reduce_sum(g.mul(low_res, oh4), axes=[1], keepdims=True)
        n_out = 1
    else:
        iou_out = iou_pred
        n_out = num_tokens

    # ---- mask_postprocessing (onnx.py:76-94) --------------------------------
    b2 = g.slice_(g.shape(low_res), [0], [2], [0])
    sizes_full = g.concat([b2, g.i64([img, img])], axis=0)
    masks = g.resize_linear(low_res, sizes_full)
    # resize_longest_image_size (onnx.py:41-48)
    scale = g.div(g.const(np.float32(img)), g.reduce_max(orig_size, axes=[0]))
    prepad = g.floor(g.add(g.mul(orig_size, scale), g.const(np.float32(0.5))))
    prepad = g.cast(prepad, proto.INT64)
    masks = g.slice_(masks, [0, 0], prepad, [2, 3])
    orig_i = g.cast(orig_size, proto.INT64)
    sizes_orig = g.concat([b2, orig_i], axis=0)
    masks = g.resize_linear(masks, sizes_orig)

    g.add_output(masks, proto.FLOAT, ["num_labels", n_out, None, None])
    g.add_output(iou_out, proto.FLOAT, ["num_labels", n_out])
    g.add_output(low_res, proto.FLOAT, ["num_labels", n_out, 4 * gs, 4 * gs])
    # stable output names
    gr = g.model()["graph"]
    rename = {masks: "masks", iou_out: "iou_predictions", low_res: "low_res_masks"}
    for node in gr["node"]:
        node["output"] = [rename.get(o, o) for o in node["output"]]
        node["input"] = [rename.get(i, i) for i in node["input"]]
    for vi in gr["output"]:
        vi["name"] = rename.get(vi["name"], vi["name"])
    return g.model(doc="SAMRS-TPU SAM mask decoder (SamOnnxModel parity)")


def export_decoder_onnx(
    model,
    variables: Dict[str, Any],
    path: Optional[str] = None,
    return_single_mask: bool = False,
    num_points_static: Optional[int] = None,
) -> bytes:
    """Serialize the decoder to ONNX bytes; optionally write to ``path``."""
    m = build_decoder_onnx(model, variables, return_single_mask, num_points_static)
    data = proto.encode_model(m)
    if path:
        with open(path, "wb") as f:
            f.write(data)
    return data
