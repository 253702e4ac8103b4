"""PyTorch SAM checkpoint <-> flax variables porter.

The reference loads official ``sam_vit_{b,l,h}.pth`` weights with a strict
state-dict load (GD/segment_anything/build_sam.py:103-106).  This module maps
those tensors onto our flax module tree (and back) so TPU generation is
numerically identical to the GPU reference.

Weight-layout conversions:
  dense   torch (out, in)       <-> kernel (in, out)        [transpose]
  conv    torch (O, I, kh, kw)  <-> kernel (kh, kw, I, O)
  convT   torch (I, O, kh, kw)  <-> kernel (kh, kw, I, O) spatially FLIPPED
          (flax ConvTranspose convention; verified numerically against
          torch.nn.functional.conv_transpose2d in tests/test_port.py)
  raw     layernorm weight->scale, embeddings, rel-pos tables: unchanged

The mapping is one table generated from the config; both directions iterate
it, and both raise on unconsumed/missing keys (strict load).
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Tuple

import numpy as np

from samrs_tpu.core.config import SamConfig

# (torch_key, flax_path, kind) where kind in {dense, conv, convT, raw}
Entry = Tuple[str, str, str]


def _mapping_table(cfg: SamConfig) -> List[Entry]:
    t: List[Entry] = []

    def ln(tk: str, fk: str) -> None:
        t.append((f"{tk}.weight", f"{fk}/scale", "raw"))
        t.append((f"{tk}.bias", f"{fk}/bias", "raw"))

    def dense(tk: str, fk: str) -> None:
        t.append((f"{tk}.weight", f"{fk}/kernel", "dense"))
        t.append((f"{tk}.bias", f"{fk}/bias", "raw"))

    def conv(tk: str, fk: str, bias: bool = True) -> None:
        t.append((f"{tk}.weight", f"{fk}/kernel", "conv"))
        if bias:
            t.append((f"{tk}.bias", f"{fk}/bias", "raw"))

    # ---------------- image encoder ----------------
    ie, fie = "image_encoder", "image_encoder"
    conv(f"{ie}.patch_embed.proj", f"{fie}/patch_embed")
    t.append((f"{ie}.pos_embed", f"{fie}/pos_embed", "raw"))  # torch stores NHWC already
    for i in range(cfg.encoder_depth):
        tb, fb = f"{ie}.blocks.{i}", f"{fie}/blocks_{i}"
        ln(f"{tb}.norm1", f"{fb}/norm1")
        ln(f"{tb}.norm2", f"{fb}/norm2")
        dense(f"{tb}.attn.qkv", f"{fb}/attn/qkv")
        dense(f"{tb}.attn.proj", f"{fb}/attn/proj")
        t.append((f"{tb}.attn.rel_pos_h", f"{fb}/attn/rel_pos_h", "raw"))
        t.append((f"{tb}.attn.rel_pos_w", f"{fb}/attn/rel_pos_w", "raw"))
        dense(f"{tb}.mlp.lin1", f"{fb}/mlp/lin1")
        dense(f"{tb}.mlp.lin2", f"{fb}/mlp/lin2")
    conv(f"{ie}.neck.0", f"{fie}/neck_conv1", bias=False)
    ln(f"{ie}.neck.1", f"{fie}/neck_ln1")
    conv(f"{ie}.neck.2", f"{fie}/neck_conv2", bias=False)
    ln(f"{ie}.neck.3", f"{fie}/neck_ln2")

    # ---------------- prompt encoder ----------------
    pr, fpr = "prompt_encoder", "prompt_encoder"
    t.append(
        (
            f"{pr}.pe_layer.positional_encoding_gaussian_matrix",
            f"{fpr}/pe_layer/positional_encoding_gaussian_matrix",
            "raw",
        )
    )
    for i in range(4):
        t.append((f"{pr}.point_embeddings.{i}.weight", f"{fpr}/point_embed_{i}", "raw"))
    t.append((f"{pr}.not_a_point_embed.weight", f"{fpr}/not_a_point_embed", "raw"))
    t.append((f"{pr}.no_mask_embed.weight", f"{fpr}/no_mask_embed", "raw"))
    conv(f"{pr}.mask_downscaling.0", f"{fpr}/mask_conv1")
    ln(f"{pr}.mask_downscaling.1", f"{fpr}/mask_ln1")
    conv(f"{pr}.mask_downscaling.3", f"{fpr}/mask_conv2")
    ln(f"{pr}.mask_downscaling.4", f"{fpr}/mask_ln2")
    conv(f"{pr}.mask_downscaling.6", f"{fpr}/mask_conv3")

    # ---------------- mask decoder ----------------
    md, fmd = "mask_decoder", "mask_decoder"
    t.append((f"{md}.iou_token.weight", f"{fmd}/iou_token", "raw"))
    t.append((f"{md}.mask_tokens.weight", f"{fmd}/mask_tokens", "raw"))

    def attn(tk: str, fk: str) -> None:
        for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
            dense(f"{tk}.{p}", f"{fk}/{p}")

    tr, ftr = f"{md}.transformer", f"{fmd}/transformer"
    for i in range(cfg.decoder_depth):
        tl, fl = f"{tr}.layers.{i}", f"{ftr}/layers_{i}"
        attn(f"{tl}.self_attn", f"{fl}/self_attn")
        attn(f"{tl}.cross_attn_token_to_image", f"{fl}/cross_attn_token_to_image")
        attn(f"{tl}.cross_attn_image_to_token", f"{fl}/cross_attn_image_to_token")
        for n in ("norm1", "norm2", "norm3", "norm4"):
            ln(f"{tl}.{n}", f"{fl}/{n}")
        dense(f"{tl}.mlp.lin1", f"{fl}/mlp/lin1")
        dense(f"{tl}.mlp.lin2", f"{fl}/mlp/lin2")
    attn(f"{tr}.final_attn_token_to_image", f"{ftr}/final_attn_token_to_image")
    ln(f"{tr}.norm_final_attn", f"{ftr}/norm_final_attn")

    t.append((f"{md}.output_upscaling.0.weight", f"{fmd}/upscale_conv1/kernel", "convT"))
    t.append((f"{md}.output_upscaling.0.bias", f"{fmd}/upscale_conv1/bias", "raw"))
    ln(f"{md}.output_upscaling.1", f"{fmd}/upscale_ln")
    t.append((f"{md}.output_upscaling.3.weight", f"{fmd}/upscale_conv2/kernel", "convT"))
    t.append((f"{md}.output_upscaling.3.bias", f"{fmd}/upscale_conv2/bias", "raw"))

    for i in range(cfg.num_multimask_outputs + 1):
        for j in range(3):
            dense(f"{md}.output_hypernetworks_mlps.{i}.layers.{j}", f"{fmd}/hyper_mlp_{i}/layers_{j}")
    for j in range(cfg.iou_head_depth):
        dense(f"{md}.iou_prediction_head.layers.{j}", f"{fmd}/iou_head/layers_{j}")
    return t


_TO_FLAX = {
    "raw": lambda w: w,
    "dense": lambda w: np.ascontiguousarray(w.T),
    "conv": lambda w: np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
    "convT": lambda w: np.ascontiguousarray(w.transpose(2, 3, 0, 1)[::-1, ::-1]),
}
_TO_TORCH = {
    "raw": lambda w: w,
    "dense": lambda w: np.ascontiguousarray(w.T),
    "conv": lambda w: np.ascontiguousarray(w.transpose(3, 2, 0, 1)),
    "convT": lambda w: np.ascontiguousarray(w[::-1, ::-1].transpose(2, 3, 0, 1)),
}


def _set(tree: Dict[str, Any], path: str, value: np.ndarray) -> None:
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _get(tree: Mapping[str, Any], path: str) -> np.ndarray:
    node = tree
    for k in path.split("/"):
        node = node[k]
    return np.asarray(node)


def torch_sam_to_flax(state_dict: Mapping[str, Any], cfg: SamConfig) -> Dict[str, Any]:
    """Strict torch->flax port: raises on missing or unconsumed torch keys."""
    sd = {
        k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        for k, v in state_dict.items()
    }
    params: Dict[str, Any] = {}
    consumed = set()
    for tk, fk, kind in _mapping_table(cfg):
        if tk not in sd:
            raise KeyError(f"torch checkpoint missing {tk!r}")
        _set(params, fk, _TO_FLAX[kind](sd[tk]))
        consumed.add(tk)
    leftover = sorted(set(sd) - consumed)
    if leftover:
        raise ValueError(f"unconsumed torch keys ({len(leftover)}): {leftover[:8]} ...")
    return {"params": params}


def flax_sam_to_torch(variables: Mapping[str, Any], cfg: SamConfig) -> Dict[str, np.ndarray]:
    """Export our params as a torch-layout state dict (for GPU-side parity
    checks and for users migrating back)."""
    params = variables["params"] if "params" in variables else variables
    out: Dict[str, np.ndarray] = {}
    for tk, fk, kind in _mapping_table(cfg):
        out[tk] = _TO_TORCH[kind](_get(params, fk))
    return out


def load_torch_sam_checkpoint(path: str, cfg: SamConfig) -> Dict[str, Any]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return torch_sam_to_flax(sd, cfg)
