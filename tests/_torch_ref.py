"""Helpers for cross-framework parity tests against the PyTorch reference.

Imports /root/reference/Generate Dataset/segment_anything under torch-CPU.
torchvision is not installed in this image, so a faithful PIL-backed stub is
registered first: torchvision's `resize`/`to_pil_image` delegate to PIL for
PIL inputs, which is exactly the path the reference predictor takes
(GD/segment_anything/utils/transforms.py:31-34).
"""

from __future__ import annotations

import sys
import types

REF_ROOT = "/root/reference/Generate Dataset"


def install_torchvision_stub() -> None:
    if "torchvision" in sys.modules:
        return
    import numpy as np
    import torch
    from PIL import Image

    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    trf = types.ModuleType("torchvision.transforms.functional")
    ops = types.ModuleType("torchvision.ops")
    boxes = types.ModuleType("torchvision.ops.boxes")

    def to_pil_image(pic):
        if isinstance(pic, torch.Tensor):
            pic = pic.numpy()
        return Image.fromarray(np.asarray(pic))

    def resize(img, size, **kwargs):
        # torchvision F.resize on a PIL image == PIL bilinear resize
        assert isinstance(img, Image.Image), "stub supports PIL inputs only"
        h, w = size
        return img.resize((w, h), resample=Image.BILINEAR)

    def box_area(b):
        return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

    def batched_nms(boxes_t, scores, idxs, iou_threshold):
        # torchvision.ops.boxes.batched_nms: per-category greedy NMS done by
        # offsetting each category's boxes into a disjoint coordinate range,
        # then plain nms (IoU = inter / union, suppress strictly-greater).
        b = boxes_t.detach().numpy().astype(np.float64).copy()
        s = scores.detach().numpy().astype(np.float64)
        cat = idxs.detach().numpy()
        if len(b):
            off = cat.astype(np.float64) * (b.max() + 1.0)
            b = b + off[:, None]
        x0, y0, x1, y1 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
        areas = np.maximum(x1 - x0, 0) * np.maximum(y1 - y0, 0)
        # Stable descending sort is a deliberate deterministic choice shared
        # with samrs_tpu.sam.amg.box_nms; real torchvision NMS does NOT
        # guarantee score-tie ordering, so a future CI run against actual
        # torchvision failing only on ties is expected, not a regression.
        order = np.argsort(-s, kind="stable")
        keep = []
        while order.size:
            i = order[0]
            keep.append(i)
            rest = order[1:]
            xx0 = np.maximum(x0[i], x0[rest])
            yy0 = np.maximum(y0[i], y0[rest])
            xx1 = np.minimum(x1[i], x1[rest])
            yy1 = np.minimum(y1[i], y1[rest])
            inter = np.maximum(xx1 - xx0, 0) * np.maximum(yy1 - yy0, 0)
            iou = inter / np.maximum(areas[i] + areas[rest] - inter, 1e-12)
            order = rest[iou <= iou_threshold]
        return torch.as_tensor(np.asarray(keep, np.int64))

    trf.resize = resize
    trf.to_pil_image = to_pil_image
    boxes.box_area = box_area
    boxes.batched_nms = batched_nms
    tr.functional = trf
    ops.boxes = boxes
    tv.transforms = tr
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr
    sys.modules["torchvision.transforms.functional"] = trf
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.boxes"] = boxes


def ref_segment_anything():
    """Import and return the reference segment_anything package."""
    install_torchvision_stub()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import segment_anything as sa

    return sa


def build_ref_sam(cfg, seed: int = 0):
    """Instantiate the reference torch Sam with our SamConfig's shape
    hyper-parameters (mirrors GD/segment_anything/build_sam.py:55-101) and
    deterministic random init."""
    from functools import partial

    import torch

    sa = ref_segment_anything()
    from segment_anything.modeling import (
        ImageEncoderViT,
        MaskDecoder,
        PromptEncoder,
        Sam,
        TwoWayTransformer,
    )

    torch.manual_seed(seed)
    emb_size = cfg.image_size // cfg.patch_size
    sam = Sam(
        image_encoder=ImageEncoderViT(
            depth=cfg.encoder_depth,
            embed_dim=cfg.encoder_embed_dim,
            img_size=cfg.image_size,
            mlp_ratio=4,
            norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
            num_heads=cfg.encoder_num_heads,
            patch_size=cfg.patch_size,
            qkv_bias=True,
            use_rel_pos=True,
            global_attn_indexes=cfg.encoder_global_attn_indexes,
            window_size=cfg.window_size,
            out_chans=cfg.prompt_embed_dim,
        ),
        prompt_encoder=PromptEncoder(
            embed_dim=cfg.prompt_embed_dim,
            image_embedding_size=(emb_size, emb_size),
            input_image_size=(cfg.image_size, cfg.image_size),
            mask_in_chans=cfg.mask_in_chans,
        ),
        mask_decoder=MaskDecoder(
            num_multimask_outputs=cfg.num_multimask_outputs,
            transformer=TwoWayTransformer(
                depth=cfg.decoder_depth,
                embedding_dim=cfg.prompt_embed_dim,
                mlp_dim=cfg.decoder_mlp_dim,
                num_heads=cfg.decoder_num_heads,
            ),
            transformer_dim=cfg.prompt_embed_dim,
            iou_head_depth=cfg.iou_head_depth,
            iou_head_hidden_dim=cfg.iou_head_hidden_dim,
        ),
        pixel_mean=list(cfg.pixel_mean),
        pixel_std=list(cfg.pixel_std),
    )
    sam.eval()
    # non-degenerate weights everywhere the official init would be ~zero
    # (rel-pos tables, iou/mask tokens are zeros/empty at random init)
    gen = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for name, p in sam.named_parameters():
            if p.numel() and float(p.abs().max()) == 0.0:
                p.copy_(torch.randn(p.shape, generator=gen) * 0.02)
    return sam


def ported_flax_sam(torch_sam, cfg):
    """Port the torch Sam's weights into our flax Sam; returns (model, vars)."""
    from samrs_tpu.sam.port import torch_sam_to_flax
    from samrs_tpu.sam.sam import Sam as FlaxSam

    variables = torch_sam_to_flax(torch_sam.state_dict(), cfg)
    return FlaxSam(cfg), variables
