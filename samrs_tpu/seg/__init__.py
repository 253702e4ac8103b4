"""Segmentation stack: backbones, decoders, pretrain/finetune frameworks.

Reference: ED/backbone/ (7 families), ED/{unet,unetpp,upernet_mmseg_30}.py,
ED/models.py.  Every backbone returns the 5-element multi-scale list
[img, c1, c2, c3, c4] (NHWC) and exposes `out_channels`.
"""

from samrs_tpu.seg.registry import get_backbone, get_decoder, BACKBONES, DECODERS  # noqa: F401
