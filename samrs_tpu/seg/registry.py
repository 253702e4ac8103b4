"""Backbone / decoder registries (reference: the name-keyed zoo in
ED/models.py:69-199 and the 7-name backbone list ED/main_pretrain.py:31-32)."""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax.numpy as jnp


def _resnet(**kw):
    from samrs_tpu.seg.backbones.resnet import resnet50

    return resnet50(**kw)


def _vit_b(**kw):
    from samrs_tpu.seg.backbones.vit import vit_b

    return vit_b(**kw)


def _vit_b_rvsa(**kw):
    from samrs_tpu.seg.backbones.rvsa import vit_b_rvsa

    return vit_b_rvsa(**kw)


def _vit_l_rvsa(**kw):
    from samrs_tpu.seg.backbones.rvsa import vit_l_rvsa

    return vit_l_rvsa(**kw)


def _vit_h_rvsa(**kw):
    from samrs_tpu.seg.backbones.rvsa import vit_h_rvsa

    return vit_h_rvsa(**kw)


def _swin_t(**kw):
    from samrs_tpu.seg.backbones.swin import swin_t

    kw.pop("image_size", None)
    return swin_t(**kw)


def _vitaev2_s(**kw):
    from samrs_tpu.seg.backbones.vitae import vitaev2_s

    kw.pop("image_size", None)
    return vitaev2_s(**kw)


def _internimage_t(**kw):
    from samrs_tpu.seg.backbones.internimage import internimage_t

    kw.pop("image_size", None)
    return internimage_t(**kw)


def _vit_adapter_b(**kw):
    from samrs_tpu.seg.backbones.vit_adapter import vit_adapter_b

    return vit_adapter_b(**kw)


BACKBONES: Dict[str, Callable[..., Any]] = {
    "resnet50": _resnet,
    "vit_b": _vit_b,
    "vit_b_rvsa": _vit_b_rvsa,
    "vit_l_rvsa": _vit_l_rvsa,
    "vit_h_rvsa": _vit_h_rvsa,
    "swin_t": _swin_t,
    "vitaev2_s": _vitaev2_s,
    "internimage_t": _internimage_t,
    "vit_adapter_b": _vit_adapter_b,
}


def get_backbone(name: str, image_size: int = 224, dtype: Any = jnp.float32, **kw: Any):
    if name not in BACKBONES:
        raise KeyError(f"unknown backbone {name!r}; have {sorted(BACKBONES)}")
    return BACKBONES[name](image_size=image_size, dtype=dtype, **kw)


def get_decoder(name: str, encoder_channels, dtype: Any = jnp.float32, **kw: Any):
    """Decoder factory.  `encoder_channels` is the backbone's out_channels;
    UperNet channel width follows the reference's encoder.out_channels[2]
    (ED/models.py:176-182)."""
    if name == "unet":
        from samrs_tpu.seg.decoders.unet import UnetDecoder

        return UnetDecoder(dtype=dtype, **kw)
    if name == "unetpp":
        from samrs_tpu.seg.decoders.unetpp import UnetPlusPlusDecoder

        return UnetPlusPlusDecoder(dtype=dtype, **kw)
    if name == "upernet":
        from samrs_tpu.seg.decoders.upernet import UPerHead

        return UPerHead(channels=encoder_channels[2], dtype=dtype, **kw)
    if name == "mask2former":
        from samrs_tpu.seg.decoders.mask2former import Mask2FormerDecoder

        return Mask2FormerDecoder(in_channels=tuple(encoder_channels[1:]), dtype=dtype, **kw)
    raise KeyError(f"unknown decoder {name!r}")


DECODERS = ("unet", "unetpp", "upernet", "mask2former")
