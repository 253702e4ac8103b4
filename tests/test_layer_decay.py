"""Layer-decay id schemes + per-backbone optimizer defaults.

Oracle: the reference constructors' group lr scales —
  * ED/mmcv_custom/layer_decay_optimizer_constructor_vit.py:7-16 (ViT; the
    ViT-Adapter constructor's id fn is identical,
    layer_decay_optimizer_constructor_vitadapter.py:17-40, rate 0.95)
  * ED/mmcv_custom/custom_layer_decay_optimizer_constructor.py:17-63
    (InternImage depth-aware ids, depths [4,4,18,4], num_layers 30)
  * per-family lr/wd defaults ED/main_pretrain.py:329-409.
All constructors scale lr by rate^(N - id - 1) with N = num_layers + 2.
"""

import numpy as np
import pytest

from samrs_tpu.train.optim import (
    BACKBONE_OPTIM_DEFAULTS,
    backbone_optim_settings,
    depthwise_layer_id,
    layer_decay_scales,
    vit_layer_id,
)

DEPTHS = (4, 4, 18, 4)


def ref_internimage_id(stage_id, layer_id=None, kind="block"):
    """get_num_layer_for_swin transcribed (custom_layer_decay_optimizer_
    constructor.py:17-59): blocks count cumulatively; downsample/norm map to
    the stage boundary, last stage capped at the stage-2 boundary."""
    cum = [0, 4, 8, 26, 30]
    if kind == "block":
        return layer_id + 1 + cum[stage_id]
    # downsample / norm params
    return 1 + cum[min(stage_id + 1, 3)]


def test_depthwise_ids_match_reference():
    # every block of every stage
    for s, d in enumerate(DEPTHS):
        for b in range(d):
            got = depthwise_layer_id(f"encoder/level{s}_block{b}/attn/kernel", 30, DEPTHS)
            assert got == ref_internimage_id(s, b), (s, b, got)
    # downsample + stage norms (the reference's 'downsample'/'norm' branch)
    for s in range(4):
        for name in (f"downsample{s}", f"downsample_norm{s}", f"level_norm{s}"):
            got = depthwise_layer_id(f"encoder/{name}/scale", 30, DEPTHS)
            assert got == ref_internimage_id(s, kind="norm"), (name, got)
    # embeddings -> 0, decoder/head -> num_layers + 1 (= num_max_layer - 1)
    assert depthwise_layer_id("encoder/patch_embed/proj/kernel", 30, DEPTHS) == 0
    assert depthwise_layer_id("decoder/psp/kernel", 30, DEPTHS) == 31


def test_vitadapter_ids_match_reference():
    # layer_decay_optimizer_constructor_vitadapter.get_num_layer_for_vit:
    # embeddings -> 0, blocks.i -> i+1, everything else (adapter SPM,
    # injector/extractor, decode head) -> num_max_layer - 1 = 13
    assert vit_layer_id("encoder/pos_embed", 12) == 0
    assert vit_layer_id("encoder/patch_embed/proj/kernel", 12) == 0
    for i in range(12):
        assert vit_layer_id(f"encoder/blocks_{i}/attn/qkv/kernel", 12) == i + 1
    assert vit_layer_id("encoder/spm/stem/kernel", 12) == 13
    assert vit_layer_id("encoder/interactions_0/injector/kernel", 12) == 13
    assert vit_layer_id("decoder/head/kernel", 12) == 13


def test_scale_tree_matches_reference_group_lrs():
    rate = 0.95
    tree = {
        "encoder": {
            "pos_embed": np.zeros((1, 4, 8)),
            "blocks_0": {"kernel": np.zeros((8, 8))},
            "blocks_11": {"kernel": np.zeros((8, 8))},
            "spm": {"kernel": np.zeros((8, 8))},
        },
        "decoder": {"kernel": np.zeros((8, 8))},
    }
    scales = layer_decay_scales(tree, rate, 12, scheme="vit")
    # reference: scale = rate^(num_layers+2 - id - 1), ids 0 / 1 / 12 / 13 / 13
    assert np.isclose(scales["encoder"]["pos_embed"], rate**13)
    assert np.isclose(scales["encoder"]["blocks_0"]["kernel"], rate**12)
    assert np.isclose(scales["encoder"]["blocks_11"]["kernel"], rate**1)
    assert np.isclose(scales["encoder"]["spm"]["kernel"], rate**0)
    assert np.isclose(scales["decoder"]["kernel"], rate**0)

    # internimage depthwise tree at rate != 1 to exercise the id arithmetic
    tree2 = {
        "encoder": {
            "level0_block0": {"k": np.zeros((8, 8))},
            "level2_block17": {"k": np.zeros((8, 8))},
            "level3_block3": {"k": np.zeros((8, 8))},
            "downsample2": {"k": np.zeros((8, 8))},
        }
    }
    s2 = layer_decay_scales(tree2, 0.9, 30, scheme="depthwise", depths=DEPTHS)
    assert np.isclose(s2["encoder"]["level0_block0"]["k"], 0.9 ** (31 - 1))
    assert np.isclose(s2["encoder"]["level2_block17"]["k"], 0.9 ** (31 - 26))
    assert np.isclose(s2["encoder"]["level3_block3"]["k"], 0.9 ** (31 - 30))
    assert np.isclose(s2["encoder"]["downsample2"]["k"], 0.9 ** (31 - 27))


def test_backbone_defaults_match_main_pretrain():
    # ED/main_pretrain.py:329-409
    assert BACKBONE_OPTIM_DEFAULTS["swin_t"]["weight_decay"] == 0.01
    assert BACKBONE_OPTIM_DEFAULTS["swin_t"]["layer_decay"] is None
    assert BACKBONE_OPTIM_DEFAULTS["vit_b_rvsa"] == dict(
        lr=6e-5, weight_decay=0.05, layer_decay=0.9, scheme="vit"
    )
    s = backbone_optim_settings("internimage_t")
    assert (s["scheme"], s["layer_decay"], s["weight_decay"]) == ("depthwise", 1.0, 0.05)
    # resnet blr scaling: lr = 1e-3 * global_batch / 96
    s = backbone_optim_settings("resnet50", global_batch=192)
    assert np.isclose(s["lr"], 2e-3)


def test_num_layers_derived_from_module():
    pytest.importorskip("flax")
    from samrs_tpu.seg.registry import get_backbone

    s = backbone_optim_settings("internimage_t", get_backbone("internimage_t"))
    assert s["num_layers"] == 30 and tuple(s["depths"]) == DEPTHS
    s = backbone_optim_settings("vit_h_rvsa", get_backbone("vit_h_rvsa"))
    assert s["num_layers"] == 32 and s["depths"] is None
    s = backbone_optim_settings("vit_l_rvsa", get_backbone("vit_l_rvsa"))
    assert s["num_layers"] == 24
