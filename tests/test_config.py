"""Config system tests (dataclass tree, CLI overrides, JSON round-trip)."""

import pytest

from samrs_tpu.core.config import (
    FinetuneConfig,
    GenerateConfig,
    PretrainConfig,
    SamConfig,
    sam_config,
)


def test_sam_variants():
    h = sam_config("vit_h")
    assert h.encoder_embed_dim == 1280 and h.encoder_depth == 32
    assert h.encoder_global_attn_indexes == (7, 15, 23, 31)
    b = sam_config("vit_b")
    assert b.encoder_embed_dim == 768 and b.grid_size == 64
    with pytest.raises(KeyError):
        sam_config("vit_x")


def test_override_nested():
    cfg = PretrainConfig()
    out = cfg.override(["backbone=swin_t", "data.batch_size=32", "optim.lr=0.001",
                        "data.datasets=sota,fast", "total_iters=100"])
    assert out.backbone == "swin_t"
    assert out.data.batch_size == 32
    assert out.optim.lr == 0.001
    assert out.data.datasets == ("sota", "fast")
    assert out.total_iters == 100
    # original untouched
    assert cfg.data.batch_size == 96


def test_override_bool_and_optional():
    cfg = GenerateConfig()
    out = cfg.override(["sam_checkpoint=none"])
    assert out.sam_checkpoint is None
    out = cfg.override(["sam_checkpoint=/x/y.pth"])
    assert out.sam_checkpoint == "/x/y.pth"


def test_override_unknown_key():
    with pytest.raises(KeyError):
        PretrainConfig().override(["nope=1"])


def test_json_roundtrip():
    import json

    cfg = FinetuneConfig(dataset="isaid", epochs=3)
    d = json.loads(cfg.to_json())
    assert d["dataset"] == "isaid" and d["epochs"] == 3
    back = FinetuneConfig.from_dict(d)
    assert back.dataset == "isaid"
