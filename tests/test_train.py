"""End-to-end pretrain-driver test on a synthetic mini SAMRS dataset, plus
optimizer/schedule unit tests."""

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from samrs_tpu.core.config import DataConfig, OptimConfig, PretrainConfig
from samrs_tpu.data.datasets import DataLoader, SegmentationDataset
from samrs_tpu.data.transforms import EvalAugment, TrainAugment
from samrs_tpu.seg.frameworks import MultiHeadSegModel
from samrs_tpu.train.optim import (
    build_optimizer,
    layer_decay_scales,
    no_weight_decay,
    vit_layer_id,
    warmup_cosine_schedule,
)
from samrs_tpu.train.pretrain import proportional_batch_sizes, run_pretrain


SIZE = 32


def _make_seg_dataset(tmp_path, name, n_train=12, n_val=8, n_classes=5):
    root = tmp_path / name
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir()
    rng = np.random.default_rng(hash(name) % 2**31)
    names = [f"{name}_{i}" for i in range(n_train + n_val)]
    for nm in names:
        img = (rng.random((SIZE + 8, SIZE + 8, 3)) * 255).astype(np.uint8)
        lbl = rng.integers(0, n_classes, (SIZE + 8, SIZE + 8)).astype(np.uint8)
        Image.fromarray(img).save(root / "images" / f"{nm}.png")
        Image.fromarray(lbl).save(root / "labels" / f"{nm}.png")
    (root / "train.txt").write_text("\n".join(names[:n_train]))
    (root / "valid.txt").write_text("\n".join(names[n_train:]))
    return root


def test_proportional_batch_sizes():
    b = proportional_batch_sizes(("sota", "sior", "fast"), 96)
    # 17480/93352*96=17.9 -> 17; 11725 -> 12; 64147 -> 65 (ED/main_pretrain.py:245-269)
    assert b["sota"] == 17 and b["sior"] == 12 and b["fast"] == 65


def test_layer_id_and_decay_mask():
    assert vit_layer_id("encoder/pos_embed", 12) == 0
    assert vit_layer_id("encoder/patch_embed/kernel", 12) == 0
    assert vit_layer_id("encoder/blocks_3/attn/qkv/kernel", 12) == 4
    assert vit_layer_id("seg_decoder/fpn0/conv/kernel", 12) == 13
    assert no_weight_decay("encoder/blocks_0/norm1/scale", np.zeros((8,)))
    assert no_weight_decay("encoder/pos_embed", np.zeros((1, 4, 8)))
    assert not no_weight_decay("encoder/blocks_0/attn/qkv/kernel", np.zeros((8, 8)))


def test_layer_decay_scales_tree():
    params = {
        "encoder": {"pos_embed": np.zeros((1, 2, 4)), "blocks_1": {"w": np.zeros((4, 4))}},
        "head_0": {"conv": {"kernel": np.zeros((1, 1, 4, 5))}},
    }
    scales = layer_decay_scales(params, 0.9, 2)
    assert np.isclose(scales["encoder"]["pos_embed"], 0.9**3)
    assert np.isclose(scales["encoder"]["blocks_1"]["w"], 0.9**1)
    assert np.isclose(scales["head_0"]["conv"]["kernel"], 0.9**0)


def test_warmup_cosine():
    sched = warmup_cosine_schedule(1e-3, 100, warmup_steps=10)
    assert float(sched(0)) == 0.0
    assert np.isclose(float(sched(10)), 1e-3)
    assert float(sched(100)) < 1e-4


def test_dataloader_sharding(tmp_path):
    root = _make_seg_dataset(tmp_path, "ds")
    ds = SegmentationDataset(
        str(root), str(root / "images"), str(root / "labels"), split="trn",
        transform=EvalAugment(SIZE),
    )
    l0 = DataLoader(ds, batch_size=2, process_index=0, process_count=2, shuffle=False)
    l1 = DataLoader(ds, batch_size=2, process_index=1, process_count=2, shuffle=False)
    assert len(l0) == 3  # 12 imgs / 2 procs / bs 2
    b0 = next(iter(l0))
    b1 = next(iter(l1))
    assert b0[0].shape == (2, SIZE, SIZE, 3) and b0[1].shape == (2, SIZE, SIZE)
    assert not np.array_equal(b0[0], b1[0])  # disjoint shards


@pytest.mark.slow  # ~50 s e2e pretrain driver; full suite covers it
def test_pretrain_driver_end_to_end(tmp_path, caplog):
    """Two datasets, tiny swin model, 4 iters + eval + checkpoints."""
    roots = {
        "sota": _make_seg_dataset(tmp_path, "sota"),
        "sior": _make_seg_dataset(tmp_path, "sior"),
    }
    cfg = PretrainConfig(
        backbone="swin_t",
        decoder="upernet",
        total_iters=4,
        eval_interval=4,
        seed=0,
        data=DataConfig(
            root=str(tmp_path), datasets=("sota", "sior"), image_size=SIZE,
            batch_size=16, num_workers=2, val_images=8,
        ),
        optim=OptimConfig(lr=1e-3, warmup_iters=2, layer_decay=0.9),
        ckpt_dir=str(tmp_path / "ckpt"),
        mesh_shape=(-1,),
    )
    model = MultiHeadSegModel(
        backbone="swin_t", decoder="unet", num_classes=(5, 5), image_size=SIZE
    )
    # swin_t default is too big for the test; swap in a tiny one via registry kwargs
    from samrs_tpu.seg.backbones.swin import Swin
    import flax.linen as nn

    class TinyModel(MultiHeadSegModel):
        def setup(self):
            self.encoder = Swin(embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 1, 1, 1),
                                window_size=4)
            from samrs_tpu.seg.decoders.unet import UnetDecoder
            from samrs_tpu.seg.frameworks import SegHead

            self.seg_decoder = UnetDecoder(decoder_channels=(16, 16, 8, 8))
            self.heads = [SegHead(nc, name=f"head_{i}") for i, nc in enumerate((5, 5))]

    def tiny_decoder_call(feats, train=False):  # unused
        pass

    trn = {
        name: SegmentationDataset(
            str(r), str(r / "images"), str(r / "labels"), split="trn",
            transform=TrainAugment(SIZE, rng=np.random.default_rng(0)),
        )
        for name, r in roots.items()
    }
    val = {
        name: SegmentationDataset(
            str(r), str(r / "images"), str(r / "labels"), split="val",
            transform=EvalAugment(SIZE), val_images=8,
        )
        for name, r in roots.items()
    }
    state = run_pretrain(
        cfg, model=TinyModel(num_classes=(5, 5), image_size=SIZE),
        datasets_trn=trn, datasets_val=val,
    )
    assert int(state.step) == 4
    assert os.path.exists(tmp_path / "ckpt" / "last.msgpack")
    assert os.path.exists(tmp_path / "ckpt" / "last_encoder.msgpack")


def test_resume_roundtrip(tmp_path):
    """Save at step N, resume, state.step must restore."""
    import optax

    from samrs_tpu.core.checkpoint import load_train_state, save_train_state
    from samrs_tpu.train.trainer import TrainState

    params = {"encoder": {"w": jnp.ones((3, 3))}}
    tx = optax.adam(1e-3)
    state = TrainState.create(params, {}, tx)
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    save_train_state(str(tmp_path), state, "last", {"best_miou": 0.5})
    state2 = TrainState.create(
        {"encoder": {"w": jnp.zeros((3, 3))}}, {}, tx
    )
    restored, meta = load_train_state(str(tmp_path), state2, "last")
    assert int(restored.step) == 7
    assert meta["best_miou"] == 0.5
    np.testing.assert_array_equal(np.asarray(restored.params["encoder"]["w"]), 1.0)
