"""The reference's core workflow end-to-end: SEP pretrain saves an
encoder-only checkpoint; finetune grafts it and trains (SURVEY.md §3.3-3.4)."""

import os

import pytest

import numpy as np
from PIL import Image

from samrs_tpu.core.config import DataConfig, FinetuneConfig, OptimConfig, PretrainConfig
from samrs_tpu.data.datasets import ISPRS_PALETTE, ISPRSDataset, SegmentationDataset
from samrs_tpu.data.transforms import EvalAugment, TrainAugment
from samrs_tpu.seg.backbones.swin import Swin
from samrs_tpu.seg.decoders.unet import UnetDecoder
from samrs_tpu.seg.frameworks import MultiHeadSegModel, SegHead, SegModel
from samrs_tpu.train.finetune import run_finetune
from samrs_tpu.train.pretrain import run_pretrain

S = 32


class TinyPre(MultiHeadSegModel):
    def setup(self):
        self.encoder = Swin(embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 1, 1, 1),
                            window_size=4)
        self.seg_decoder = UnetDecoder(decoder_channels=(16, 16, 8, 8))
        self.heads = [SegHead(18, name="head_0")]


class TinyFt(SegModel):
    def setup(self):
        self.encoder = Swin(embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 1, 1, 1),
                            window_size=4)
        self.seg_decoder = UnetDecoder(decoder_channels=(16, 16, 8, 8))
        self.head = SegHead(6)


@pytest.mark.slow  # ~108 s e2e driver chain; full suite covers it
def test_sep_pretrain_then_finetune(tmp_path):
    rng = np.random.default_rng(0)
    root = tmp_path / "sota"
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir()
    names = [f"s{i}" for i in range(16)]
    for nm in names:
        Image.fromarray((rng.random((S, S, 3)) * 255).astype(np.uint8)).save(
            root / "images" / f"{nm}.png")
        Image.fromarray(rng.integers(0, 18, (S, S)).astype(np.uint8)).save(
            root / "labels" / f"{nm}.png")
    (root / "train.txt").write_text("\n".join(names[:8]))
    (root / "valid.txt").write_text("\n".join(names[8:]))
    trn = {"sota": SegmentationDataset(str(root), str(root / "images"), str(root / "labels"),
                                       split="trn", transform=TrainAugment(S))}
    val = {"sota": SegmentationDataset(str(root), str(root / "images"), str(root / "labels"),
                                       split="val", transform=EvalAugment(S), val_images=8)}
    pcfg = PretrainConfig(
        total_iters=1, eval_interval=1, ckpt_dir=str(tmp_path / "ckpt"),
        data=DataConfig(datasets=("sota",), image_size=S, batch_size=8, num_workers=2,
                        val_images=8),
        optim=OptimConfig(warmup_iters=1),
    )
    run_pretrain(pcfg, model=TinyPre(num_classes=(18,), image_size=S),
                 datasets_trn=trn, datasets_val=val)
    enc_ckpt = tmp_path / "ckpt" / "last_encoder.msgpack"
    assert enc_ckpt.exists()

    r2 = tmp_path / "potsdam"
    (r2 / "images").mkdir(parents=True)
    (r2 / "labels").mkdir()
    nm2 = [f"p{i}" for i in range(16)]
    for nm in nm2:
        Image.fromarray((rng.random((S, S, 3)) * 255).astype(np.uint8)).save(
            r2 / "images" / f"{nm}.png")
        Image.fromarray(ISPRS_PALETTE[rng.integers(0, 6, (S, S))]).save(
            r2 / "labels" / f"{nm}.png")
    (r2 / "train.txt").write_text("\n".join(nm2[:8]))
    (r2 / "valid.txt").write_text("\n".join(nm2[8:]))
    ftrn = ISPRSDataset(str(r2), str(r2 / "images"), str(r2 / "labels"), split="trn",
                        transform=TrainAugment(S))
    fval = ISPRSDataset(str(r2), str(r2 / "images"), str(r2 / "labels"), split="val",
                        transform=EvalAugment(S), val_images=8)
    fcfg = FinetuneConfig(
        dataset="potsdam", epochs=1, image_size=S, batch_size=8,
        pretrained=str(enc_ckpt), data=DataConfig(num_workers=2),
        optim=OptimConfig(warmup_iters=1), ckpt_dir=str(tmp_path / "ftckpt"),
    )
    state = run_finetune(fcfg, model=TinyFt(num_classes=6, image_size=S),
                         dataset_trn=ftrn, dataset_val=fval)
    assert int(state.step) == 1
    assert (tmp_path / "ftckpt" / "best.msgpack").exists()
