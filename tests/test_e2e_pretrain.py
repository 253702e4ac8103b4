"""End-to-end Mask2Former (E2E variant) pretraining driver test."""

import os

import numpy as np
import pytest
from PIL import Image

from samrs_tpu.core.config import DataConfig, OptimConfig, PretrainConfig
from samrs_tpu.data.datasets import SegmentationDataset
from samrs_tpu.data.transforms import EvalAugment, TrainAugment
from samrs_tpu.seg.frameworks import MultiHeadMask2FormerModel
from samrs_tpu.train.pretrain import run_pretrain

SIZE = 32


class TinyM2F(MultiHeadMask2FormerModel):
    def setup(self):
        from samrs_tpu.seg.backbones.swin import Swin
        from samrs_tpu.seg.decoders.mask2former import Mask2FormerDecoder, Mask2FormerHead

        self.encoder = Swin(embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 1, 1, 1),
                            window_size=4)
        self.seg_decoder = Mask2FormerDecoder(
            in_channels=(8, 16, 32, 64), embed_dim=32, num_queries=8,
            num_decoder_layers=3, num_heads=2,
        )
        self.heads = [
            Mask2FormerHead(nc, name=f"head_{i}") for i, nc in enumerate((18, 20))
        ]


def _make_ds(tmp_path, name, n_train=8, n_val=8):
    root = tmp_path / name
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir()
    rng = np.random.default_rng(0)
    names = [f"{name}{i}" for i in range(n_train + n_val)]
    for nm in names:
        Image.fromarray((rng.random((SIZE, SIZE, 3)) * 255).astype(np.uint8)).save(
            root / "images" / f"{nm}.png"
        )
        Image.fromarray(rng.integers(0, 18, (SIZE, SIZE)).astype(np.uint8)).save(
            root / "labels" / f"{nm}.png"
        )
    (root / "train.txt").write_text("\n".join(names[:n_train]))
    (root / "valid.txt").write_text("\n".join(names[n_train:]))
    return root


def test_m2f_pretrain_end_to_end(tmp_path):
    roots = {n: _make_ds(tmp_path, n) for n in ("sota", "sior")}
    trn = {
        n: SegmentationDataset(str(r), str(r / "images"), str(r / "labels"),
                               split="trn", transform=TrainAugment(SIZE))
        for n, r in roots.items()
    }
    val = {
        n: SegmentationDataset(str(r), str(r / "images"), str(r / "labels"),
                               split="val", transform=EvalAugment(SIZE), val_images=8)
        for n, r in roots.items()
    }
    cfg = PretrainConfig(
        backbone="swin_t", decoder="mask2former", total_iters=2, eval_interval=2,
        data=DataConfig(root=str(tmp_path), datasets=("sota", "sior"), image_size=SIZE,
                        batch_size=8, num_workers=2, val_images=8),
        optim=OptimConfig(lr=1e-4, warmup_iters=1),
        ckpt_dir=str(tmp_path / "ckpt"),
    )
    state = run_pretrain(
        cfg, model=TinyM2F(num_classes=(18, 20), image_size=SIZE),
        datasets_trn=trn, datasets_val=val,
    )
    assert int(state.step) == 2
    assert os.path.exists(tmp_path / "ckpt" / "last.msgpack")
