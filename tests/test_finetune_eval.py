"""Finetune driver + sliding-window TTA eval tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # multi-minute e2e; excluded from the default fast gate
from PIL import Image

from samrs_tpu.core.config import DataConfig, FinetuneConfig, OptimConfig
from samrs_tpu.data.datasets import ISPRSDataset, SegmentationDataset
from samrs_tpu.data.transforms import EvalAugment, TrainAugment
from samrs_tpu.seg.frameworks import SegModel
from samrs_tpu.train.evaluate import make_crop_forward, predict_image, run_test, scale_process
from samrs_tpu.train.finetune import run_finetune

SIZE = 32


class TinySegModel(SegModel):
    def setup(self):
        from samrs_tpu.seg.backbones.swin import Swin
        from samrs_tpu.seg.decoders.unet import UnetDecoder
        from samrs_tpu.seg.frameworks import SegHead

        self.encoder = Swin(embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 1, 1, 1),
                            window_size=4)
        self.seg_decoder = UnetDecoder(decoder_channels=(16, 16, 8, 8))
        self.head = SegHead(self.num_classes)


def _make_isprs(tmp_path, n_train=8, n_val=8):
    from samrs_tpu.data.datasets import ISPRS_PALETTE

    root = tmp_path / "potsdam"
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir()
    rng = np.random.default_rng(0)
    names = [f"p{i}" for i in range(n_train + n_val)]
    for nm in names:
        img = (rng.random((SIZE, SIZE, 3)) * 255).astype(np.uint8)
        cls = rng.integers(0, 6, (SIZE, SIZE))
        rgb = ISPRS_PALETTE[cls]
        Image.fromarray(img).save(root / "images" / f"{nm}.png")
        Image.fromarray(rgb).save(root / "labels" / f"{nm}.png")
    (root / "train.txt").write_text("\n".join(names[:n_train]))
    (root / "valid.txt").write_text("\n".join(names[n_train:]))
    return root


def test_isprs_rgb_label_mapping():
    from samrs_tpu.data.datasets import ISPRS_PALETTE, isprs_rgb_to_label

    rgb = ISPRS_PALETTE[np.array([[0, 3], [5, 1]])]
    np.testing.assert_array_equal(isprs_rgb_to_label(rgb), [[0, 3], [5, 1]])
    # unknown color -> ignore
    assert isprs_rgb_to_label(np.full((1, 1, 3), 7, np.uint8))[0, 0] == 255


def test_finetune_driver_end_to_end(tmp_path):
    root = _make_isprs(tmp_path)
    trn = ISPRSDataset(str(root), str(root / "images"), str(root / "labels"),
                       split="trn", transform=TrainAugment(SIZE))
    val = ISPRSDataset(str(root), str(root / "images"), str(root / "labels"),
                       split="val", transform=EvalAugment(SIZE), val_images=8)
    cfg = FinetuneConfig(
        dataset="potsdam", epochs=2, image_size=SIZE, batch_size=8, seed=0,
        data=DataConfig(num_workers=2), optim=OptimConfig(lr=1e-3, warmup_iters=2),
        ckpt_dir=str(tmp_path / "ckpt"),
    )
    state = run_finetune(
        cfg, model=TinySegModel(num_classes=6, image_size=SIZE),
        dataset_trn=trn, dataset_val=val,
    )
    assert int(state.step) == 2 * 1  # 8 imgs / bs 8 = 1 step/epoch
    assert (tmp_path / "ckpt" / "best.msgpack").exists()


def test_sliding_window_covers_image():
    """scale_process must visit every pixel and produce normalized probs."""
    model = TinySegModel(num_classes=4, image_size=SIZE)
    x0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x0, False
    )
    fwd = make_crop_forward(model, variables)
    img = np.random.default_rng(1).random((50, 70, 3)).astype(np.float32)
    prob = scale_process(fwd, img, 4, crop=SIZE)
    assert prob.shape == (50, 70, 4)
    np.testing.assert_allclose(prob.sum(-1), 1.0, atol=1e-4)


def test_run_test_with_tta(tmp_path):
    from samrs_tpu.data.mapping import PALETTE

    model = TinySegModel(num_classes=4, image_size=SIZE)
    x0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x0, False
    )
    rng = np.random.default_rng(2)

    class DS:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            return (
                (rng.random((40, 44, 3)) * 255).astype(np.uint8),
                rng.integers(0, 4, (40, 44)).astype(np.int32),
            )

    scores = run_test(
        model, variables, DS(), num_classes=4, crop=SIZE, scales=(1.0, 1.25),
        save_dir=str(tmp_path / "out"), palette=PALETTE,
    )
    assert 0.0 <= scores["miou"] <= 1.0
    assert (tmp_path / "out" / "gray" / "000000.png").exists()
    assert (tmp_path / "out" / "color" / "000001.png").exists()
