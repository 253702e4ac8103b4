"""End-to-end Mask2Former (E2E variant) pretraining driver test."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute e2e; excluded from the default fast gate
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


def test_m2f_point_sampled_step_sharded(tmp_path):
    """One Mask2Former train step with POINT-SAMPLED losses, batch sharded
    over the 8-device mesh — covers the Hungarian pure_callback and the
    uncertainty point sampler under GSPMD."""
    import jax
    import jax.numpy as jnp
    from samrs_tpu.core.mesh import MeshSpec, data_sharding, make_mesh, replicated
    from samrs_tpu.train.optim import build_optimizer, warmup_cosine_schedule
    from samrs_tpu.train.trainer import TrainState, make_pretrain_step_mask2former

    model = TinyM2F(num_classes=(18, 20), image_size=SIZE)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    xs0 = [jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)] * 2
    variables = model.init(rngs, xs0, True)
    tx = build_optimizer(variables["params"], warmup_cosine_schedule(1e-4, 10, 1),
                         layer_decay=0.9, num_layers=4)
    state = TrainState.create(variables["params"], variables.get("batch_stats", {}), tx)
    step = make_pretrain_step_mask2former(model, tx, (18, 20), num_points=64)

    mesh = make_mesh(MeshSpec((-1,), ("data",)))
    dsh = data_sharding(mesh)
    state = jax.device_put(state, replicated(mesh))
    rng = np.random.default_rng(0)
    batches = tuple(
        (
            jax.device_put(jnp.asarray(rng.random((8, SIZE, SIZE, 3)), jnp.float32), dsh),
            jax.device_put(jnp.asarray(rng.integers(0, nc, (8, SIZE, SIZE)), jnp.int32), dsh),
        )
        for nc in (18, 20)
    )
    with mesh:
        state, metrics = step(state, batches, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
