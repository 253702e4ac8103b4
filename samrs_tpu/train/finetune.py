"""Single-dataset finetuning driver.

Behavioral reference: ED/main_finetune.py —
  * datasets potsdam/vaihingen/isaid with image 512/512/896 (:166-229)
  * loads the SEP encoder checkpoint; ViT pos-embed is bicubic-re-interpolated
    to the new grid (:290-361) — our backbones interpolate pos-embed at apply
    time, so the raw table loads directly
  * epoch loop with per-epoch cosine schedule (:536-592)
  * metrics mIoU/mAcc/mF1/allAcc with the iSAID background skip (:490-529)
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from samrs_tpu.core.checkpoint import load_checkpoint, save_train_state
from samrs_tpu.core.config import FinetuneConfig
from samrs_tpu.core.mesh import (
    MeshSpec, make_mesh, data_sharding, put_global, replicated,
)
from samrs_tpu.core.metrics import segmentation_scores
from samrs_tpu.data.datasets import DataLoader, ISAIDDataset, ISPRSDataset
from samrs_tpu.data.transforms import EvalAugment, TrainAugment
from samrs_tpu.seg.frameworks import SegModel
from samrs_tpu.seg.registry import get_backbone
from samrs_tpu.train.optim import (
    backbone_optim_settings,
    build_optimizer,
    warmup_cosine_schedule,
)
from samrs_tpu.train.trainer import TrainState, make_eval_step, make_finetune_step

logger = logging.getLogger("samrs_tpu.finetune")

FINETUNE_DATASETS = {
    # name: (dataset class, num_classes, image size, skip background in means)
    "potsdam": (ISPRSDataset, 6, 512, False),
    "vaihingen": (ISPRSDataset, 6, 512, False),
    "isaid": (ISAIDDataset, 16, 896, True),
}


def _interp_pos_embed_tree(enc, target):
    """Cross-resolution pos-embed surgery on a grafted encoder tree: any
    `pos_embed` leaf whose token count differs from the target model's is
    bicubic-resized on the (g, g) grid with TORCH kernel semantics — the
    exact equivalent of the reference's checkpoint interpolation
    (ED/main_finetune.py:290-332: F.interpolate mode='bicubic',
    align_corners=False)."""
    from samrs_tpu.nn.interpolate import resize_bicubic_torch

    if not isinstance(enc, dict):
        return enc
    out = {}
    for k, v in enc.items():
        t = target.get(k) if isinstance(target, dict) else None
        if isinstance(v, dict):
            out[k] = _interp_pos_embed_tree(v, t if isinstance(t, dict) else {})
            continue
        if (
            k == "pos_embed" and t is not None
            and tuple(np.shape(v)) != tuple(np.shape(t)) and np.ndim(v) == 3
        ):
            g_old = int(round(v.shape[1] ** 0.5))
            g_new = int(round(np.shape(t)[1] ** 0.5))
            if g_old * g_old == v.shape[1] and g_new * g_new == np.shape(t)[1]:
                grid = jnp.asarray(v, jnp.float32).reshape(1, g_old, g_old, -1)
                grid = jnp.transpose(grid, (0, 3, 1, 2))  # NCHW for the resize
                grid = resize_bicubic_torch(grid, (g_new, g_new))
                v = np.asarray(
                    jnp.transpose(grid, (0, 2, 3, 1)).reshape(1, g_new * g_new, -1)
                )
                logger.info("pos_embed interpolated %dx%d -> %dx%d", g_old, g_old,
                            g_new, g_new)
        out[k] = v
    return out


def load_pretrained_encoder(params, ckpt_path: str, encoder_key: str = "encoder"):
    """Graft a SEP encoder-only checkpoint into a finetune param tree.

    Equivalent of main_finetune.py:290-361: pos-embed is re-interpolated
    (torch-exact bicubic) when pretrain and finetune grids differ; RVSA
    window-local rel-pos tables are resolution-independent and load as-is
    (the reference's rel-pos branch is commented out)."""
    from flax import serialization

    tree = load_checkpoint(ckpt_path)
    enc = _interp_pos_embed_tree(tree["params"][encoder_key], params[encoder_key])
    enc = serialization.from_state_dict(params[encoder_key], enc)
    new_params = dict(params)
    new_params[encoder_key] = enc
    return new_params


def run_finetune(
    cfg: FinetuneConfig,
    model: Optional[SegModel] = None,
    dataset_trn=None,
    dataset_val=None,
) -> TrainState:
    ds_cls, num_classes, default_size, skip_bg = FINETUNE_DATASETS[cfg.dataset]
    size = cfg.image_size or default_size
    if model is None:
        model = SegModel(
            backbone=cfg.backbone, decoder=cfg.decoder, num_classes=num_classes,
            image_size=size,
        )
    if dataset_trn is None:
        root = os.path.join(cfg.data.root, cfg.dataset)
        dataset_trn = ds_cls(
            root, os.path.join(root, "images"), os.path.join(root, "labels"),
            split="trn", transform=TrainAugment(size, seed=cfg.seed),
        )
        dataset_val = ds_cls(
            root, os.path.join(root, "images"), os.path.join(root, "labels"),
            split="val", transform=EvalAugment(size), val_images=cfg.data.val_images,
        )

    mesh = make_mesh(MeshSpec((-1,), ("data",)))
    repl, dsh = replicated(mesh), data_sharding(mesh)
    n_dev = mesh.size
    batch = max(n_dev, (cfg.batch_size // n_dev) * n_dev)

    loader = DataLoader(
        dataset_trn, batch_size=batch // jax.process_count(), seed=cfg.seed,
        process_index=jax.process_index(), process_count=jax.process_count(),
        num_threads=cfg.data.num_workers,
    )
    steps_per_epoch = max(len(loader), 1)
    total_steps = steps_per_epoch * cfg.epochs

    rngs = {"params": jax.random.PRNGKey(cfg.seed), "dropout": jax.random.PRNGKey(cfg.seed + 1)}
    x0 = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = model.init(rngs, x0, True)
    params = variables["params"]
    if cfg.pretrained:
        params = load_pretrained_encoder(params, cfg.pretrained)
        logger.info("loaded pretrained encoder from %s", cfg.pretrained)

    sched = warmup_cosine_schedule(
        cfg.optim.lr, total_steps, cfg.optim.warmup_iters, cfg.optim.min_lr_ratio
    )
    bset = backbone_optim_settings(
        cfg.backbone, get_backbone(cfg.backbone, image_size=size), batch
    )
    tx = build_optimizer(
        params, sched, weight_decay=cfg.optim.weight_decay,
        betas=tuple(cfg.optim.betas), grad_clip=cfg.optim.grad_clip,
        layer_decay=cfg.optim.layer_decay, optimizer=cfg.optim.optimizer,
        num_layers=bset["num_layers"], layer_id_scheme=bset["scheme"],
        depths=bset["depths"],
    )
    state = jax.device_put(TrainState.create(params, variables.get("batch_stats", {}), tx), repl)
    train_step = make_finetune_step(model, tx)
    eval_step = make_eval_step(model, num_classes)
    dropout_rng = jax.random.PRNGKey(cfg.seed + 2)

    best = -1.0
    for epoch in range(cfg.epochs):
        t0 = time.perf_counter()
        losses = []
        for x, y in loader:
            state, metrics = train_step(
                state, put_global(x, dsh), put_global(y, dsh), dropout_rng
            )
            losses.append(float(metrics["loss"]))
        scores = evaluate_simple(model, state, dataset_val, eval_step, num_classes, dsh,
                                 skip_bg)
        logger.info(
            "epoch %d/%d loss %.4f mIoU %.4f mF1 %.4f OA %.4f (%.1fs)",
            epoch + 1, cfg.epochs, float(np.mean(losses)) if losses else 0.0,
            scores["miou"], scores["mf1"], scores["all_acc"], time.perf_counter() - t0,
        )
        if jax.process_index() == 0:
            save_train_state(cfg.ckpt_dir, state, "last", {"miou": scores["miou"]})
            if scores["miou"] > best:
                best = scores["miou"]
                save_train_state(cfg.ckpt_dir, state, "best", {"miou": best})
    return state


def evaluate_simple(model, state, dataset_val, eval_step, num_classes, dsh, skip_bg):
    inter = np.zeros(num_classes)
    target = np.zeros(num_classes)
    union = np.zeros(num_classes)
    bs = max(jax.device_count(), 4)
    loader = DataLoader(
        dataset_val, batch_size=bs, shuffle=False,
        process_index=jax.process_index(), process_count=jax.process_count(),
        drop_last=False,
    )
    for x, y in loader:
        if x.shape[0] < bs:  # pad tail batch with ignore labels; all images count
            pad = bs - x.shape[0]
            x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
            y = np.concatenate([y, np.full((pad, *y.shape[1:]), 255, y.dtype)])
        iu = eval_step(state.params, state.batch_stats,
                       put_global(x, dsh), put_global(y, dsh))
        inter += np.asarray(iu[0])
        target += np.asarray(iu[1])
        union += np.asarray(iu[2])
    return segmentation_scores(inter, target, union, skip_background=skip_bg)


def main(argv: Optional[Sequence[str]] = None) -> None:
    import argparse

    p = argparse.ArgumentParser(description="SAMRS finetuning")
    p.add_argument("overrides", nargs="*")
    p.add_argument("--multihost", action="store_true")
    a = p.parse_args(argv)
    if a.multihost:
        jax.distributed.initialize()
    logging.basicConfig(level=logging.INFO)
    cfg = FinetuneConfig().override(a.overrides)
    run_finetune(cfg)


if __name__ == "__main__":
    main()
