"""SEP multi-dataset segmentation pretraining driver (GSPMD data parallel).

Behavioral reference: ED/main_pretrain.py —
  * three SegmentationDatasets (SOTA/SIOR/FAST) with PROPORTIONAL per-dataset
    batch sizes by subset size 17480/11725/64147 (:233-269)
  * summed CE(ignore 255) over the three heads, grad-clip 5, per-iteration
    cosine schedule (:567-625, :656)
  * validation every eval_interval iters on last-500 splits, best+last
    checkpoints incl. encoder-only (:631-687)

TPU-native: one process per host, `jax.distributed.initialize` when multi-host;
the global batch is sharded over the `data` mesh axis; XLA inserts the grad
all-reduce and global BatchNorm; loaders shard by `jax.process_index()`.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from samrs_tpu.core.checkpoint import load_train_state, save_train_state
from samrs_tpu.core.config import PretrainConfig
from samrs_tpu.core.mesh import (
    MeshSpec, make_mesh, data_sharding, put_global, replicated,
)
from samrs_tpu.core.metrics import segmentation_scores
from samrs_tpu.data.datasets import DataLoader, SegmentationDataset, infinite_loader
from samrs_tpu.data.transforms import EvalAugment, TrainAugment
from samrs_tpu.seg.frameworks import MultiHeadSegModel
from samrs_tpu.seg.registry import get_backbone
from samrs_tpu.train.optim import (
    backbone_optim_settings,
    build_optimizer,
    warmup_cosine_schedule,
)
from samrs_tpu.train.trainer import TrainState, make_eval_step, make_pretrain_step

logger = logging.getLogger("samrs_tpu.pretrain")

# subset sizes drive the proportional split (ED/main_pretrain.py:233-242)
DATASET_SIZES = {"sota": 17480, "sior": 11725, "fast": 64147}
DATASET_CLASSES = {"sota": 18, "sior": 20, "fast": 37}

# conventional layout under data.root (ED/main_pretrain.py:189-204, made
# configurable instead of hard-coded)
DATASET_LAYOUT = {
    "sota": ("dotav2_1024/trainval", "images", "hbox_segs_init/gray", ".png"),
    "sior": ("dior", "JPEGImages-trainval", "hbox_segs_trainvaltest_init/gray", ".jpg"),
    "fast": ("fair1m_1024/trainval", "images", "rhbox_segs_init/gray", ".png"),
}


def proportional_batch_sizes(datasets: Sequence[str], global_batch: int) -> Dict[str, int]:
    """Split the global batch proportionally to subset sizes (:245-269)."""
    total = sum(DATASET_SIZES[d] for d in datasets)
    out = {}
    for d in datasets:
        out[d] = max(1, int(global_batch * DATASET_SIZES[d] / total))
    return out


def build_datasets(cfg: PretrainConfig, split: str):
    out = {}
    for i, name in enumerate(cfg.data.datasets):
        # per-dataset seed; TrainAugment additionally spawns per-thread
        # generators internally (numpy Generators are not thread-safe)
        aug = (
            TrainAugment(size=cfg.data.image_size, seed=cfg.seed * 1000 + i)
            if split == "trn"
            else EvalAugment(size=cfg.data.image_size)
        )
        sub, img_dir, lbl_dir, ext = DATASET_LAYOUT[name]
        root = os.path.join(cfg.data.root, sub)
        out[name] = SegmentationDataset(
            root=root,
            image_path=os.path.join(root, img_dir),
            label_path=os.path.join(root, lbl_dir),
            ext_img=ext,
            split=split,
            transform=aug,
            val_images=cfg.data.val_images,
        )
    return out


def run_pretrain(
    cfg: PretrainConfig,
    model: Optional[MultiHeadSegModel] = None,
    datasets_trn=None,
    datasets_val=None,
    max_iters: Optional[int] = None,
) -> TrainState:
    """Driver body.  Datasets/model injectable for tests."""
    num_classes = tuple(DATASET_CLASSES[d] for d in cfg.data.datasets)
    is_m2f = cfg.decoder == "mask2former"
    if model is None:
        if is_m2f:
            from samrs_tpu.seg.frameworks import MultiHeadMask2FormerModel

            model = MultiHeadMask2FormerModel(
                backbone=cfg.backbone,
                num_classes=num_classes,
                image_size=cfg.data.image_size,
            )
        else:
            model = MultiHeadSegModel(
                backbone=cfg.backbone,
                decoder=cfg.decoder,
                num_classes=num_classes,
                image_size=cfg.data.image_size,
                remat=cfg.remat,
            )
    if datasets_trn is None:
        datasets_trn = build_datasets(cfg, "trn")
    if datasets_val is None:
        datasets_val = build_datasets(cfg, "val")

    mesh = make_mesh(MeshSpec(tuple(cfg.mesh_shape), tuple(cfg.mesh_axes)))
    repl = replicated(mesh)
    dsh = data_sharding(mesh)

    bsizes = proportional_batch_sizes(cfg.data.datasets, cfg.data.batch_size)
    n_dev = mesh.size
    # per-dataset batch must divide the data axis for even sharding
    bsizes = {k: max(n_dev, (v // n_dev) * n_dev) for k, v in bsizes.items()}
    logger.info("per-dataset batch sizes: %s (on %d devices)", bsizes, n_dev)

    loaders = [
        infinite_loader(
            DataLoader(
                datasets_trn[name],
                batch_size=bsizes[name] // jax.process_count(),
                seed=cfg.seed,
                process_index=jax.process_index(),
                process_count=jax.process_count(),
                num_threads=cfg.data.num_workers,
            )
        )
        for name in cfg.data.datasets
    ]

    # init
    rngs = {"params": jax.random.PRNGKey(cfg.seed), "dropout": jax.random.PRNGKey(cfg.seed + 1)}
    xs_init = [
        jnp.zeros((1, cfg.data.image_size, cfg.data.image_size, 3), jnp.float32)
        for _ in cfg.data.datasets
    ]
    variables = model.init(rngs, xs_init, True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if cfg.pretrained:
        # torch MAE/IMP checkpoint grafted into the encoder, non-strict
        # (the reference's init_weights path, models.py:201-265); BN-carrying
        # families (resnet/vitae/vit_adapter) also load running statistics
        from samrs_tpu.seg.port import load_backbone_checkpoint

        params = dict(params)
        if batch_stats and "encoder" in batch_stats:
            batch_stats = dict(batch_stats)
            params["encoder"], batch_stats["encoder"] = load_backbone_checkpoint(
                cfg.pretrained, params["encoder"], batch_stats["encoder"]
            )
        else:
            params["encoder"] = load_backbone_checkpoint(cfg.pretrained, params["encoder"])
        logger.info("initialized encoder from %s (%s)", cfg.pretrained, cfg.init)

    sched = warmup_cosine_schedule(
        cfg.optim.lr, cfg.total_iters, cfg.optim.warmup_iters, cfg.optim.min_lr_ratio
    )
    # per-backbone scheme + model-derived depth (ED/main_pretrain.py:329-409);
    # lr/wd/layer_decay themselves stay cfg-driven (see apply_optim_defaults)
    bset = backbone_optim_settings(
        cfg.backbone, get_backbone(cfg.backbone, image_size=cfg.data.image_size),
        cfg.data.batch_size,
    )
    tx = build_optimizer(
        params,
        sched,
        weight_decay=cfg.optim.weight_decay,
        betas=tuple(cfg.optim.betas),
        grad_clip=cfg.optim.grad_clip,
        layer_decay=cfg.optim.layer_decay,
        num_layers=bset["num_layers"],
        optimizer=cfg.optim.optimizer,
        layer_id_scheme=bset["scheme"],
        depths=bset["depths"],
    )
    state = TrainState.create(params, batch_stats, tx)
    start_meta = {}
    if cfg.resume:
        state, start_meta = load_train_state(cfg.ckpt_dir, state, tag=cfg.resume)
        logger.info("resumed from %s at step %d", cfg.resume, int(state.step))
    state = jax.device_put(state, repl)

    if is_m2f:
        from samrs_tpu.train.trainer import make_pretrain_step_mask2former

        train_step = make_pretrain_step_mask2former(model, tx, num_classes,
                                                    num_points=cfg.m2f_num_points)
        eval_steps = [
            _make_m2f_eval_step(model, nc, head_idx=i) for i, nc in enumerate(num_classes)
        ]
    else:
        train_step = make_pretrain_step(model, tx)
        eval_steps = [
            make_eval_step(model, nc, head_idx=i) for i, nc in enumerate(num_classes)
        ]
    dropout_rng = jax.random.PRNGKey(cfg.seed + 2)

    from samrs_tpu.core.resilience import GracefulShutdown, Watchdog

    shutdown = GracefulShutdown()
    watchdog = Watchdog(timeout_s=1800.0, name="pretrain")

    best_miou = float(start_meta.get("best_miou", -1.0))
    total = max_iters if max_iters is not None else cfg.total_iters
    t0 = time.perf_counter()
    it = int(state.step)
    while it < total:
        if shutdown.should_stop:
            logger.warning("preemption: checkpointing at iter %d and exiting", it)
            if jax.process_index() == 0:
                save_train_state(cfg.ckpt_dir, state, "last", {"best_miou": best_miou})
            break
        watchdog.beat()
        batches = []
        for ld in loaders:
            x, y = next(ld)
            batches.append((put_global(x, dsh), put_global(y, dsh)))
        state, metrics = train_step(state, tuple(batches), dropout_rng)
        it += 1
        if it % 50 == 0 or it == total:
            loss = float(metrics["loss"])
            dt = (time.perf_counter() - t0) / min(it, 50)
            t0 = time.perf_counter()
            logger.info(
                "iter %d/%d loss %.4f lr %.2e %.3fs/it", it, total, loss,
                float(sched(it)), dt,
            )
        if it % cfg.eval_interval == 0 or it == total:
            miou = evaluate(
                cfg, model, state, datasets_val, eval_steps, num_classes, dsh
            )
            if jax.process_index() == 0:
                save_train_state(cfg.ckpt_dir, state, "last", {"best_miou": best_miou})
                if miou > best_miou:
                    best_miou = miou
                    save_train_state(cfg.ckpt_dir, state, "best", {"best_miou": best_miou})
            logger.info("iter %d eval mIoU %.4f (best %.4f)", it, miou, best_miou)
    watchdog.stop()
    shutdown.restore()
    return state


def _make_m2f_eval_step(model, num_classes: int, head_idx: int):
    """Eval step for the Mask2Former variant: semantic logits via
    softmax(cls).sigmoid(mask), upsampled to label resolution."""
    import jax as _jax

    from samrs_tpu.core.metrics import intersection_and_union
    from samrs_tpu.seg.decoders.mask2former import mask2former_predict

    @_jax.jit
    def eval_step(params, batch_stats, x, y):
        variables = {"params": params, "batch_stats": batch_stats}
        outs = model.apply(variables, x, head_idx, False, method=type(model).forward_one)
        cls_logits, mask_logits = outs[-1]
        seg = mask2former_predict(cls_logits, mask_logits, num_classes)
        seg = _jax.image.resize(
            seg, (seg.shape[0], y.shape[1], y.shape[2], seg.shape[-1]), "bilinear"
        )
        pred = jnp.argmax(seg, axis=-1)
        return intersection_and_union(pred, y, num_classes)

    return eval_step


def evaluate(cfg, model, state, datasets_val, eval_steps, num_classes, dsh) -> float:
    """Mean of per-dataset mIoUs on the val splits (main_pretrain.py:463-556)."""
    mious = []
    for i, name in enumerate(cfg.data.datasets):
        nc = num_classes[i]
        inter = np.zeros(nc)
        target = np.zeros(nc)
        union = np.zeros(nc)
        bs = max(jax.device_count(), 8)
        loader = DataLoader(
            datasets_val[name],
            batch_size=bs,
            shuffle=False,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            drop_last=False,
        )
        for x, y in loader:
            if x.shape[0] < bs:
                # pad the ragged tail batch (shape key + even sharding) with
                # ignore-label rows so ALL val images count (the reference
                # evaluates the full split, ED/main_pretrain.py:463-556)
                pad = bs - x.shape[0]
                x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
                y = np.concatenate([y, np.full((pad, *y.shape[1:]), 255, y.dtype)])
            iu = eval_steps[i](state.params, state.batch_stats,
                               put_global(x, dsh), put_global(y, dsh))
            # the eval step runs over the GLOBAL batch (put_global assembles
            # every process's rows), so the histograms XLA hands back are
            # already cross-host-reduced — GSPMD subsumes the reference's
            # per-rank histograms + dist.all_reduce (ED/main_pretrain.py:486).
            # iu is fully replicated; np.asarray is valid on every process.
            inter += np.asarray(iu[0])
            target += np.asarray(iu[1])
            union += np.asarray(iu[2])
        scores = segmentation_scores(inter, target, union)
        logger.info("val[%s]: mIoU %.4f allAcc %.4f", name, scores["miou"], scores["all_acc"])
        mious.append(scores["miou"])
    return float(np.mean(mious)) if mious else 0.0


def apply_optim_defaults(cfg: PretrainConfig, overrides: Sequence[str]) -> PretrainConfig:
    """Fold the per-family lr/wd/layer-decay defaults (ED/main_pretrain.py:
    329-409) into cfg.optim, keeping any explicit ``optim.*=`` CLI override."""
    fam = backbone_optim_settings(cfg.backbone, None, cfg.data.batch_size)
    explicit = {o.split("=", 1)[0] for o in overrides if "=" in o}
    for key, val in (("lr", fam["lr"]), ("weight_decay", fam["weight_decay"]),
                     ("layer_decay", fam["layer_decay"])):
        if f"optim.{key}" not in explicit:
            object.__setattr__(cfg.optim, key, val)
    return cfg


def main(argv: Optional[Sequence[str]] = None) -> None:
    import argparse

    p = argparse.ArgumentParser(description="SAMRS segmentation pretraining (SEP)")
    p.add_argument("overrides", nargs="*", help="config overrides key=value")
    p.add_argument("--multihost", action="store_true", help="jax.distributed.initialize()")
    a = p.parse_args(argv)
    if a.multihost:
        jax.distributed.initialize()
    logging.basicConfig(level=logging.INFO)
    cfg = apply_optim_defaults(PretrainConfig().override(a.overrides), a.overrides)
    run_pretrain(cfg)


if __name__ == "__main__":
    main()
