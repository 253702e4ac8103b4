"""Fleet-scale generation: all local TPU chips + overlapped host pipeline.

The reference parallelizes generation only by launching multiple script copies
(SURVEY.md §3.1).  Here ONE process drives every local chip:

  * images flow through ONE shared bounded work queue; each device worker
    pulls as it finishes, so skewed per-image box counts (1..2k in DOTA)
    balance automatically — no static assignment, stealing by construction;
  * each device gets a worker thread with its own predictor (variables placed
    on that device; jit executables cached per device);
  * a shared decode pool loads+parses images/annotations ahead of the
    workers (double-buffered host IO), and a writer pool overlaps PNG/pkl
    output with device compute; per-device busy time is tracked and the
    final report includes utilization balance;
  * multi-host fleets additionally shard by `shard_index/shard_count`
    (one process per host), exactly like the single-chip driver.

Target: 105k SAMRS annotations on a v5e-8 in <2h (BASELINE.md north star).
"""

from __future__ import annotations

import os
import queue
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Sequence

import jax
import numpy as np

from samrs_tpu.core.config import GenerateConfig
from samrs_tpu.data.loaders import LOADERS
from samrs_tpu.data.mapping import CLASS_SETS
from samrs_tpu.data.writers import (
    ensure_dirs,
    save_color_png,
    save_instances_pkl,
    save_semantic_png,
)
from samrs_tpu.generate.semantic import SemanticGenerator
from samrs_tpu.sam.predictor import SamPredictor


def _find_image(image_dir: str, name: str) -> Optional[str]:
    for ext in (".png", ".jpg", ".jpeg", ".tif", ".bmp"):
        p = os.path.join(image_dir, name + ext)
        if os.path.exists(p):
            return p
    return None


def run_fleet(
    cfg: GenerateConfig,
    image_list: Optional[Sequence[str]] = None,
    model_and_variables=None,
    decode_threads: int = 8,
    write_threads: int = 4,
    stats: Optional[dict] = None,
) -> int:
    from PIL import Image

    from samrs_tpu.sam.build import build_sam

    rotated = cfg.dataset in ("fair1m",)
    loader = LOADERS[cfg.dataset]
    class_names = CLASS_SETS[cfg.dataset]

    if model_and_variables is None:
        model, variables = build_sam(cfg.sam_variant, checkpoint=cfg.sam_checkpoint)
    else:
        model, variables = model_and_variables

    if image_list is None:
        image_list = sorted(
            os.path.splitext(f)[0]
            for f in os.listdir(cfg.image_dir)
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".tif", ".bmp"))
        )
    image_list = [
        n for i, n in enumerate(image_list) if i % cfg.shard_count == cfg.shard_index
    ]

    gray_dir = os.path.join(cfg.save_dir, "gray")
    color_dir = os.path.join(cfg.save_dir, "color")
    ins_dir = os.path.join(cfg.save_dir, "ins")
    ensure_dirs(gray_dir, color_dir, ins_dir)

    devices = jax.local_devices()
    n_dev = len(devices)

    # ---- host decode pipeline: ONE shared bounded queue, all workers pull ----
    work_queue: queue.Queue = queue.Queue(maxsize=max(4 * n_dev, 8))
    decode_pool = ThreadPoolExecutor(max_workers=decode_threads)
    write_pool = ThreadPoolExecutor(max_workers=write_threads)

    def decode_one(idx: int, name: str):
        ann = loader(name, cfg.ann_dir)
        if (ann.error and ann.num_instances == 0) or ann.num_instances == 0:
            return None
        path = _find_image(cfg.image_dir, name)
        if path is None:
            return None
        image = np.asarray(Image.open(path).convert("RGB"))
        return (name, image, ann)

    done_count = [0] * n_dev
    busy_time = [0.0] * n_dev
    t_start = time.perf_counter()

    def worker(dev_idx: int, encode_batch: int = 4):
        dev = devices[dev_idx]
        with jax.default_device(dev):
            dev_vars = jax.device_put(variables, dev)
            predictor = SamPredictor(model, dev_vars, buckets=cfg.box_buckets)
            gen = SemanticGenerator(predictor, class_names)

            def flush(pending):
                # batched encoder pass (one jit call for up to encode_batch
                # same-sized images), then per-image decode/paint/record
                t0 = time.perf_counter()
                groups = {}
                for item in pending:
                    groups.setdefault(item[1].shape[:2], []).append(item)
                for shape, items in groups.items():
                    encoded = predictor.encode_images([im for _, im, _ in items])
                    for (name, image, ann), enc in zip(items, encoded):
                        result = gen.process_encoded(enc, shape, ann, rotated=rotated)

                        def write(name=name, result=result):
                            save_semantic_png(
                                os.path.join(gray_dir, name + ".png"), result.gray
                            )
                            save_color_png(
                                os.path.join(color_dir, name + ".png"), result.color
                            )
                            save_instances_pkl(
                                os.path.join(ins_dir, name + ".pkl"), result.records
                            )

                        write_pool.submit(write)
                        done_count[dev_idx] += 1
                busy_time[dev_idx] += time.perf_counter() - t0

            pending: List = []
            while True:
                item = work_queue.get()
                if item is StopIteration:
                    # propagate the sentinel so every sibling worker stops
                    work_queue.put(StopIteration)
                    if pending:
                        flush(pending)
                    break
                if item is None:
                    continue
                pending.append(item)
                if len(pending) >= encode_batch:
                    flush(pending)
                    pending = []

    def feed():
        # futures resolve in submission order; the SHARED queue means the
        # next free device takes the next image (skew-proof load balance)
        futures = [decode_pool.submit(decode_one, i, name)
                   for i, name in enumerate(image_list)]
        for fut in futures:
            item = fut.result()
            if item is not None:
                work_queue.put(item)
        work_queue.put(StopIteration)

    threads = [threading.Thread(target=worker, args=(d,)) for d in range(n_dev)]
    for t in threads:
        t.start()
    feed_thread = threading.Thread(target=feed)
    feed_thread.start()
    feed_thread.join()
    for t in threads:
        t.join()
    write_pool.shutdown(wait=True)
    decode_pool.shutdown(wait=True)

    total = sum(done_count)
    dt = time.perf_counter() - t_start
    mean_busy = float(np.mean(busy_time)) if n_dev else 0.0
    balance = (min(busy_time) / max(max(busy_time), 1e-9)) if n_dev > 1 else 1.0
    print(
        f"fleet: {total} images on {n_dev} device(s) in {dt:.1f}s "
        f"({total / max(dt, 1e-9):.2f} img/s); per-device imgs {done_count}, "
        f"busy balance min/max {balance:.2f}, host-IO overlap "
        f"{mean_busy / max(dt, 1e-9):.2f}"
    )
    if stats is not None:
        stats.update(
            total=total, seconds=dt, per_device=list(done_count),
            busy_time=list(busy_time), balance=balance,
            overlap=mean_busy / max(dt, 1e-9),
        )
    return total


def main(argv: Optional[Sequence[str]] = None) -> None:
    import argparse

    p = argparse.ArgumentParser(description="fleet-scale SAMRS generation")
    p.add_argument("--dataset", default="dior", choices=["dota", "dior", "hrsc", "fair1m"])
    p.add_argument("--sam-variant", default="vit_h")
    p.add_argument("--sam-checkpoint", default=None)
    p.add_argument("--image-dir", required=True)
    p.add_argument("--ann-dir", required=True)
    p.add_argument("--save-dir", required=True)
    p.add_argument("--shard-index", type=int, default=0)
    p.add_argument("--shard-count", type=int, default=1)
    a = p.parse_args(argv)
    cfg = GenerateConfig(
        dataset=a.dataset, sam_variant=a.sam_variant, sam_checkpoint=a.sam_checkpoint,
        image_dir=a.image_dir, ann_dir=a.ann_dir, save_dir=a.save_dir,
        shard_index=a.shard_index, shard_count=a.shard_count,
    )
    run_fleet(cfg)


if __name__ == "__main__":
    main()
