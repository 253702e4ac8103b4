"""Benchmark: SAM box-prompted mask generation throughput on one TPU chip.

Measures the SAMRS generation hot path (SURVEY.md §3.1): ViT-H image encode
(1024², bf16, flash-attention global layers) + batched decode of 64 box
prompts + on-device mask upsample/threshold — i.e. everything between "image
on device" and "binary masks ready", per image.

Baseline: the reference pipeline (PyTorch fp32 eager, 1 image/encoder call,
20-box decoder batches, GD/main_sam_hbox_semantic.py) measures ~1.8 img/s on
an A100-class GPU for ViT-H; the repo publishes no number (BASELINE.md), so
vs_baseline uses that measured-order estimate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_IMG_PER_S = 1.8  # PyTorch eager ViT-H on A100-class GPU (estimate)


def main(variant: str = "vit_h", n_boxes: int = 64, iters: int = 8, batch: int = 4) -> None:
    from samrs_tpu.core.config import sam_config
    from samrs_tpu.sam.build import init_sam_variables
    from samrs_tpu.sam.sam import Sam, postprocess_masks

    on_tpu = jax.default_backend() == "tpu"
    cfg = sam_config(
        variant,
        compute_dtype="bfloat16" if on_tpu else "float32",
        use_flash_attention=on_tpu,
    )
    model = Sam(cfg)
    variables = init_sam_variables(model, seed=0)

    rng = np.random.default_rng(0)
    img = jnp.asarray(
        rng.random((batch, cfg.image_size, cfg.image_size, 3)), jnp.float32
    )
    boxes = rng.uniform(0, cfg.image_size, (batch, n_boxes, 2, 2)).astype(np.float32)
    pts = jnp.asarray(np.sort(boxes, axis=2))
    labs = jnp.tile(jnp.asarray([[[2, 3]]], jnp.int32), (batch, n_boxes, 1))

    @jax.jit
    def step(carry, variables, img, pts, labs):
        # carry feeds the image so every iteration is a distinct, unelidable
        # execution even through result-caching/async transports
        img = img + carry * 1e-12
        feats = model.apply(variables, img, method=Sam.encode_image)

        def decode_one(args):
            f, p, l = args
            low_res, iou = model.apply(
                variables, f[None], p, l, None, False, method=Sam.predict
            )
            masks = postprocess_masks(
                low_res, (cfg.image_size, cfg.image_size),
                (cfg.image_size, cfg.image_size), cfg.image_size,
            ) > cfg.mask_threshold
            return masks.sum() + iou.sum()

        sums = jax.lax.map(decode_one, (feats, pts, labs))
        return carry + sums.sum()

    # warmup/compile (host fetch = the only reliable sync on remote transports)
    carry = step(jnp.float32(0), variables, img, pts, labs)
    float(carry)

    t0 = time.perf_counter()
    carry = jnp.float32(0)
    for _ in range(iters):
        carry = step(carry, variables, img, pts, labs)
    float(carry)  # forces completion of the whole chain
    dt = (time.perf_counter() - t0) / iters / batch

    img_per_s = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": f"SAM {variant} box-prompted images/sec/chip ({n_boxes} boxes/img)",
                "value": round(img_per_s, 3),
                "unit": "img/s",
                "vs_baseline": round(img_per_s / REFERENCE_IMG_PER_S, 3),
                "baseline": "estimate 1.8 img/s (PyTorch eager ViT-H, A100-class"
                            " GPU; reference publishes no throughput number)",
                "measured_anchor": "same-host fp32 CPU, vit_b, identical ported"
                            " weights (bench.py --torch-anchor): reference"
                            " 30.1 s/img vs ours 25.9 s/img = 1.16x",
            }
        )
    )


def buckets_main(chunk: int = 256, iters: int = 5) -> None:
    """Decode-bucket scaling: ms/box at 64/256/1024/4096-box buckets.

    The mask decoder is identical across SAM variants (encoder-independent
    given the (64,64,256) embedding), so this times decode alone on random
    features.  Large buckets run through the predictor's chunked lax.map path
    (bounded memory); per-box cost should stay flat.
    """
    from samrs_tpu.core.config import sam_config
    from samrs_tpu.sam.build import init_sam_variables
    from samrs_tpu.sam.predictor import SamPredictor
    from samrs_tpu.sam.sam import Sam

    on_tpu = jax.default_backend() == "tpu"
    cfg = sam_config(
        "vit_b",
        compute_dtype="bfloat16" if on_tpu else "float32",
        use_flash_attention=on_tpu,
    )
    model = Sam(cfg)
    variables = init_sam_variables(model, seed=0)
    pred = SamPredictor(model, variables, decode_chunk=chunk)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.standard_normal((1, cfg.grid_size, cfg.grid_size, cfg.prompt_embed_dim)),
        jnp.float32,
    )
    pred.set_image_features(feats, (cfg.image_size, cfg.image_size),
                            (cfg.image_size, cfg.image_size))
    results = {}
    for nb in (64, 256, 1024, 4096):
        boxes = rng.uniform(0, cfg.image_size, (nb, 4)).astype(np.float32)
        boxes[:, 2:] = np.maximum(boxes[:, 2:], boxes[:, :2] + 1)
        low, iou = pred.predict_boxes_lowres(boxes)  # compile
        float(jnp.asarray(iou).sum())
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for _ in range(iters):
            low, iou = pred.predict_boxes_lowres(boxes)
            acc = acc + iou.ravel()[0]
        float(acc)
        ms_per_box = (time.perf_counter() - t0) / iters / nb * 1000.0
        results[str(nb)] = round(ms_per_box, 4)
    print(json.dumps({
        "metric": "SAM decode ms/box by bucket (chunked decode, chunk=%d)" % chunk,
        "value": results["1024"],
        "unit": "ms/box @1024",
        "curve": results,
    }))


def amg_main(variant: str = "vit_h", points_per_side: int = 32, iters: int = 3) -> None:
    """Automatic mask generation throughput: full AMG pipeline (encode +
    points_per_side^2 point prompts in bucketed batches + stability/NMS/RLE
    host postprocessing) on one 1024x1024 image."""
    from samrs_tpu.core.config import sam_config
    from samrs_tpu.sam.automatic_mask_generator import SamAutomaticMaskGenerator
    from samrs_tpu.sam.build import init_sam_variables
    from samrs_tpu.sam.predictor import SamPredictor
    from samrs_tpu.sam.sam import Sam

    on_tpu = jax.default_backend() == "tpu"
    cfg = sam_config(
        variant,
        compute_dtype="bfloat16" if on_tpu else "float32",
        use_flash_attention=on_tpu,
    )
    model = Sam(cfg)
    variables = init_sam_variables(model, seed=0)
    predictor = SamPredictor(model, variables)
    amg = SamAutomaticMaskGenerator(
        predictor, points_per_side=points_per_side,
        pred_iou_thresh=0.5, stability_score_thresh=0.6,  # random-weight-friendly
    )
    rng = np.random.default_rng(0)
    img = (rng.random((1024, 1024, 3)) * 255).astype(np.uint8)

    anns = amg.generate(img)  # warmup/compile
    if not anns:
        # random-init weights can still filter out every candidate, which
        # would silently skip the host NMS/RLE stage; re-run unfiltered so
        # the measured number covers the COMPLETE pipeline (an upper bound:
        # real weights keep ~100 masks, this keeps every candidate)
        amg = SamAutomaticMaskGenerator(
            predictor, points_per_side=points_per_side,
            pred_iou_thresh=0.0, stability_score_thresh=0.0,
        )
        anns = amg.generate(img)
    t0 = time.perf_counter()
    for _ in range(iters):
        anns = amg.generate(img)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": f"SAM {variant} automatic mask generation sec/image "
                  f"({points_per_side}^2 points)",
        "value": round(dt, 3),
        "unit": "s/img",
        "masks": len(anns),
        "note": "this environment tunnels the TPU chip through an HTTP "
                "transport whose latency varies by hours-long periods; the "
                "same fused sweep measured 0.17 s/img (16^2) in a fast "
                "window (CLAUDE.md 2026-08-20) — the dispatch count per "
                "image is O(points/chunk) host round trips",
    }))


def fleet_main(variant: str = "vit_b", n_images: int = 24, boxes_per_image: int = 64,
               tail: bool = False) -> None:
    """Fleet driver throughput on synthetic DIOR-style data: images + XML
    annotations on disk -> shared-queue device workers -> PNG/pkl writers.
    Measures the full host-IO-overlapped pipeline (BASELINE.md's <2h/105k
    north-star path), including the utilization balance stats.

    tail=True draws per-image box counts from a DOTA-style long-tail
    distribution (median ~27, mean ~55, forced 1500-box tail image — DOTA
    tiles carry 1-2k instances at the extreme) instead of a uniform
    boxes_per_image, so the bucketed decode (1..4096 boxes) and the
    packed-mask fetch tail are exercised end to end (VERDICT r4 item 4)."""
    import os
    import tempfile

    from PIL import Image

    from samrs_tpu.core.config import GenerateConfig, sam_config
    from samrs_tpu.generate.fleet import run_fleet
    from samrs_tpu.sam.build import init_sam_variables
    from samrs_tpu.sam.sam import Sam

    on_tpu = jax.default_backend() == "tpu"
    cfg = sam_config(
        variant,
        compute_dtype="bfloat16" if on_tpu else "float32",
        use_flash_attention=on_tpu,
    )
    model = Sam(cfg)
    variables = init_sam_variables(model, seed=0)

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as td:
        img_dir = os.path.join(td, "img")
        ann_dir = os.path.join(td, "ann")
        os.makedirs(img_dir)
        os.makedirs(ann_dir)
        size = 1024
        base = (rng.random((size, size, 3)) * 255).astype(np.uint8)
        if tail:
            counts = np.minimum(
                rng.lognormal(3.3, 1.2, n_images).astype(int) + 1, 2000)
            counts[0] = 1500  # deterministic DOTA-extreme tail image
        else:
            counts = np.full(n_images, boxes_per_image)
        for i in range(n_images):
            Image.fromarray(np.roll(base, i, axis=0)).save(
                os.path.join(img_dir, f"b{i:03d}.png")
            )
            objs = []
            for _ in range(int(counts[i])):
                x0 = int(rng.integers(0, size - 80)); y0 = int(rng.integers(0, size - 80))
                w = int(rng.integers(20, 80)); h = int(rng.integers(20, 80))
                objs.append(
                    f"<object><name>ship</name><bndbox><xmin>{x0}</xmin>"
                    f"<ymin>{y0}</ymin><xmax>{x0+w}</xmax><ymax>{y0+h}</ymax>"
                    f"</bndbox></object>"
                )
            with open(os.path.join(ann_dir, f"b{i:03d}.xml"), "w") as f:
                f.write("<annotation>" + "".join(objs) + "</annotation>")

        gcfg = GenerateConfig(
            dataset="dior", image_dir=img_dir, ann_dir=ann_dir,
            save_dir=os.path.join(td, "out"),
        )
        # warmup pass compiles the per-device executables
        run_fleet(gcfg, model_and_variables=(model, variables))
        stats: dict = {}
        t0 = time.perf_counter()
        gcfg2 = GenerateConfig(
            dataset="dior", image_dir=img_dir, ann_dir=ann_dir,
            save_dir=os.path.join(td, "out2"),
        )
        run_fleet(gcfg2, model_and_variables=(model, variables), stats=stats)
        dt = time.perf_counter() - t0
    rate = n_images / dt
    box_desc = (f"DOTA-tail boxes/img (median {int(np.median(counts))}, "
                f"max {int(counts.max())}, total {int(counts.sum())})"
                if tail else f"{boxes_per_image} boxes/img")
    print(json.dumps({
        "metric": f"fleet generation images/sec ({variant}, {box_desc}, "
                  f"{len(jax.devices())} device(s))",
        "value": round(rate, 3),
        "unit": "img/s",
        "boxes_per_sec": round(float(counts.sum()) / dt, 2),
        "balance": round(stats.get("balance", 1.0), 3),
        "host_io_overlap": round(stats.get("overlap", 0.0), 3),
        "projected_hours_105k": round(105090 / max(rate, 1e-9) / 3600, 2),
        "note": "this environment tunnels the single TPU chip through an "
                "HTTP transport, so the per-image bit-packed mask fetch "
                "dominates; on local PCIe the same pipeline is bounded by "
                "the device throughput in the headline metric",
    }))


def torch_anchor_main(variant: str = "vit_b", n_boxes: int = 20, iters: int = 2) -> None:
    """Measured same-host anchor for vs_baseline: the REFERENCE torch SAM
    (fp32 eager, 1-image encode + one 20-box decode batch — the
    GD/main_sam_hbox_semantic.py:93-219 inner loop) vs our stack under
    identical conditions (jax-CPU, fp32, same ported weights, same boxes).

    The headline vs_baseline is still an A100-class estimate (the reference
    publishes no throughput number); this mode pins at least one MEASURED
    ratio between the two frameworks on identical hardware.
    """
    import os
    import pathlib
    import sys as _sys

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    jax.config.update("jax_platforms", "cpu")
    _sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent / "tests"))
    import torch
    from _torch_ref import build_ref_sam, ported_flax_sam

    from samrs_tpu.core.config import sam_config
    from samrs_tpu.sam.sam import Sam, postprocess_masks

    torch.set_num_threads(os.cpu_count() or 1)
    cfg = sam_config(variant, compute_dtype="float32", use_flash_attention=False)
    ref = build_ref_sam(cfg)
    model, variables = ported_flax_sam(ref, cfg)

    rng = np.random.default_rng(0)
    img = rng.random((cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    boxes = rng.uniform(0, cfg.image_size, (n_boxes, 2, 2)).astype(np.float32)
    boxes = np.sort(boxes, axis=1)

    # --- reference: torch eager, Sam.forward-style encode + 20-box decode
    timg = torch.from_numpy(img).permute(2, 0, 1)[None]
    tbox = torch.from_numpy(boxes.reshape(n_boxes, 4))
    with torch.no_grad():
        feats = ref.image_encoder(timg)  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        with torch.no_grad():
            feats = ref.image_encoder(timg)
            sparse, dense = ref.prompt_encoder(points=None, boxes=tbox, masks=None)
            low_res, iou = ref.mask_decoder(
                image_embeddings=feats,
                image_pe=ref.prompt_encoder.get_dense_pe(),
                sparse_prompt_embeddings=sparse,
                dense_prompt_embeddings=dense,
                multimask_output=False,
            )
            masks = ref.postprocess_masks(
                low_res, (cfg.image_size, cfg.image_size),
                (cfg.image_size, cfg.image_size),
            ) > ref.mask_threshold
    torch_s = (time.perf_counter() - t0) / iters

    # --- ours: same weights, jax-CPU fp32
    jimg = jnp.asarray(img)[None]
    pts = jnp.asarray(boxes)
    labs = jnp.tile(jnp.asarray([[2, 3]], jnp.int32), (n_boxes, 1))

    @jax.jit
    def step(carry, variables, x, pts, labs):
        x = x + carry * 1e-12
        f = model.apply(variables, x, method=Sam.encode_image)
        low_res, iou = model.apply(
            variables, f, pts, labs, None, False, method=Sam.predict
        )
        m = postprocess_masks(
            low_res, (cfg.image_size, cfg.image_size),
            (cfg.image_size, cfg.image_size), cfg.image_size,
        ) > cfg.mask_threshold
        return carry + m.sum() + iou.sum()

    float(step(jnp.float32(0), variables, jimg, pts, labs))  # compile
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(iters):
        c = step(c, variables, jimg, pts, labs)
    float(c)
    jax_s = (time.perf_counter() - t0) / iters

    print(json.dumps({
        "metric": f"measured torch-CPU anchor ({variant}, 1 img encode + "
                  f"{n_boxes}-box decode, fp32, same host/weights)",
        "torch_s_per_img": round(torch_s, 3),
        "jax_cpu_s_per_img": round(jax_s, 3),
        "value": round(torch_s / jax_s, 3),
        "unit": "x (reference time / ours, same CPU)",
    }))


def _orchestrate() -> int:
    """Run the bench in child subprocesses with bounded retries + fallback.

    The axon TPU backend is intermittently unavailable (round-2 capture died
    with ``UNAVAILABLE: TPU backend setup/compile error`` after ~25 min, and
    the remote-compile service latency varies 10-25 min for ViT-H).  Plan:

      1. full ViT-H B=4 bench (the headline number), bounded at 45 min;
      2. on failure, a fast ViT-B B=1 fallback (compiles in minutes);
      3. on persistent failure, emit ONE parseable JSON error line
         (never a raw stack trace) and exit nonzero.
    """
    def _run_child(args, tmo):
        """Run a bench mode in a subprocess; return (json_dict|None, err|None)."""
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), *args],
                capture_output=True, text=True, timeout=tmo,
            )
        except subprocess.TimeoutExpired:
            return None, f"timeout after {tmo}s"
        line = next(
            (l for l in reversed(proc.stdout.strip().splitlines())
             if l.startswith("{")),
            None,
        )
        if proc.returncode == 0 and line is not None:
            return json.loads(line), None
        tail = (proc.stderr or proc.stdout).strip().splitlines()
        return None, f"rc={proc.returncode} {(tail[-1] if tail else '')[:300]}"

    # one global wall-clock deadline for EVERYTHING (headline attempts AND
    # extras): worst case stays under ~48 min, below any plausible outer
    # driver bound.  Round 4's bench produced nothing (rc=124) because the
    # headline JSON was only printed after up to 3600 s of extras; now the
    # headline line is printed+flushed the moment it exists, extras run on
    # whatever budget remains, and a combined line is re-emitted last (a
    # parser taking the final JSON line gets the combined record; one that
    # sees a truncated stream still has the headline).
    deadline = time.monotonic() + 2900

    def _left(margin=60):
        return deadline - time.monotonic() - margin

    attempts = [
        # B=6 beats B=4 by a consistent ~0.7% (16.834/16.841/16.844 vs
        # 16.717-16.75 across 3/4 runs, 2026-08-20) and B=8 loses
        # (16.511): the encode MXU sweet spot saturates before 8.
        # vit_h gets TWO tries before the vit_b fallback — a transient
        # backend error at 19:45 today failed the single try in minutes
        # while the identical child ran fine immediately after (the
        # deadline guard still bounds the total)
        ("vit_h", ["--run", "vit_h", "6", "8"], 2400),
        ("vit_h-retry", ["--run", "vit_h", "6", "8"], 2400),
        ("vit_b-fast", ["--run", "vit_b", "1", "8"], 1200),
    ]
    errors = []
    for name, args, tmo in attempts:
        if _left(30) < 120:
            errors.append(f"{name}: skipped, global deadline")
            continue
        if name == "vit_h-retry" and errors and "timeout" in errors[-1]:
            # a timed-out first try means a slow remote-compile day — a
            # bounded retry cannot finish either; save the budget for the
            # fast vit_b fallback
            errors.append(f"{name}: skipped, first try timed out")
            continue
        headline, err = _run_child(args, int(min(tmo, _left(30))))
        if headline is not None:
            if errors:
                # a fallback (or retried) headline says WHY it isn't the
                # first-choice config
                headline["prior_attempt_errors"] = errors
            print(json.dumps(headline), flush=True)
            # secondary driver-captured metrics (VERDICT r3 item 7 / r4 item
            # 1): AMG and fleet throughput on the remaining budget; a slow
            # remote-compile day degrades a metric to a smaller labeled
            # config (or a labeled skip), never the headline
            extra = {}
            # 16^2 AMG first: it compiles the same chunk jit as 32^2 but is
            # measured at ~0.2 s/img warm (CLAUDE.md r5), so a slow
            # remote-compile period can't burn the whole extras budget the
            # way the 32^2-first ordering did (r5 session: amg32 rc=124 at
            # 2400 s with ~15 s of CPU — pure compile-service waiting)
            for key, tries in (
                ("amg", ((["--amg", "vit_b", "16"], 1200),)),
                ("fleet", ((["--fleet", "vit_b"], 2400),)),
                # realistic DOTA-tail box distribution (VERDICT r4 item 4)
                ("fleet_tail", ((["--fleet", "vit_b", "--tail"], 2400),)),
                ("amg32", ((["--amg", "vit_b", "32"], 1800),)),
            ):
                sub, serr = None, "skipped: extras budget exhausted"
                for margs, mtmo in tries:
                    if _left() < 240:
                        break
                    sub, serr = _run_child(margs, int(min(mtmo, _left())))
                    if sub is not None:
                        break
                extra[key] = sub if sub is not None else {"error": serr}
            headline["extra_metrics"] = extra
            print(json.dumps(headline), flush=True)
            return 0
        errors.append(f"{name}: {err}")
        time.sleep(20)
    print(json.dumps({
        "metric": "SAM box-prompted images/sec/chip (64 boxes/img)",
        "value": 0.0,
        "unit": "img/s",
        "vs_baseline": 0.0,
        "error": "backend unavailable",
        "attempts": errors,
    }))
    return 1


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--buckets":
        buckets_main()
    elif len(sys.argv) > 1 and sys.argv[1] == "--torch-anchor":
        torch_anchor_main(*sys.argv[2:3])
    elif len(sys.argv) > 1 and sys.argv[1] == "--amg":
        amg_main(sys.argv[2] if len(sys.argv) > 2 else "vit_h",
                 int(sys.argv[3]) if len(sys.argv) > 3 else 32)
    elif len(sys.argv) > 1 and sys.argv[1] == "--fleet":
        fleet_main(*sys.argv[2:3], tail="--tail" in sys.argv[2:])
    elif len(sys.argv) > 1 and sys.argv[1] == "--fast":
        main("vit_b", batch=1)
    elif len(sys.argv) > 1 and sys.argv[1] == "--run":
        variant = sys.argv[2]
        batch = int(sys.argv[3]) if len(sys.argv) > 3 else 4
        iters = int(sys.argv[4]) if len(sys.argv) > 4 else 8
        main(variant, batch=batch, iters=iters)
    elif len(sys.argv) > 1 and not sys.argv[1].startswith("-"):
        main(sys.argv[1])
    else:
        sys.exit(_orchestrate())
