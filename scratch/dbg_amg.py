"""Phase-timed AMG debug on TPU: where does the grid sweep spend time?

Usage: python scratch/dbg_amg.py [variant] [points_per_side]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

t00 = time.perf_counter()


def stamp(msg):
    print(f"[{time.perf_counter() - t00:8.1f}s] {msg}", flush=True)


variant = sys.argv[1] if len(sys.argv) > 1 else "vit_b"
pps = int(sys.argv[2]) if len(sys.argv) > 2 else 16

import jax
import jax.numpy as jnp

from samrs_tpu.core.config import sam_config
from samrs_tpu.sam.automatic_mask_generator import SamAutomaticMaskGenerator
from samrs_tpu.sam.build import init_sam_variables
from samrs_tpu.sam.predictor import SamPredictor
from samrs_tpu.sam.sam import Sam

stamp(f"imports done, backend={jax.default_backend()}")
on_tpu = jax.default_backend() == "tpu"
cfg = sam_config(variant, compute_dtype="bfloat16" if on_tpu else "float32",
                 use_flash_attention=on_tpu)
model = Sam(cfg)
variables = init_sam_variables(model, seed=0)
stamp("model init done")
pred = SamPredictor(model, variables)
rng = np.random.default_rng(0)
img = (rng.random((1024, 1024, 3)) * 255).astype(np.uint8)
pred.set_image(img)
stamp("set_image (encode compile+run) done")

n = pps * pps
nb = 64
G = max(1, -(-n // nb))
pts = np.zeros((G * nb, 2, 2), np.float32)
labs = np.full((G * nb, 2), -1, np.int32)
pts[:n, 0] = rng.random((n, 2)) * 1024
labs[:n, 0] = 1
stats_d, packed = pred.amg_sweep(pts.reshape(G, nb, 2, 2),
                                 labs.reshape(G, nb, 2), 1.0)
stamp(f"amg_sweep dispatch returned (G={G})")
stats = np.asarray(stats_d)
stamp(f"stats fetched {stats.shape}")
t0 = time.perf_counter()
stats_d, packed = pred.amg_sweep(pts.reshape(G, nb, 2, 2),
                                 labs.reshape(G, nb, 2), 1.0)
stats = np.asarray(stats_d)
stamp(f"second sweep call+fetch: {time.perf_counter() - t0:.2f}s")
idx = np.arange(min(32, G * nb * 3))
t0 = time.perf_counter()
pk = pred.amg_take_packed(packed, idx)
stamp(f"take_packed(32) compile+fetch: {time.perf_counter() - t0:.2f}s {pk.shape}")

amg = SamAutomaticMaskGenerator(pred, points_per_side=pps,
                                pred_iou_thresh=0.5, stability_score_thresh=0.6)
t0 = time.perf_counter()
anns = amg.generate(img)
stamp(f"amg.generate warm: {time.perf_counter() - t0:.2f}s masks={len(anns)}")
t0 = time.perf_counter()
anns = amg.generate(img)
stamp(f"amg.generate again: {time.perf_counter() - t0:.2f}s masks={len(anns)}")
