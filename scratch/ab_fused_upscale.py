"""A/B: upscale_impl='fused' vs 'xla' inside the full 64-box decode jit on
TPU, plus per-mask IoU agreement between the two paths."""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from samrs_tpu.core.config import sam_config
from samrs_tpu.sam.build import init_sam_variables
from samrs_tpu.sam.sam import Sam

rng = np.random.default_rng(0)
NB = 64
feats = jnp.asarray(rng.standard_normal((1, 64, 64, 256)), jnp.float32)
boxes = rng.uniform(0, 1024, (NB, 2, 2)).astype(np.float32)
pts = jnp.asarray(np.sort(boxes, axis=1))
labs = jnp.tile(jnp.asarray([[2, 3]], jnp.int32), (NB, 1))

outs = {}
for impl in ("xla", "fused"):
    cfg = sam_config("vit_h", compute_dtype="bfloat16", use_flash_attention=True,
                     upscale_impl=impl)
    model = Sam(cfg)
    variables = init_sam_variables(model, seed=0)

    @jax.jit
    def dec(c, v, f, p, l):
        f = f + c * 1e-12
        low, iou = model.apply(v, f, p, l, None, False, method=Sam.predict)
        return c + low.sum() + iou.sum(), low

    (c, low) = dec(jnp.float32(0), variables, feats, pts, labs); float(c)
    outs[impl] = np.asarray(low)
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(10):
        c, low = dec(c, variables, feats, pts, labs)
    float(c)
    print(f"upscale_impl={impl}: {(time.perf_counter()-t0)/10*1000:7.2f} ms/img (64-box decode)", flush=True)

a, b = outs["xla"] > 0, outs["fused"] > 0
inter = (a & b).sum(axis=(1, 2, 3)); union = (a | b).sum(axis=(1, 2, 3))
iou = inter / np.maximum(union, 1)
d = np.abs(outs["xla"] - outs["fused"])
print(f"per-mask IoU fused-vs-xla: min {iou.min():.5f} mean {iou.mean():.5f}")
print(f"logit |diff|: max {d.max():.4f} mean {d.mean():.6f}")
