"""A/B twoway_impl 'fused' (image-side Pallas sweeps) vs 'xla' on the
bench decode jit (one image, 64 box prompts) + per-mask IoU parity.

r4 decode trace (12.68 ms/call): ~10 separate (64, 4096, *) sweeps per
decode — k/v/q/out projections ~490-900 us each plus LN/residual/PE-add
fusions.  The fused path runs THREE sweeps (one kv-proj + one per layer).
"""
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

results, outs = {}, {}
variables = None
for impl in ("fused", "xla"):
    cfg = sam_config("vit_h", compute_dtype="bfloat16", use_flash_attention=True,
                     twoway_impl=impl)
    model = Sam(cfg)
    if variables is None:
        variables = init_sam_variables(model, seed=0)

    @jax.jit
    def dec(c, v, f, p, l):
        f = f + c * 1e-12
        low, iou = model.apply(v, f, p, l, None, False, method=Sam.predict)
        return c + low.sum() + iou.sum(), low

    try:
        c, low = dec(jnp.float32(0), variables, feats, pts, labs); float(c)
    except Exception as e:
        print(f"{impl}: FAILED {type(e).__name__}: {str(e)[:1500]}", flush=True)
        continue
    t0 = time.perf_counter()
    c = jnp.float32(0)
    iters = 20
    for _ in range(iters):
        c, low = dec(c, variables, feats, pts, labs)
    float(c)
    dt = (time.perf_counter() - t0) / iters * 1000
    results[impl] = dt
    outs[impl] = np.asarray(low, np.float32)
    print(f"{impl}: decode64 {dt:.2f} ms/call", flush=True)

if len(outs) == 2:
    a, b = outs["fused"], outs["xla"]
    ma, mb = a > 0, b > 0  # mask threshold 0 on logits
    inter = (ma & mb).reshape(NB, -1).sum(1)
    union = (ma | mb).reshape(NB, -1).sum(1)
    iou = np.where(union == 0, 1.0, inter / np.maximum(union, 1))
    print(f"logit max abs diff {np.abs(a-b).max():.4f}; per-mask IoU "
          f"min {iou.min():.5f} mean {iou.mean():.5f}", flush=True)
print({k: round(v, 2) for k, v in results.items()}, flush=True)
