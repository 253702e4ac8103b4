"""A/B the shared-keys (src_uniform) decode vs the broadcast decode.

Layer 0 of a no-mask-prompt decode has an image side identical across the
prompt batch; the src_uniform path keeps it at batch 1 (t2i kv projection at
B=1, i2t kernel reading the shared keys block once per row).  Times both
inside the full 64-box decode jit and checks value parity.
"""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from samrs_tpu.core.config import sam_config
from samrs_tpu.sam.build import init_sam_variables
from samrs_tpu.sam.sam import Sam

cfg = sam_config("vit_h", compute_dtype="bfloat16", use_flash_attention=True,
                 twoway_impl="fused")
model = Sam(cfg)
variables = init_sam_variables(model, seed=0)
rng = np.random.default_rng(0)
NB = 64
feats = jnp.asarray(rng.standard_normal((1, 64, 64, 256)), jnp.float32)
boxes = rng.uniform(0, 1024, (NB, 2, 2)).astype(np.float32)
pts = jnp.asarray(np.sort(boxes, axis=1))
labs = jnp.tile(jnp.asarray([[2, 3]], jnp.int32), (NB, 1))


@jax.jit
def dec_shared(c, v, f, p, l):
    f = f + c * 1e-12
    low, iou = model.apply(v, f, p, l, None, False, method=Sam.predict)
    return c + low.sum() + iou.sum(), low


@jax.jit
def dec_bcast(c, v, f, p, l):
    f = f + c * 1e-12
    sparse, dense = model.apply(v, p, l, None, method=Sam.encode_prompts)
    low, iou = model.apply(v, f, sparse, dense, False, method=Sam.decode_masks)
    return c + low.sum() + iou.sum(), low


def run(fn, tag, iters=20):
    c, low = fn(jnp.float32(0), variables, feats, pts, labs)
    float(c)
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(iters):
        c, low = fn(c, variables, feats, pts, labs)
    float(c)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{tag}: {dt:.2f} ms/call", flush=True)
    return dt, np.asarray(low)


dt_b, low_b = run(dec_bcast, "decode64 broadcast")
dt_s, low_s = run(dec_shared, "decode64 shared-keys")
# per-mask IoU on thresholded low-res logits
mb, ms = low_b > 0, low_s > 0
inter = (mb & ms).sum(axis=(1, 2, 3))
union = (mb | ms).sum(axis=(1, 2, 3))
iou = inter / np.maximum(union, 1)
print(f"per-mask IoU shared vs broadcast: min {iou.min():.5f} mean {iou.mean():.5f}")
print(f"speedup: {dt_b / dt_s:.3f}x ({dt_b:.2f} -> {dt_s:.2f} ms)")
