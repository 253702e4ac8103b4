"""Component split of the bench.py pipeline on TPU: encode / decode64 /
postprocess, each timed with carry-fed per-call dispatch (honest through the
axon transport)."""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from samrs_tpu.core.config import sam_config
from samrs_tpu.sam.build import init_sam_variables
from samrs_tpu.sam.sam import Sam, postprocess_masks

cfg = sam_config("vit_h", compute_dtype="bfloat16", use_flash_attention=True)
model = Sam(cfg)
variables = init_sam_variables(model, seed=0)
rng = np.random.default_rng(0)
B, NB = 4, 64
img = jnp.asarray(rng.random((B, 1024, 1024, 3)), jnp.float32)
boxes = rng.uniform(0, 1024, (B, NB, 2, 2)).astype(np.float32)
pts = jnp.asarray(np.sort(boxes, axis=2))
labs = jnp.tile(jnp.asarray([[[2, 3]]], jnp.int32), (B, NB, 1))


def timeit(fn, args, iters=6, per=1):
    c = fn(jnp.float32(0), *args); float(c)
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(iters):
        c = fn(c, *args)
    float(c)
    return (time.perf_counter() - t0) / iters / per * 1000.0


@jax.jit
def enc(c, v, x):
    f = model.apply(v, x + c * 1e-12, method=Sam.encode_image)
    return c + f.ravel()[0]

ms = timeit(enc, (variables, img), per=B)
print(f"encode       {ms:7.2f} ms/img", flush=True)

feats = model.apply(variables, img, method=Sam.encode_image)
feats = jax.block_until_ready(feats)

@jax.jit
def dec(c, v, f, p, l):
    f = f + c * 1e-12
    def one(args):
        fi, pi, li = args
        low, iou = model.apply(v, fi[None], pi, li, None, False, method=Sam.predict)
        return low.sum() + iou.sum()
    s = jax.lax.map(one, (f, p, l))
    return c + s.sum()

ms = timeit(dec, (variables, feats, pts, labs), per=B)
print(f"decode64     {ms:7.2f} ms/img (low-res logits only)", flush=True)

@jax.jit
def dec_post(c, v, f, p, l):
    f = f + c * 1e-12
    def one(args):
        fi, pi, li = args
        low, iou = model.apply(v, fi[None], pi, li, None, False, method=Sam.predict)
        m = postprocess_masks(low, (1024, 1024), (1024, 1024), 1024) > cfg.mask_threshold
        return m.sum() + iou.sum()
    s = jax.lax.map(one, (f, p, l))
    return c + s.sum()

ms = timeit(dec_post, (variables, feats, pts, labs), per=B)
print(f"decode+post  {ms:7.2f} ms/img", flush=True)
