"""Capture a profiler trace of the bench decode step (one image, 64 boxes)."""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from samrs_tpu.core.config import sam_config
from samrs_tpu.sam.build import init_sam_variables
from samrs_tpu.sam.sam import Sam, postprocess_masks

cfg = sam_config("vit_h", compute_dtype="bfloat16", use_flash_attention=True, twoway_impl="fused")
model = Sam(cfg)
variables = init_sam_variables(model, seed=0)
rng = np.random.default_rng(0)
NB = 64
feats = jnp.asarray(rng.standard_normal((1, 64, 64, 256)), jnp.float32)
boxes = rng.uniform(0, 1024, (NB, 2, 2)).astype(np.float32)
pts = jnp.asarray(np.sort(boxes, axis=1))
labs = jnp.tile(jnp.asarray([[2, 3]], jnp.int32), (NB, 1))

@jax.jit
def dec(c, v, f, p, l):
    f = f + c * 1e-12
    low, iou = model.apply(v, f, p, l, None, False, method=Sam.predict)
    return c + low.sum() + iou.sum()

c = dec(jnp.float32(0), variables, feats, pts, labs); float(c)
t0 = time.perf_counter()
c = jnp.float32(0)
for _ in range(10):
    c = dec(c, variables, feats, pts, labs)
float(c)
print(f"decode64 single-image: {(time.perf_counter()-t0)/10*1000:.2f} ms/call", flush=True)

jax.profiler.start_trace("/tmp/dec_trace_fused")
c = jnp.float32(0)
for _ in range(3):
    c = dec(c, variables, feats, pts, labs)
float(c)
jax.profiler.stop_trace()
print("trace done", flush=True)
