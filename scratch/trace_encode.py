"""Capture a profiler trace of the bench encode step (B=4 ViT-H, defaults)."""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from samrs_tpu.core.config import sam_config
from samrs_tpu.sam.build import init_sam_variables
from samrs_tpu.sam.sam import Sam

cfg = sam_config("vit_h", compute_dtype="bfloat16", use_flash_attention=True)
model = Sam(cfg)
variables = init_sam_variables(model, seed=0)
rng = np.random.default_rng(0)
B = 4
img = jnp.asarray(rng.random((B, 1024, 1024, 3)), jnp.float32)

@jax.jit
def enc(c, v, x):
    f = model.apply(v, x + c * 1e-12, method=Sam.encode_image)
    return c + f.ravel()[0]

c = enc(jnp.float32(0), variables, img); float(c)
t0 = time.perf_counter()
c = jnp.float32(0)
for _ in range(6):
    c = enc(c, variables, img)
float(c)
print(f"encode B={B}: {(time.perf_counter()-t0)/6/B*1000:.2f} ms/img", flush=True)

jax.profiler.start_trace("/tmp/enc_trace")
c = jnp.float32(0)
for _ in range(2):
    c = enc(c, variables, img)
float(c)
jax.profiler.stop_trace()
print("trace done", flush=True)
