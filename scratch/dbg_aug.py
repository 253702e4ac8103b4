"""Compile the aug global kernel standalone at ViT-H shapes to surface the
Mosaic error hidden behind the remote-compile HTTP 500."""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from samrs_tpu.kernels.flash_attention import flash_attention_qkv_relpos

B, H, W, C, nH = 1, 64, 64, 1280, 16
if len(sys.argv) > 1:
    B, H, W, C, nH = map(int, sys.argv[1].split(","))
hd = C // nH
rng = np.random.default_rng(0)
qkv = jnp.asarray(rng.normal(size=(B, H * W, 3 * C)), jnp.bfloat16)
Rh = jnp.asarray(rng.normal(size=(H, H, hd)) * 0.1, jnp.float32)
Rw = jnp.asarray(rng.normal(size=(W, W, hd)) * 0.1, jnp.float32)

@jax.jit
def f(x):
    return flash_attention_qkv_relpos(x, Rh, Rw, (H, W), hd**-0.5, nH,
                                      variant="aug")

try:
    t0 = time.perf_counter()
    o = f(qkv)
    print("ok", o.shape, float(jnp.asarray(o, jnp.float32).ravel()[0]),
          f"{time.perf_counter()-t0:.1f}s", flush=True)
except Exception as e:
    print(f"FAILED {type(e).__name__}:", flush=True)
    print(str(e)[:4000], flush=True)
