"""Bisect the aug-kernel B=4 compile crash: B and tq sweep, kernel called
directly (no custom_vjp wrapper)."""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from samrs_tpu.kernels.flash_attention import _qkv_flash_aug_pallas

H, W, C, nH = 64, 64, 1280, 16
hd = C // nH
rng = np.random.default_rng(0)
Rh = jnp.asarray(rng.normal(size=(H, H, hd)) * 0.1, jnp.float32)
Rw = jnp.asarray(rng.normal(size=(W, W, hd)) * 0.1, jnp.float32)

for B, tq in [(2, 256), (4, 128), (4, 256)]:
    qkv = jnp.asarray(rng.normal(size=(B, H * W, 3 * C)), jnp.bfloat16)

    @jax.jit
    def f(x):
        return _qkv_flash_aug_pallas(x, Rh, Rw, (H, W), hd**-0.5, nH, tq=tq)

    try:
        t0 = time.perf_counter()
        o = f(qkv)
        print(f"B={B} tq={tq}: ok {o.shape} "
              f"{float(jnp.asarray(o, jnp.float32).ravel()[0]):.4f} "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
    except Exception as e:
        print(f"B={B} tq={tq}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
