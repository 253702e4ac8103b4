"""A/B: window_attn_impl fused vs fused2 inside the full ViT-H encoder jit, B=4."""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from samrs_tpu.core.config import sam_config
from samrs_tpu.sam.build import init_sam_variables
from samrs_tpu.sam.sam import Sam

rng = np.random.default_rng(0)
B = 4
img = jnp.asarray(rng.random((B, 1024, 1024, 3)), jnp.float32)
results = {}
outs = {}
for impl in ("fused2", "fused"):
    cfg = sam_config("vit_h", compute_dtype="bfloat16", use_flash_attention=True,
                     window_attn_impl=impl)
    model = Sam(cfg)
    variables = init_sam_variables(model, seed=0)

    @jax.jit
    def enc(c, v, x):
        f = model.apply(v, x + c * 1e-12, method=Sam.encode_image)
        return c + f.ravel()[0], f

    t0 = time.perf_counter()
    c, f = enc(jnp.float32(0), variables, img); float(c)
    print(f"{impl}: compile+1st {time.perf_counter()-t0:.1f}s", flush=True)
    c = jnp.float32(0)
    t0 = time.perf_counter()
    iters = 8
    for _ in range(iters):
        c, f = enc(c, variables, img)
    float(c)
    dt = (time.perf_counter() - t0) / iters / B * 1000
    results[impl] = dt
    outs[impl] = np.asarray(f[:1, :8, :8, :4], np.float32)
    print(f"{impl}: {dt:.2f} ms/img", flush=True)

d = np.abs(outs["fused2"] - outs["fused"]).max()
print(f"output sample max diff fused2 vs fused: {d:.5f}", flush=True)
print({k: round(v, 2) for k, v in results.items()}, flush=True)
