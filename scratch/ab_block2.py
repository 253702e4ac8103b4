"""A/B: window_attn_impl 'block2' (partial blocks of the unpadded maps +
in-kernel residual add) vs 'block', inside the full ViT-H encoder jit, B=4."""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
import flax
from samrs_tpu.core.config import sam_config
from samrs_tpu.sam.build import init_sam_variables
from samrs_tpu.sam.sam import Sam

rng = np.random.default_rng(0)
B = 4
img = jnp.asarray(rng.random((B, 1024, 1024, 3)), jnp.float32)
results = {}
outs = {}
variables = None
for impl in ("block2", "block"):
    cfg = sam_config("vit_h", compute_dtype="bfloat16", use_flash_attention=True,
                     window_attn_impl=impl)
    model = Sam(cfg)
    if variables is None:
        variables = init_sam_variables(model, seed=0)
        flat = flax.traverse_util.flatten_dict(variables["params"])
        for k in flat:
            if k[-1] == "bias" and ("qkv" in k or "proj" in k):
                flat[k] = jnp.asarray(
                    np.random.default_rng(hash(k) % 2**32).normal(
                        size=flat[k].shape).astype(np.float32) * 0.02)
        variables = {"params": flax.traverse_util.unflatten_dict(flat)}

    @jax.jit
    def enc(c, v, x):
        f = model.apply(v, x + c * 1e-12, method=Sam.encode_image)
        return c + f.ravel()[0], f

    t0 = time.perf_counter()
    c, f = enc(jnp.float32(0), variables, img)
    float(c)
    print(f"{impl}: compile+1st {time.perf_counter()-t0:.1f}s", flush=True)
    outs[impl] = np.asarray(f[:1, :4, :4, :8], np.float32)
    t0 = time.perf_counter()
    c = jnp.float32(0)
    n = 6
    for _ in range(n):
        c, f = enc(c, variables, img)
    float(c)
    dt = (time.perf_counter() - t0) / n / B * 1000
    results[impl] = round(dt, 2)
    print(f"{impl}: {dt:.2f} ms/img", flush=True)

d = np.abs(outs["block2"] - outs["block"]).max()
mag = np.abs(outs["block"]).max()
print(f"output sample max abs diff block2 vs block: {d:.6f} (ref mag {mag:.3f})")
print(results)
