"""A/B: window_attn_impl 'blockq' (qkv as ONE outside M=65k matmul on the
unpadded tokens; attention+proj in-kernel) vs 'block' (in-kernel M=196 qkv),
inside the full ViT-H encoder jit, B=4.

Hypothesis: the in-kernel qkv matmul runs at <=76% MXU row occupancy (196
rows -> 2 x 128-row tiles) and on +19.6% padded tokens; hoisting it to one
giant matmul trades ~250 MB/layer of extra HBM traffic (~0.3 ms) for
~10-15 ms/iter of MXU time.  Outputs must be bit-identical (pad tokens carry
k=v=bias via zero-padded no-bias matmul + in-kernel bias add).
"""
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
for impl in ("blockq", "block"):
    cfg = sam_config("vit_h", compute_dtype="bfloat16", use_flash_attention=True,
                     window_attn_impl=impl)
    model = Sam(cfg)
    if variables is None:
        variables = init_sam_variables(model, seed=0)
        # nonzero qkv/proj biases: exercise pad-token bias parity
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
        return c + f.ravel()[0].astype(jnp.float32), f

    t0 = time.perf_counter()
    try:
        c, f = enc(jnp.float32(0), variables, img); float(c)
    except Exception as e:
        print(f"{impl}: FAILED {type(e).__name__}: {str(e)[:1200]}", flush=True)
        continue
    print(f"{impl}: compile+1st {time.perf_counter()-t0:.1f}s", flush=True)
    c = jnp.float32(0)
    t0 = time.perf_counter()
    iters = 8
    for _ in range(iters):
        c, f = enc(c, variables, img)
    float(c)
    dt = (time.perf_counter() - t0) / iters / B * 1000
    results[impl] = dt
    outs[impl] = np.asarray(f, np.float32)  # FULL tensor, not a sample slice
    print(f"{impl}: {dt:.2f} ms/img", flush=True)

if "block" in outs and "blockq" in outs:
    d = np.abs(outs["block"] - outs["blockq"]).max()
    r = np.abs(outs["block"]).max()
    print(f"output FULL max abs diff blockq vs block: {d:.6f} (ref mag {r:.3f})", flush=True)
    assert d == 0.0, f"blockq is not bit-identical to block: max abs diff {d}"
print({k: round(v, 2) for k, v in results.items()}, flush=True)
