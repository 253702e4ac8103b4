"""A/B window-layer variants inside the full ViT-H encoder jit, B=4.

'block' (default: folded rel producer, (B,nwh,nww) grid) vs
'block_slab' (slab rel producer — kills the two ~51 MB pad-relayout copies
feeding the birwc,rck einsums and emits rel already in the 6-D window
layout) vs 'block_ijb' (batch-innermost grid — kills the ~51 MB pallas
operand relayout copy) vs 'block_sg' (both).

Evidence (r4 optimized-HLO read of the default path, per windowed layer):
  copy.1481/1486  bf16[4,70,70,1280] x2   pad relayouts for x5h/x5w einsums
  copy.1490       bf16[4,5,14,5,14,1280]  6-D reshape materialization
  copy.1492       bf16[4,5,14,5,14,1280]  pallas operand -> {5,0,4,3,2,1}
  copy.1485/89/91 bf16[...,224] x3        rel table layout/convert copies
All variants are bit-identical by construction (same kernel math).
"""
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
variables = None
IMPLS = sys.argv[1].split(",") if len(sys.argv) > 1 else (
    "block_sg", "block_slab", "block_ijb", "block")
for impl in IMPLS:
    cfg = sam_config("vit_h", compute_dtype="bfloat16", use_flash_attention=True,
                     window_attn_impl=impl)
    model = Sam(cfg)
    if variables is None:
        variables = init_sam_variables(model, seed=0)

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
    outs[impl] = np.asarray(f, np.float32)
    print(f"{impl}: {dt:.2f} ms/img", flush=True)

if "block" in outs:
    for impl in outs:
        if impl == "block":
            continue
        d = np.abs(outs["block"] - outs[impl]).max()
        print(f"FULL max abs diff {impl} vs block: {d:.6f}", flush=True)
        assert d == 0.0, f"{impl} not bit-identical to block: {d}"
print({k: round(v, 2) for k, v in results.items()}, flush=True)
