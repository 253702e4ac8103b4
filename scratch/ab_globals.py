"""A/B global_attn_impl 'aug' (rel-pos folded into the qk matmul via
augmented 128-aligned per-head segments) vs 'split' (separate in-kernel rel
matmuls + fp32 VPU adds), inside the full ViT-H encoder jit, B=4.

Hypothesis (r3 trace): each of the 4 global layers costs 7.2 ms/iter vs 2.1
for a windowed layer on near-identical matmul FLOPs.  The split kernel pays
~2 ms/layer of fp32 (TQ, N) VPU adds accumulating the rel matmuls and per-
head in-kernel v||ones concats; aug moves ALL of it into the existing MXU
tiles (contraction 208 lanes occupies the same two 128-lane tiles, and the
ones lane rides the free tail of the 80->128 pv output tile).

Numerics: both compute the same fp32-accumulated logits; bf16 rounding of
rel_h/rel_w happens in both (split also feeds bf16 rel through the MXU), so
outputs should agree to ~bf16 tolerance (compared below, not bit-exact:
add-order differs between one fused dot and three accumulated dots).
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
IMPLS = sys.argv[1].split(",") if len(sys.argv) > 1 else ("aug", "split")
for impl in IMPLS:
    cfg = sam_config("vit_h", compute_dtype="bfloat16", use_flash_attention=True,
                     global_attn_impl=impl)
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

if len(outs) == 2:
    a, b = outs.values()
    d = np.abs(a - b).max()
    r = np.abs(a).max()
    print(f"FULL max abs diff: {d:.6f} (mag {r:.3f})", flush=True)
print({k: round(v, 2) for k, v in results.items()}, flush=True)
