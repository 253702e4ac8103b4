"""A/B the r4 encoder candidates inside the full ViT-H encode jit, B=4.

Configs (cumulative over the block_ijb baseline):
  base       = window block_ijb + global split + tail xla  (r4 default)
  m          = + global_attn_impl='m'   (merged rel matmul, one VPU add,
               hoisted v||ones segments — kernels/flash_attention.py)
  tail       = + tail_impl='fused'      (crop+residual+LN2+MLP+residual in
               one Pallas call — kernels/fused_mlp.py)
  m_tail     = both

'm' changes global-layer rounding (one fused rel dot instead of two fp32
accumulated ones); 'tail' changes the residual-add accumulation order —
both are tolerance-level, not bit-identical, so the parity gate is a
max-abs-diff bound on the neck features (fp32, O(1) values).
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
results, outs = {}, {}
variables = None
CONFIGS = {
    "base": {},
    "m": {"global_attn_impl": "m"},
    "tail": {"tail_impl": "fused"},
    "m_tail": {"global_attn_impl": "m", "tail_impl": "fused"},
}
names = sys.argv[1].split(",") if len(sys.argv) > 1 else list(CONFIGS)
for name in names:
    cfg = sam_config("vit_h", compute_dtype="bfloat16",
                     use_flash_attention=True, **CONFIGS[name])
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
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:1200]}", flush=True)
        continue
    print(f"{name}: compile+1st {time.perf_counter()-t0:.1f}s", flush=True)
    c = jnp.float32(0)
    t0 = time.perf_counter()
    iters = 8
    for _ in range(iters):
        c, f = enc(c, variables, img)
    float(c)
    dt = (time.perf_counter() - t0) / iters / B * 1000
    results[name] = dt
    outs[name] = np.asarray(f, np.float32)
    print(f"{name}: {dt:.2f} ms/img", flush=True)

if "base" in outs:
    ref = outs["base"]
    scale = np.abs(ref).max()
    for name, o in outs.items():
        if name == "base":
            continue
        d = np.abs(ref - o).max()
        print(f"max abs diff {name} vs base: {d:.6f} (ref scale {scale:.3f})",
              flush=True)
        assert d <= 0.05 * scale, f"{name} diverges from base: {d}"
print({k: round(v, 2) for k, v in results.items()}, flush=True)
