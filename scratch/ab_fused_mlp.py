"""A/B: mlp_impl='fused' (single-pass Pallas MLP) vs 'xla' inside the full
ViT-H encode jit at B=4 on TPU."""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from samrs_tpu.core.config import sam_config
from samrs_tpu.sam.build import init_sam_variables
from samrs_tpu.sam.sam import Sam


def run(impl: str):
    cfg = sam_config("vit_h", compute_dtype="bfloat16", use_flash_attention=True,
                     mlp_impl=impl)
    model = Sam(cfg)
    variables = init_sam_variables(model, seed=0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 1024, 1024, 3)), jnp.float32)

    @jax.jit
    def step(c, v, x):
        f = model.apply(v, x + c * 1e-12, method=Sam.encode_image)
        return c + f.ravel()[0]

    c = step(jnp.float32(0), variables, x); ref = float(c)
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(6):
        c = step(c, variables, x)
    _ = float(c)
    ms = (time.perf_counter() - t0) / 6 / 4 * 1000.0
    print(f"mlp_impl={impl}: {ms:6.1f} ms/img  (probe {ref:.5f})", flush=True)


run("xla")
run("fused")
