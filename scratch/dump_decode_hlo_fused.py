"""Dump optimized HLO of the decode step and locate hot fusions."""
import pathlib, sys, re
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from samrs_tpu.core.config import sam_config
from samrs_tpu.sam.build import init_sam_variables
from samrs_tpu.sam.sam import Sam

cfg = sam_config("vit_h", compute_dtype="bfloat16", use_flash_attention=True, twoway_impl="fused")
model = Sam(cfg)
variables = init_sam_variables(model, seed=0)
rng = np.random.default_rng(0)
NB = 64
feats = jnp.asarray(rng.standard_normal((1, 64, 64, 256)), jnp.float32)
boxes = rng.uniform(0, 1024, (NB, 2, 2)).astype(np.float32)
pts = jnp.asarray(np.sort(boxes, axis=1))
labs = jnp.tile(jnp.asarray([[2, 3]], jnp.int32), (NB, 1))

@jax.jit
def dec(c, v, f, p, l):
    f = f + c * 1e-12
    low, iou = model.apply(v, f, p, l, None, False, method=Sam.predict)
    return c + low.sum() + iou.sum()

lowered = dec.lower(jnp.float32(0), variables, feats, pts, labs)
comp = lowered.compile()
txt = comp.as_text()
open('/tmp/dec_hlo_fused.txt','w').write(txt)
print(len(txt))
