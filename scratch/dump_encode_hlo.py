"""Dump optimized HLO of the bench encode step (same program as
trace_encode.py, so the remote-compile cache hits) and list the hot
copy/fusion ops with shapes + source metadata."""
import pathlib, re, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from samrs_tpu.core.config import sam_config
from samrs_tpu.sam.build import init_sam_variables
from samrs_tpu.sam.sam import Sam

cfg = sam_config("vit_h", compute_dtype="bfloat16", use_flash_attention=True)
model = Sam(cfg)
variables = init_sam_variables(model, seed=0)
rng = np.random.default_rng(0)
B = 4
img = jnp.asarray(rng.random((B, 1024, 1024, 3)), jnp.float32)

@jax.jit
def enc(c, v, x):
    f = model.apply(v, x + c * 1e-12, method=Sam.encode_image)
    return c + f.ravel()[0]

lowered = enc.lower(jnp.float32(0), variables, img)
comp = lowered.compile()
txt = comp.as_text()
open("/tmp/enc_hlo.txt", "w").write(txt)
print("HLO chars:", len(txt))

# summarize copies: name, shape, metadata op_name
for m in re.finditer(r"^\s*%?(copy[.\d]*) = (\S+) copy\(([^)]*)\)(.*)$",
                     txt, re.M):
    name, shape, _, rest = m.groups()
    meta = re.search(r'op_name="([^"]+)"', rest)
    print(f"{name:18s} {shape:42s} {meta.group(1)[:90] if meta else ''}")
