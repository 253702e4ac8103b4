"""A/B the slab-skipping bilinear-gather kernels vs dense on real TPU.

MSDeformAttn at the Mask2Former 1024^2 pixel-decoder shapes (Q=21760
multi-scale tokens, levels 128/64/32/16, nH=8, D=32), offsets at the
deformable-DETR init scale (<= Pt pixels) — the regime the slab predicate
is designed for — and at a large-offset scale (every slab active) for the
worst case.  LICM-proof: the value map is perturbed by the carry each
iteration; one host fetch at the end.

Usage: python scratch/ab_slab.py [iters]
"""
import pathlib, sys, time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax
import jax.numpy as jnp
import numpy as np

from samrs_tpu.kernels.bilinear_gather import ms_deform_attn_pallas

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20

B, nH, D, Pt = 1, 8, 32, 4
shapes = [(128, 128), (64, 64), (32, 32), (16, 16)]
S = sum(h * w for h, w in shapes)
Q = S
rng = np.random.default_rng(0)

val = jnp.asarray(rng.normal(size=(B, S, nH, D)), jnp.bfloat16)
# reference points = each token's own (normalized) location, raster order
refs = []
for h, w in shapes:
    yy, xx = np.meshgrid((np.arange(h) + 0.5) / h, (np.arange(w) + 0.5) / w,
                         indexing="ij")
    refs.append(np.stack([xx, yy], -1).reshape(-1, 2))
ref = np.concatenate(refs, 0)  # (Q, 2)
w_attn = jax.nn.softmax(
    jnp.asarray(rng.normal(size=(B, Q, nH, len(shapes), Pt)), jnp.float32), axis=-1)


def make_loc(scale_px):
    # offsets in pixels OF EACH TARGET LEVEL, normalized per level
    off = (rng.random((B, Q, nH, len(shapes), Pt, 2)) * 2 - 1) * scale_px
    norm = np.array([[w, h] for h, w in shapes], np.float32)  # (L, 2)
    loc = ref[None, :, None, None, None, :] + off / norm[None, None, None, :, None, :]
    return jnp.asarray(loc, jnp.float32)


def bench(name, loc, row_slab, grad=False):
    def fwd(v, c):
        vv = v + (c * 1e-20).astype(v.dtype)
        o = ms_deform_attn_pallas(vv, shapes, loc, w_attn, row_slab=row_slab)
        return jnp.sum(o * o, dtype=jnp.float32)

    if grad:
        f = jax.jit(lambda v, c: jax.grad(fwd)(v, c).astype(jnp.float32)[0, 0, 0, 0])
    else:
        f = jax.jit(fwd)
    c = f(val, jnp.float32(0.0))
    t0 = time.perf_counter()
    for _ in range(iters):
        c = f(val, c * 1e-30)
    _ = float(c)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name}: {dt:.2f} ms/call", flush=True)
    return dt


for scale, tag in [(3.0, "init-scale offsets"), (200.0, "large offsets")]:
    loc = make_loc(scale)
    d0 = bench(f"fwd dense  ({tag})", loc, 0)
    d1 = bench(f"fwd slab16 ({tag})", loc, None)
    g0 = bench(f"fwd+bwd dense  ({tag})", loc, 0, grad=True)
    g1 = bench(f"fwd+bwd slab16 ({tag})", loc, None, grad=True)
    print(f"== {tag}: fwd {d0:.2f}->{d1:.2f} ({d0/d1:.2f}x), "
          f"fwd+bwd {g0:.2f}->{g1:.2f} ({g0/g1:.2f}x)", flush=True)

# numeric check on-TPU (dense vs slab, same inputs)
loc = make_loc(3.0)
a = ms_deform_attn_pallas(val, shapes, loc, w_attn, row_slab=0)
b = ms_deform_attn_pallas(val, shapes, loc, w_attn, row_slab=None)
d = float(jnp.max(jnp.abs(a - b)))
print(f"max |dense - slab| = {d:.3e}", flush=True)
