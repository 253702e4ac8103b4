"""A/B the MSDA level-0 sampling core at m2f 1024^2 shapes: dense hat-matmul
Pallas vs gather-forward (ghb) — fwd and fwd+bwd, LICM-proof (inputs
perturbed by the carry so the body can't be hoisted).

Shapes: the Mask2Former pixel decoder's stride-8 level at 1024^2 tiles,
B=1 x nH=8 -> BG=8, Q=21504 queries x K=4 taps over a 128x128xD=32 map.
"""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np

from samrs_tpu.kernels.bilinear_gather import _make_sampler

BG, H, W, Gc, P, K = 8, 128, 128, 32, 21504, 4
rng = np.random.default_rng(0)
xg = jnp.asarray(rng.normal(size=(BG, H, W * Gc)), jnp.bfloat16)
fx = jnp.asarray(rng.random((BG, P, K)) * W - 0.5, jnp.float32)
fy = jnp.asarray(rng.random((BG, P, K)) * H - 0.5, jnp.float32)
m = jnp.asarray(rng.random((BG, P, K)), jnp.float32)

dense = _make_sampler(Gc, False, 0, False)
ghb = _make_sampler(Gc, False, 0, True)

def bench(tag, fn, iters=20):
    @jax.jit
    def step(c, xg, fx, fy, m):
        o = fn(xg, fx + c * 1e-20, fy, m)
        return c + o.ravel()[0]
    c = step(jnp.float32(0), xg, fx, fy, m); float(c)  # compile
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(iters):
        c = step(c, xg, fx, fy, m)
    float(c)
    print(f"{tag}: {(time.perf_counter()-t0)/iters*1000:.2f} ms/call", flush=True)

def bench_grad(tag, fn, iters=20):
    def loss(xg, fx, fy, m):
        return jnp.sum(fn(xg, fx, fy, m) ** 2)
    g = jax.grad(loss, argnums=(0, 1, 2, 3))
    @jax.jit
    def step(c, xg, fx, fy, m):
        dxg, dfx, dfy, dm = g(xg, fx + c * 1e-20, fy, m)
        return c + dxg.astype(jnp.float32).ravel()[0] + dfx.ravel()[0]
    c = step(jnp.float32(0), xg, fx, fy, m); float(c)
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(iters):
        c = step(c, xg, fx, fy, m)
    float(c)
    print(f"{tag}: {(time.perf_counter()-t0)/iters*1000:.2f} ms/call", flush=True)

bench("fwd dense-hat", dense)
bench("fwd gather   ", ghb)
bench_grad("fwd+bwd dense-hat", dense)
bench_grad("fwd+bwd ghb      ", ghb)

# isolate the chunking: raise the per-corner budget so the gather fwd is a
# single chunk (11 chunks at the default 8 MB for these shapes)
import samrs_tpu.kernels.bilinear_gather as bg
bg._GATHER_CHUNK_BYTES = 512 << 20
bg._make_sampler.cache_clear()
ghb1 = bg._make_sampler(Gc, False, 0, True)
bench("fwd gather 1-chunk", ghb1)
bench_grad("fwd+bwd ghb 1-chunk", ghb1)

# pure-autodiff gather (XLA scatter-add backward) for the bwd comparison
def gather_fwd_raw(xg, fx, fy, m):
    img = xg.reshape(BG, H * W, Gc)
    x0 = jnp.floor(fx); y0 = jnp.floor(fy)
    wx = (fx - x0)[..., None]; wy = (fy - y0)[..., None]
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
    def g(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        vals = jnp.take_along_axis(img, idx.reshape(BG, P * K, 1), axis=1)
        return vals.reshape(BG, P, K, Gc) * valid[..., None]
    top = g(y0i, x0i) * (1 - wx) + g(y0i, x0i + 1) * wx
    bot = g(y0i + 1, x0i) * (1 - wx) + g(y0i + 1, x0i + 1) * wx
    samp = top * (1 - wy) + bot * wy
    return jnp.sum(samp.astype(jnp.float32) * m[..., None], axis=2)

bench("fwd gather-raw    ", gather_fwd_raw)
bench_grad("fwd+bwd gather-raw (scatter bwd)", gather_fwd_raw)
# parity spot check
a = np.asarray(dense(xg, fx, fy, m))
b = np.asarray(ghb(xg, fx, fy, m))
d = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
print(f"fwd rel-diff dense vs gather: {d:.2e}", flush=True)
