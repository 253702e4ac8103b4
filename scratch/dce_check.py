"""Verify save_only_these_names('msda_sampled') DCEs the sampler fwd in bwd."""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from samrs_tpu.kernels.bilinear_gather import sample_weighted

rng = np.random.default_rng(0)
BG, H, W, Gc, P, K = 2, 16, 16, 8, 64, 4
xg = jnp.asarray(rng.standard_normal((BG, H, W * Gc)), jnp.float32)
fx = jnp.asarray(rng.uniform(0, W - 1, (BG, P, K)), jnp.float32)
fy = jnp.asarray(rng.uniform(0, H - 1, (BG, P, K)), jnp.float32)
mask = jnp.asarray(rng.uniform(size=(BG, P, K)), jnp.float32)
wo = jnp.asarray(rng.standard_normal((Gc, Gc)), jnp.float32)


def body(xg, fx, fy, mask, wo):
    out = sample_weighted(xg, fx, fy, mask, Gc, interpret=True)
    out = checkpoint_name(out, "msda_sampled")
    return jnp.tanh(out @ wo)


def loss_plain(*a):
    return jnp.sum(body(*a) ** 2)


remat_body = jax.checkpoint(
    body, policy=jax.checkpoint_policies.save_only_these_names("msda_sampled"))
remat_body_plain = jax.checkpoint(body)


def loss_saved(*a):
    return jnp.sum(remat_body(*a) ** 2)


def loss_rematall(*a):
    return jnp.sum(remat_body_plain(*a) ** 2)


def count_pallas(f):
    jaxpr = jax.make_jaxpr(jax.grad(f, argnums=(0, 1, 2, 3, 4)))(xg, fx, fy, mask, wo)
    text = str(jaxpr)
    return text.count("pallas_call")


for name, f in [("plain", loss_plain), ("remat+save", loss_saved),
                ("remat-all", loss_rematall)]:
    print(name, "pallas_call count:", count_pallas(f))

g0 = jax.grad(loss_plain, argnums=(0, 1, 2, 3, 4))(xg, fx, fy, mask, wo)
g1 = jax.grad(loss_saved, argnums=(0, 1, 2, 3, 4))(xg, fx, fy, mask, wo)
for a, b in zip(g0, g1):
    d = float(jnp.max(jnp.abs(a - b)))
    print("grad max diff", d)
    assert d < 1e-6
print("OK")
