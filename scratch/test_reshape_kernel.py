"""Mosaic compile probe: (1,14,14,C) block -> in-kernel reshape to (196,C)."""
import functools, sys
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _kernel(x_ref, o_ref):
    x = x_ref[0]            # (14, 14, C)
    x2 = x.reshape(14 * 14, x.shape[-1])   # sublane-collapse reshape
    y = jax.lax.dot_general(x2, x2, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (196,196)
    o_ref[0] = y.astype(o_ref.dtype)

def run():
    B, C = 2, 256
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, 14, 14, C)), jnp.bfloat16)
    out = pl.pallas_call(
        _kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 14, 14, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 196, 196), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 196, 196), jnp.float32),
    )(x)
    ref = jnp.einsum("bxyc,buvc->bxyuv", x.astype(jnp.float32), x.astype(jnp.float32)).reshape(B, 196, 196)
    print("max diff:", float(jnp.max(jnp.abs(out - ref))))
    print("COMPILE OK")

if __name__ == "__main__":
    run()
