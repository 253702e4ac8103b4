"""Fused window-attention kernel vs XLA oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from samrs_tpu.kernels.window_attention import (
    window_attention_relpos,
    window_attention_xla,
)


@pytest.mark.parametrize("B,kh,kw,d", [(4, 7, 7, 16), (6, 14, 14, 8), (3, 5, 9, 8)])
def test_window_kernel_matches_oracle(B, kh, kw, d):
    rng = np.random.default_rng(0)
    N = kh * kw
    q = jnp.asarray(rng.normal(size=(B, N, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, N, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, N, d)), jnp.float32)
    Rh = jnp.asarray(rng.normal(size=(kh, kh, d)) * 0.1, jnp.float32)
    Rw = jnp.asarray(rng.normal(size=(kw, kw, d)) * 0.1, jnp.float32)
    scale = d**-0.5
    ref = window_attention_relpos(q, k, v, Rh, Rw, (kh, kw), scale, force_xla=True)
    got = window_attention_relpos(q, k, v, Rh, Rw, (kh, kw), scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_window_kernel_grads():
    rng = np.random.default_rng(1)
    B, kh, kw, d = 2, 4, 4, 8
    N = kh * kw
    q = jnp.asarray(rng.normal(size=(B, N, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, N, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, N, d)), jnp.float32)
    Rh = jnp.asarray(rng.normal(size=(kh, kh, d)) * 0.1, jnp.float32)
    Rw = jnp.asarray(rng.normal(size=(kw, kw, d)) * 0.1, jnp.float32)

    def loss(q, k, v):
        return jnp.sum(
            window_attention_relpos(q, k, v, Rh, Rw, (kh, kw), d**-0.5, force_xla=True) ** 2
        )

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert all(np.isfinite(np.asarray(x)).all() for x in g)
