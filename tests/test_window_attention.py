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


def test_fused_qkv_attention_matches_composition():
    """Transpose-free fused kernel (interpret) vs the head-split composition."""
    from samrs_tpu.kernels.fused_attention import attention_qkv_fused, attention_qkv_xla

    rng = np.random.default_rng(2)
    B, kh, kw, nH, hd = 3, 7, 7, 2, 16
    N = kh * kw
    qkv = jnp.asarray(rng.normal(size=(B, N, 3, nH, hd)), jnp.float32)
    Rh = jnp.asarray(rng.normal(size=(kh, kh, hd)) * 0.1, jnp.float32)
    Rw = jnp.asarray(rng.normal(size=(kw, kw, hd)) * 0.1, jnp.float32)
    scale = hd**-0.5

    ref = attention_qkv_fused(qkv, Rh, Rw, (kh, kw), scale, force_xla=True)
    got = attention_qkv_fused(qkv, Rh, Rw, (kh, kw), scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)

    # and against the original per-head path
    from samrs_tpu.kernels.window_attention import window_attention_relpos

    q = qkv[:, :, 0].transpose(0, 2, 1, 3).reshape(B * nH, N, hd)
    k = qkv[:, :, 1].transpose(0, 2, 1, 3).reshape(B * nH, N, hd)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3).reshape(B * nH, N, hd)
    old = window_attention_relpos(q, k, v, Rh, Rw, (kh, kw), scale, force_xla=True)
    old = old.reshape(B, nH, N, hd).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(old), atol=1e-4, rtol=1e-4)


def test_fused_qkv_attention_global_tiled():
    from samrs_tpu.kernels.fused_attention import attention_qkv_fused

    rng = np.random.default_rng(3)
    B, kh, kw, nH, hd = 1, 32, 64, 2, 8  # N=2048 > 1024 -> tiled path
    N = kh * kw
    qkv = jnp.asarray(rng.normal(size=(B, N, 3, nH, hd)), jnp.float32)
    Rh = jnp.asarray(rng.normal(size=(kh, kh, hd)) * 0.1, jnp.float32)
    Rw = jnp.asarray(rng.normal(size=(kw, kw, hd)) * 0.1, jnp.float32)
    ref = attention_qkv_fused(qkv, Rh, Rw, (kh, kw), hd**-0.5, force_xla=True)
    got = attention_qkv_fused(qkv, Rh, Rw, (kh, kw), hd**-0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)
