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


@pytest.mark.parametrize("B,kh,kw,nH,hd", [(3, 7, 7, 2, 16), (2, 14, 14, 4, 8),
                                           (2, 5, 9, 3, 16)])
def test_fused_qkv_attention_matches_composition(B, kh, kw, nH, hd):
    """Transpose-free fused kernel (interpret) vs the head-split composition.

    The kernel consumes the raw (B, N, 3C) qkv Dense output ([q|k|v] thirds,
    heads-major within each) and resolves heads by static lane slicing."""
    from samrs_tpu.kernels.fused_attention import attention_qkv_fused

    rng = np.random.default_rng(2)
    N = kh * kw
    C = nH * hd
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * C)), jnp.float32)
    Rh = jnp.asarray(rng.normal(size=(kh, kh, hd)) * 0.1, jnp.float32)
    Rw = jnp.asarray(rng.normal(size=(kw, kw, hd)) * 0.1, jnp.float32)
    scale = hd**-0.5

    ref = attention_qkv_fused(qkv, Rh, Rw, (kh, kw), scale, nH, force_xla=True)
    got = attention_qkv_fused(qkv, Rh, Rw, (kh, kw), scale, nH, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)

    # and against the original per-head path
    from samrs_tpu.kernels.window_attention import window_attention_relpos

    qkv5 = qkv.reshape(B, N, 3, nH, hd)
    q = qkv5[:, :, 0].transpose(0, 2, 1, 3).reshape(B * nH, N, hd)
    k = qkv5[:, :, 1].transpose(0, 2, 1, 3).reshape(B * nH, N, hd)
    v = qkv5[:, :, 2].transpose(0, 2, 1, 3).reshape(B * nH, N, hd)
    old = window_attention_relpos(q, k, v, Rh, Rw, (kh, kw), scale, force_xla=True)
    old = old.reshape(B, nH, N, hd).transpose(0, 2, 1, 3).reshape(B, N, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(old), atol=1e-4, rtol=1e-4)


def test_fused_qkv_attention_vith_shapes():
    """ViT-H windowed shapes (nH=16, hd=80, N=196) through the kernel."""
    from samrs_tpu.kernels.fused_attention import attention_qkv_fused

    rng = np.random.default_rng(3)
    B, kh, kw, nH, hd = 2, 14, 14, 16, 80
    N = kh * kw
    C = nH * hd
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * C)), jnp.bfloat16)
    Rh = jnp.asarray(rng.normal(size=(kh, kh, hd)) * 0.1, jnp.float32)
    Rw = jnp.asarray(rng.normal(size=(kw, kw, hd)) * 0.1, jnp.float32)
    ref = attention_qkv_fused(qkv, Rh, Rw, (kh, kw), hd**-0.5, nH, force_xla=True)
    got = attention_qkv_fused(qkv, Rh, Rw, (kh, kw), hd**-0.5, nH, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=3e-2, rtol=3e-2
    )


def test_fused_qkv_attention_grads_finite():
    from samrs_tpu.kernels.fused_attention import attention_qkv_fused

    rng = np.random.default_rng(4)
    B, kh, kw, nH, hd = 2, 4, 4, 2, 8
    N, C = kh * kw, 2 * 8
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * C)), jnp.float32)
    Rh = jnp.asarray(rng.normal(size=(kh, kh, hd)) * 0.1, jnp.float32)
    Rw = jnp.asarray(rng.normal(size=(kw, kw, hd)) * 0.1, jnp.float32)

    def loss(qkv):
        return jnp.sum(
            attention_qkv_fused(qkv, Rh, Rw, (kh, kw), hd**-0.5, nH, interpret=True) ** 2
        )

    g = jax.grad(loss)(qkv)
    assert np.isfinite(np.asarray(g)).all()
