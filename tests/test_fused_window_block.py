"""Partition-free windowed attention kernel vs oracles (interpret mode)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from samrs_tpu.kernels.fused_window_block import (
    window_attention_partition_free,
    window_block_xla,
)
from samrs_tpu.nn.layers import window_partition, window_unpartition
from samrs_tpu.kernels.fused_attention import attention_qkv_xla


def _mk(B=2, H=20, W=20, C=64, nH=4, ws=7, seed=0):
    rng = np.random.default_rng(seed)
    hd = C // nH
    qkv = jnp.asarray(rng.normal(size=(B, H, W, 3 * C)).astype(np.float32))
    Rh = jnp.asarray(rng.normal(size=(ws, ws, hd)).astype(np.float32) * 0.1)
    Rw = jnp.asarray(rng.normal(size=(ws, ws, hd)).astype(np.float32) * 0.1)
    return qkv, Rh, Rw, hd


def test_oracle_matches_partitioned_composition():
    """window_block_xla == window_partition + per-window attention +
    unpartition (the existing fused_attention path's semantics, including
    zero-pad tokens participating in attention)."""
    B, H, W, C, nH, ws = 2, 20, 20, 64, 4, 7
    qkv, Rh, Rw, hd = _mk(B, H, W, C, nH, ws)
    scale = hd**-0.5

    ours = window_block_xla(qkv, Rh, Rw, ws, scale, nH)

    wins, pad_hw = window_partition(qkv, ws)  # (B*nW, ws, ws, 3C)
    nW = wins.shape[0]
    q4 = wins[..., :C].reshape(nW, ws, ws, nH, hd)
    rel_h = jnp.einsum("bxynd,xkd->bxynk", q4, Rh).reshape(nW, ws * ws, nH * ws)
    rel_w = jnp.einsum("bxynd,ykd->bxynk", q4, Rw).reshape(nW, ws * ws, nH * ws)
    att = attention_qkv_xla(
        wins.reshape(nW, ws * ws, 3 * C), rel_h, rel_w, scale, nH
    )
    ref = window_unpartition(att.reshape(nW, ws, ws, C), ws, pad_hw, (H, W))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("hw", [(20, 20), (14, 14), (28, 21)])
def test_pallas_interpret_matches_oracle(hw):
    H, W = hw
    B, C, nH, ws = 2, 64, 4, 7
    qkv, Rh, Rw, hd = _mk(B, H, W, C, nH, ws, seed=H)
    scale = hd**-0.5
    ref = window_block_xla(qkv, Rh, Rw, ws, scale, nH)
    got = window_attention_partition_free(
        qkv, Rh, Rw, ws, scale, nH, interpret=True
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_bias_pad_fill_matches_pad_before_qkv():
    """Nonzero qkv bias: the default encoder path pads x BEFORE the qkv
    projection, so pad tokens carry k = v = bias.  The partition-free path
    pads the qkv OUTPUT and must bias-fill pad positions to agree (zero-fill
    only matches on zero-bias random init)."""
    B, H, W, C, nH, ws = 2, 20, 20, 64, 4, 7
    rng = np.random.default_rng(11)
    hd = C // nH
    scale = hd**-0.5
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    Wq = jnp.asarray(rng.normal(size=(C, 3 * C)).astype(np.float32) * 0.1)
    bq = jnp.asarray(rng.normal(size=(3 * C,)).astype(np.float32))
    Rh = jnp.asarray(rng.normal(size=(ws, ws, hd)).astype(np.float32) * 0.1)
    Rw = jnp.asarray(rng.normal(size=(ws, ws, hd)).astype(np.float32) * 0.1)

    # reference composition: partition x (zero pad), then qkv per window
    wins, pad_hw = window_partition(x, ws)
    nW = wins.shape[0]
    wqkv = wins.reshape(nW, ws * ws, C) @ Wq + bq
    q4 = wqkv[..., :C].reshape(nW, ws * ws, nH, hd).reshape(nW, ws, ws, nH, hd)
    rel_h = jnp.einsum("bxynd,xkd->bxynk", q4, Rh).reshape(nW, ws * ws, nH * ws)
    rel_w = jnp.einsum("bxynd,ykd->bxynk", q4, Rw).reshape(nW, ws * ws, nH * ws)
    att = attention_qkv_xla(wqkv, rel_h, rel_w, scale, nH)
    ref = window_unpartition(att.reshape(nW, ws, ws, C), ws, pad_hw, (H, W))

    # partition-free: qkv on the unpadded map, bias-filled pad
    qkv_raw = (x.reshape(-1, C) @ Wq + bq).reshape(B, H, W, 3 * C)
    for use_interp in (False, True):  # oracle and interpret-mode kernel
        got = window_attention_partition_free(
            qkv_raw, Rh, Rw, ws, scale, nH, interpret=use_interp, pad_fill=bq
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=3e-5, rtol=1e-5
        )
    # and WITHOUT the fill it must NOT agree (guards the semantics)
    wrong = window_attention_partition_free(qkv_raw, Rh, Rw, ws, scale, nH)
    assert np.abs(np.asarray(wrong) - np.asarray(ref)).max() > 1e-3


def test_backward_is_xla_composition():
    B, H, W, C, nH, ws = 1, 14, 14, 32, 2, 7
    qkv, Rh, Rw, hd = _mk(B, H, W, C, nH, ws, seed=3)
    scale = hd**-0.5

    def f_fused(q):
        return jnp.sum(
            window_attention_partition_free(q, Rh, Rw, ws, scale, nH, interpret=True) ** 2
        )

    def f_oracle(q):
        return jnp.sum(window_block_xla(q, Rh, Rw, ws, scale, nH) ** 2)

    g1 = jax.grad(f_fused)(qkv)
    g2 = jax.grad(f_oracle)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4, rtol=1e-4)
