"""Kernel-vs-oracle tests (the reference's ops/test.py pattern, SURVEY.md §4):
Pallas flash attention in interpreter mode vs the pure-XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from samrs_tpu.kernels.flash_attention import (
    attention_relpos_xla,
    flash_attention_relpos,
)
from samrs_tpu.sam.image_encoder import add_decomposed_rel_pos, get_rel_pos


def _make_inputs(B, H, W, d, seed=0):
    rng = np.random.default_rng(seed)
    N = H * W
    q = jnp.asarray(rng.normal(size=(B, N, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, N, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, N, d)), jnp.float32)
    Rh = jnp.asarray(rng.normal(size=(H, H, d)) * 0.1, jnp.float32)
    Rw = jnp.asarray(rng.normal(size=(W, W, d)) * 0.1, jnp.float32)
    return q, k, v, Rh, Rw


def test_xla_oracle_matches_naive_composition():
    """attention_relpos_xla must equal einsum-attention + add_decomposed_rel_pos."""
    B, H, W, d = 2, 8, 16, 8
    q, k, v, Rh, Rw = _make_inputs(B, H, W, d)
    scale = d**-0.5
    N = H * W

    # naive: logits + decomposed bias, softmax, weighted sum
    rel_h = jnp.einsum("bhwc,hkc->bhwk", q.reshape(B, H, W, d), Rh)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", q.reshape(B, H, W, d), Rw)
    s = jnp.einsum("bqd,bkd->bqk", q * scale, k).reshape(B, N, H, W)
    s = s + rel_h.reshape(B, N, H)[..., :, None] + rel_w.reshape(B, N, W)[..., None, :]
    p = jax.nn.softmax(s.reshape(B, N, N), axis=-1)
    expected = jnp.einsum("bqk,bkd->bqd", p, v)

    got = attention_relpos_xla(
        q, k, v, rel_h.reshape(B, N, H), rel_w.reshape(B, N, W), scale
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


@pytest.mark.parametrize("B,H,W,d", [(1, 16, 16, 8), (2, 8, 32, 16)])
def test_pallas_flash_matches_oracle_interpret(B, H, W, d):
    q, k, v, Rh, Rw = _make_inputs(B, H, W, d, seed=1)
    scale = d**-0.5
    ref = flash_attention_relpos(q, k, v, Rh, Rw, (H, W), scale, force_xla=True)
    got = flash_attention_relpos(q, k, v, Rh, Rw, (H, W), scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_flash_gradients_flow():
    """custom_vjp backward (XLA recompute) must produce finite grads."""
    B, H, W, d = 1, 8, 16, 8
    q, k, v, Rh, Rw = _make_inputs(B, H, W, d, seed=2)
    scale = d**-0.5

    def loss(q, k, v):
        out = flash_attention_relpos(q, k, v, Rh, Rw, (H, W), scale, force_xla=True)
        return jnp.sum(out**2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()


def test_get_rel_pos_interpolation():
    """Table resize when stored length != 2*size-1 (image_encoder.py:292-322)."""
    rel = jnp.asarray(np.random.default_rng(3).normal(size=(15, 4)), jnp.float32)
    out_same = get_rel_pos(8, 8, rel)
    assert out_same.shape == (8, 8, 4)
    out_resized = get_rel_pos(4, 4, rel)  # needs length 7 -> interpolates
    assert out_resized.shape == (4, 4, 4)


# ---- qkv-direct (transpose-free) global kernel ------------------------------

def _make_qkv(B, H, W, C, nH, seed=0):
    rng = np.random.default_rng(seed)
    hd = C // nH
    qkv_raw = jnp.asarray(rng.normal(size=(B, H * W, 3 * C)), jnp.float32)
    Rh = jnp.asarray(rng.normal(size=(H, H, hd)) * 0.1, jnp.float32)
    Rw = jnp.asarray(rng.normal(size=(W, W, hd)) * 0.1, jnp.float32)
    return qkv_raw, Rh, Rw, hd


def test_qkv_oracle_matches_split_head_path():
    """attention_qkv_relpos_xla == transpose-split + attention_relpos_xla."""
    from samrs_tpu.kernels.flash_attention import attention_qkv_relpos_xla

    B, H, W, C, nH = 2, 8, 16, 32, 4
    qkv_raw, Rh, Rw, hd = _make_qkv(B, H, W, C, nH)
    scale = hd**-0.5
    got = attention_qkv_relpos_xla(qkv_raw, Rh, Rw, (H, W), scale, nH)

    qkv = qkv_raw.reshape(B, H * W, 3, nH, hd)
    qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, B * nH, H * W, hd)
    q, k, v = qkv[0], qkv[1], qkv[2]
    r_q = q.reshape(B * nH, H, W, hd)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, Rh).reshape(B * nH, H * W, H)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, Rw).reshape(B * nH, H * W, W)
    ref = attention_relpos_xla(q, k, v, rel_h, rel_w, scale)
    ref = ref.reshape(B, nH, H * W, hd).transpose(0, 2, 1, 3).reshape(B, H * W, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("B,H,W,C,nH", [(2, 16, 16, 32, 4), (1, 16, 32, 64, 8)])
def test_qkv_pallas_interpret_matches_oracle(B, H, W, C, nH):
    from samrs_tpu.kernels.flash_attention import (
        attention_qkv_relpos_xla,
        flash_attention_qkv_relpos,
    )

    qkv_raw, Rh, Rw, hd = _make_qkv(B, H, W, C, nH, seed=H + W)
    scale = hd**-0.5
    ref = attention_qkv_relpos_xla(qkv_raw, Rh, Rw, (H, W), scale, nH)
    got = flash_attention_qkv_relpos(qkv_raw, Rh, Rw, (H, W), scale, nH,
                                     interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("B,H,W,C,nH", [(2, 16, 16, 32, 4), (1, 16, 32, 64, 8)])
def test_qkv_aug_pallas_interpret_matches_oracle(B, H, W, C, nH):
    """Augmented-K variant (rel-pos folded into the qk matmul via padded
    128-aligned per-head segments) must match the oracle."""
    from samrs_tpu.kernels.flash_attention import (
        attention_qkv_relpos_xla,
        flash_attention_qkv_relpos,
    )

    qkv_raw, Rh, Rw, hd = _make_qkv(B, H, W, C, nH, seed=3 * H + W)
    scale = hd**-0.5
    ref = attention_qkv_relpos_xla(qkv_raw, Rh, Rw, (H, W), scale, nH)
    got = flash_attention_qkv_relpos(qkv_raw, Rh, Rw, (H, W), scale, nH,
                                     interpret=True, variant="aug")
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("B,H,W,C,nH", [(2, 16, 16, 32, 4), (1, 16, 32, 64, 8)])
def test_qkv_m_pallas_interpret_matches_oracle(B, H, W, C, nH):
    """Merged-rel variant (one fused rel matmul + hoisted v||ones segments)
    must match the oracle."""
    from samrs_tpu.kernels.flash_attention import (
        attention_qkv_relpos_xla,
        flash_attention_qkv_relpos,
    )

    qkv_raw, Rh, Rw, hd = _make_qkv(B, H, W, C, nH, seed=5 * H + W)
    scale = hd**-0.5
    ref = attention_qkv_relpos_xla(qkv_raw, Rh, Rw, (H, W), scale, nH)
    got = flash_attention_qkv_relpos(qkv_raw, Rh, Rw, (H, W), scale, nH,
                                     interpret=True, variant="m")
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_qkv_exp2_pallas_interpret_matches_oracle():
    """Base-2 softmax variant (log2e folded into scale + rel tables) is the
    same mathematical function as the exp path — only rounding differs."""
    from samrs_tpu.kernels.flash_attention import (
        attention_qkv_relpos_xla,
        flash_attention_qkv_relpos,
    )

    B, H, W, C, nH = 2, 16, 16, 32, 4
    qkv_raw, Rh, Rw, hd = _make_qkv(B, H, W, C, nH, seed=11)
    scale = hd**-0.5
    ref = attention_qkv_relpos_xla(qkv_raw, Rh, Rw, (H, W), scale, nH)
    got = flash_attention_qkv_relpos(qkv_raw, Rh, Rw, (H, W), scale, nH,
                                     interpret=True, variant="exp2")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_qkv_gradients_flow():
    from samrs_tpu.kernels.flash_attention import (
        attention_qkv_relpos_xla,
        flash_attention_qkv_relpos,
    )

    B, H, W, C, nH = 1, 16, 16, 32, 4
    qkv_raw, Rh, Rw, hd = _make_qkv(B, H, W, C, nH, seed=7)
    scale = hd**-0.5

    g1 = jax.grad(lambda x: jnp.sum(flash_attention_qkv_relpos(
        x, Rh, Rw, (H, W), scale, nH, interpret=True) ** 2))(qkv_raw)
    g2 = jax.grad(lambda x: jnp.sum(attention_qkv_relpos_xla(
        x, Rh, Rw, (H, W), scale, nH) ** 2))(qkv_raw)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4, rtol=1e-4)


def test_plain_flash_interpret_matches_oracle():
    from samrs_tpu.kernels.flash_attention import (
        attention_plain_xla,
        flash_attention_plain,
        plain_q_tile,
    )

    assert plain_q_tile(1024) == 128
    assert plain_q_tile(3136) == 112
    assert plain_q_tile(196) == 0  # 224px maps stay on XLA

    rng = np.random.default_rng(3)
    B, N, d = 3, 256, 32
    q, k, v = (jnp.asarray(rng.standard_normal((B, N, d)), jnp.float32)
               for _ in range(3))
    ref = attention_plain_xla(q, k, v, d**-0.5)
    got = flash_attention_plain(q, k, v, d**-0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_plain_flash_gradients_flow():
    from samrs_tpu.kernels.flash_attention import (
        attention_plain_xla,
        flash_attention_plain,
    )

    rng = np.random.default_rng(4)
    B, N, d = 1, 128, 16
    q, k, v = (jnp.asarray(rng.standard_normal((B, N, d)), jnp.float32)
               for _ in range(3))
    g1 = jax.grad(lambda a, b, c: jnp.sum(
        flash_attention_plain(a, b, c, d**-0.5, interpret=True) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda a, b, c: jnp.sum(
        attention_plain_xla(a, b, c, d**-0.5) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_vit_backbone_flash_impl_matches_xla():
    """PlainAttention(impl='flash') in interpret mode == the xla impl, so the
    bench_train flash_attn flag changes only the schedule, not the math."""
    from samrs_tpu.seg.backbones.vit import PlainAttention

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 32)), jnp.float32)
    mod_x = PlainAttention(32, 4, impl="xla")
    v = mod_x.init(jax.random.PRNGKey(0), x)
    ref = mod_x.apply(v, x)
    # interpret-mode Pallas path: patch the default-backend gate via interpret
    from samrs_tpu.kernels import flash_attention as fa

    orig = fa.flash_attention_plain

    def forced(q, k, vv, scale, force_xla=False, interpret=False):
        return orig(q, k, vv, scale, force_xla=force_xla, interpret=True)

    fa.flash_attention_plain = forced
    try:
        got = PlainAttention(32, 4, impl="flash").apply(v, x)
    finally:
        fa.flash_attention_plain = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_rvsa_full_attn_flash_impl_matches_xla():
    """FullAttentionRelPos(use_rel_pos=False) under the flash default ==
    the einsum path (the RVSA full-attn layers in training)."""
    from samrs_tpu.nn import layers as _layers
    from samrs_tpu.seg.backbones.vit_common import FullAttentionRelPos

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 32)), jnp.float32)
    mod = FullAttentionRelPos(32, 4, use_rel_pos=False)
    v = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(v, x)

    from samrs_tpu.kernels import flash_attention as fa

    orig = fa.flash_attention_plain

    def forced(q, k, vv, scale, force_xla=False, interpret=False):
        return orig(q, k, vv, scale, force_xla=force_xla, interpret=True)

    fa.flash_attention_plain = forced
    _layers.set_default_attn_impl("flash")
    try:
        got = mod.apply(v, x)
    finally:
        fa.flash_attention_plain = orig
        _layers.set_default_attn_impl("xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)
