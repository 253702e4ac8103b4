"""Whole-window-layer kernel (qkv+attn+proj in one Pallas call) vs oracles."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from samrs_tpu.kernels.fused_window_layer import (
    window_layer_attention,
    window_layer_xla,
    _rel_projections_folded,
)
from samrs_tpu.kernels.fused_attention import attention_qkv_xla
from samrs_tpu.nn.layers import window_partition, window_unpartition


def _mk(B=2, H=20, W=20, C=64, nH=4, ws=7, seed=0):
    rng = np.random.default_rng(seed)
    hd = C // nH
    xn = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    Wqkv = jnp.asarray(rng.normal(size=(C, 3 * C)).astype(np.float32) * 0.1)
    bqkv = jnp.asarray(rng.normal(size=(3 * C,)).astype(np.float32))
    Wproj = jnp.asarray(rng.normal(size=(C, C)).astype(np.float32) * 0.1)
    bproj = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    Rh = jnp.asarray(rng.normal(size=(ws, ws, hd)).astype(np.float32) * 0.1)
    Rw = jnp.asarray(rng.normal(size=(ws, ws, hd)).astype(np.float32) * 0.1)
    return xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, hd


def test_oracle_matches_default_composition():
    """window_layer_xla == the default encoder path: partition x (zero pad)
    -> qkv Dense (pad tokens get k=v=BIAS) -> window attention -> unpartition
    -> proj.  Nonzero qkv bias on purpose — guards pad semantics."""
    B, H, W, C, nH, ws = 2, 20, 20, 64, 4, 7
    xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, hd = _mk(B, H, W, C, nH, ws)
    scale = hd**-0.5

    ours = window_layer_xla(xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, ws, scale,
                            nH, dtype=jnp.float32)

    wins, pad_hw = window_partition(xn, ws)
    nW = wins.shape[0]
    wqkv = wins.reshape(nW, ws * ws, C) @ Wqkv + bqkv
    q4 = wqkv[..., :C].reshape(nW, ws, ws, nH, hd)
    rel_h = jnp.einsum("bxynd,xkd->bxynk", q4, Rh).reshape(nW, ws * ws, nH * ws)
    rel_w = jnp.einsum("bxynd,ykd->bxynk", q4, Rw).reshape(nW, ws * ws, nH * ws)
    att = attention_qkv_xla(wqkv, rel_h, rel_w, scale, nH)
    att = window_unpartition(att.reshape(nW, ws, ws, C), ws, pad_hw, (H, W))
    ref = att.reshape(-1, C) @ Wproj + bproj
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref.reshape(B, H, W, C)),
        atol=5e-5, rtol=1e-5,
    )


def test_folded_rel_projections():
    """rel_h[b,x,y,n*ws+u] == q[b,x,y,n] . Rh[x % ws, u] with q = xp@Wq+bq."""
    B, H, W, C, nH, ws = 1, 14, 14, 32, 2, 7
    xn, Wqkv, bqkv, _, _, Rh, Rw, hd = _mk(B, H, W, C, nH, ws, seed=5)
    rel_h, rel_w = _rel_projections_folded(xn, Wqkv, bqkv, Rh, Rw, ws, nH)
    q = (xn.reshape(-1, C) @ Wqkv + bqkv)[:, :C].reshape(B, H, W, nH, hd)
    rh_x = Rh[np.arange(H) % ws]  # (H, ws, hd)
    rw_y = Rw[np.arange(W) % ws]
    ref_h = jnp.einsum("bxynd,xkd->bxynk", q, rh_x).reshape(B, H, W, nH * ws)
    ref_w = jnp.einsum("bxynd,ykd->bxynk", q, rw_y).reshape(B, H, W, nH * ws)
    np.testing.assert_allclose(np.asarray(rel_h), np.asarray(ref_h),
                               atol=3e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rel_w), np.asarray(ref_w),
                               atol=3e-5, rtol=1e-5)


@pytest.mark.parametrize("hw", [(20, 20), (14, 14), (28, 21)])
def test_pallas_interpret_matches_oracle(hw):
    H, W = hw
    B, C, nH, ws = 2, 64, 4, 7
    xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, hd = _mk(B, H, W, C, nH, ws, seed=H)
    scale = hd**-0.5
    ref = window_layer_xla(xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, ws, scale,
                           nH, dtype=jnp.float32)
    got = window_layer_attention(xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, ws,
                                 scale, nH, dtype=jnp.float32, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-5)


def test_no_bias_variant():
    B, H, W, C, nH, ws = 1, 14, 14, 32, 2, 7
    xn, Wqkv, _, Wproj, bproj, Rh, Rw, hd = _mk(B, H, W, C, nH, ws, seed=9)
    scale = hd**-0.5
    ref = window_layer_xla(xn, Wqkv, None, Wproj, bproj, Rh, Rw, ws, scale,
                           nH, dtype=jnp.float32)
    got = window_layer_attention(xn, Wqkv, None, Wproj, bproj, Rh, Rw, ws,
                                 scale, nH, dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-5)


def test_backward_is_xla_composition():
    B, H, W, C, nH, ws = 1, 14, 14, 32, 2, 7
    xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, hd = _mk(B, H, W, C, nH, ws, seed=3)
    scale = hd**-0.5

    def f_fused(x, wq, wp):
        return jnp.sum(window_layer_attention(
            x, wq, bqkv, wp, bproj, Rh, Rw, ws, scale, nH,
            dtype=jnp.float32, interpret=True) ** 2)

    def f_oracle(x, wq, wp):
        return jnp.sum(window_layer_xla(
            x, wq, bqkv, wp, bproj, Rh, Rw, ws, scale, nH,
            dtype=jnp.float32) ** 2)

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(xn, Wqkv, Wproj)
    g2 = jax.grad(f_oracle, argnums=(0, 1, 2))(xn, Wqkv, Wproj)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_encoder_block_impl_matches_fused_path():
    """ImageEncoderViT forward with window_attn_impl='block' equals the
    partitioned 'fused' path (same variables; the _DenseParams tree must be
    interchangeable with nn.Dense's)."""
    from samrs_tpu.sam.image_encoder import ImageEncoderViT

    kw = dict(
        img_size=64, patch_size=8, embed_dim=64, depth=2, num_heads=2,
        out_chans=32, window_size=3, global_attn_indexes=(1,),  # 8 % 3 != 0: pads
        dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    enc_a = ImageEncoderViT(**kw, window_attn_impl="xla")
    vars_a = enc_a.init(jax.random.PRNGKey(0), img)
    # give the qkv/proj biases nonzero values so pad semantics are exercised
    import flax

    flat = flax.traverse_util.flatten_dict(vars_a["params"])
    for k in flat:
        if k[-1] == "bias":
            flat[k] = jnp.asarray(
                rng.normal(size=flat[k].shape).astype(np.float32) * 0.3)
    vars_a = {"params": flax.traverse_util.unflatten_dict(flat)}
    enc_b = ImageEncoderViT(**kw, window_attn_impl="block")
    out_a = enc_a.apply(vars_a, img)
    out_b = enc_b.apply(vars_a, img)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=2e-4, rtol=1e-4)
    # param trees are identical (checkpoint compatibility)
    vars_b = enc_b.init(jax.random.PRNGKey(0), img)
    assert jax.tree_util.tree_structure(vars_a) == jax.tree_util.tree_structure(vars_b)


def test_patch_embed_matmul_matches_conv():
    """patch_embed_impl='matmul' must reproduce the nn.Conv patch embed
    exactly (same param tree, same numerics in fp32)."""
    from samrs_tpu.sam.image_encoder import ImageEncoderViT

    kw = dict(
        img_size=64, patch_size=8, embed_dim=64, depth=1, num_heads=2,
        out_chans=32, window_size=0, global_attn_indexes=(0,),
        dtype=jnp.float32, window_attn_impl="xla",
    )
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    enc_c = ImageEncoderViT(**kw, patch_embed_impl="conv")
    enc_m = ImageEncoderViT(**kw, patch_embed_impl="matmul")
    vars_c = enc_c.init(jax.random.PRNGKey(0), img)
    # nonzero patch-embed bias
    import flax

    flat = flax.traverse_util.flatten_dict(vars_c["params"])
    flat[("patch_embed", "bias")] = jnp.asarray(
        rng.normal(size=flat[("patch_embed", "bias")].shape).astype(np.float32))
    vars_c = {"params": flax.traverse_util.unflatten_dict(flat)}
    out_c = enc_c.apply(vars_c, img)
    out_m = enc_m.apply(vars_c, img)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_m),
                               atol=1e-5, rtol=1e-5)
    vars_m = enc_m.init(jax.random.PRNGKey(0), img)
    assert jax.tree_util.tree_structure(vars_c) == jax.tree_util.tree_structure(vars_m)
    assert vars_m["params"]["patch_embed"]["kernel"].shape == (8, 8, 3, 64)


@pytest.mark.parametrize("hw", [(20, 20), (14, 14), (28, 21)])
def test_residual_variant_matches_oracle_interpret(hw):
    """block2 (partial blocks of the unpadded maps + in-kernel residual) vs
    sc + oracle.  (20,20)/(28,21) exercise partial edge blocks with nonzero
    qkv bias — the masked-to-zero pad rows must yield k=v=bias exactly."""
    from samrs_tpu.kernels.fused_window_layer import (
        window_layer_attention_residual,
    )

    H, W = hw
    B, C, nH, ws = 2, 64, 4, 7
    xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, hd = _mk(B, H, W, C, nH, ws, seed=H + 1)
    rng = np.random.default_rng(99)
    sc = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    scale = hd**-0.5
    ref = sc + window_layer_xla(xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, ws,
                                scale, nH, dtype=jnp.float32)
    got = window_layer_attention_residual(
        sc, xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, ws, scale, nH,
        dtype=jnp.float32, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-5)


def test_encoder_block2_impl_matches_block():
    """ImageEncoderViT with window_attn_impl='block2' (in-kernel residual)
    equals the 'block' path on the same variables, and the param trees are
    identical (checkpoint compatibility)."""
    from samrs_tpu.sam.image_encoder import ImageEncoderViT
    import flax

    kw = dict(
        img_size=64, patch_size=8, embed_dim=64, depth=2, num_heads=2,
        out_chans=32, window_size=3, global_attn_indexes=(1,),
        dtype=jnp.float32,
    )
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    enc_a = ImageEncoderViT(**kw, window_attn_impl="block")
    vars_a = enc_a.init(jax.random.PRNGKey(0), img)
    flat = flax.traverse_util.flatten_dict(vars_a["params"])
    for k in flat:
        if k[-1] == "bias":
            flat[k] = jnp.asarray(
                rng.normal(size=flat[k].shape).astype(np.float32) * 0.3)
    vars_a = {"params": flax.traverse_util.unflatten_dict(flat)}
    enc_b = ImageEncoderViT(**kw, window_attn_impl="block2")
    out_a = enc_a.apply(vars_a, img)
    out_b = enc_b.apply(vars_a, img)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=2e-4, rtol=1e-4)
    vars_b = enc_b.init(jax.random.PRNGKey(0), img)
    assert jax.tree_util.tree_structure(vars_a) == jax.tree_util.tree_structure(vars_b)


@pytest.mark.parametrize("hw", [(20, 20), (14, 14)])
def test_qkv_out_variant_matches_oracle_interpret(hw):
    """blockq (qkv as one outside matmul, bias added in-kernel) vs oracle.
    (20,20) pads 20->21, exercising the zero-pad + in-kernel-bias pad-token
    semantics (k = v = bias) with nonzero qkv bias."""
    H, W = hw
    B, C, nH, ws = 2, 64, 4, 7
    xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, hd = _mk(B, H, W, C, nH, ws, seed=H + 2)
    scale = hd**-0.5
    ref = window_layer_xla(xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, ws, scale,
                           nH, dtype=jnp.float32)
    got = window_layer_attention(xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, ws,
                                 scale, nH, dtype=jnp.float32, interpret=True,
                                 variant="qkv_out")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-5)


@pytest.mark.parametrize("variant", ["slab", "ijb", "slab_ijb"])
def test_slab_and_grid_variants_match_oracle_interpret(variant):
    """slab rel producer (per-slot matmuls in the 6-D layout) and the
    batch-innermost grid vs the XLA oracle, with padding (20->21)."""
    B, H, W, C, nH, ws = 2, 20, 20, 64, 4, 7
    xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, hd = _mk(B, H, W, C, nH, ws, seed=11)
    scale = hd**-0.5
    ref = window_layer_xla(xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, ws, scale,
                           nH, dtype=jnp.float32)
    got = window_layer_attention(xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, ws,
                                 scale, nH, dtype=jnp.float32, interpret=True,
                                 variant=variant)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-5)


def test_row_variant_matches_oracle_interpret():
    """Row-of-windows grid (one program per window row) vs the XLA oracle."""
    B, H, W, C, nH, ws = 2, 13, 13, 32, 4, 7  # Hp=Wp=14, nww=2, with padding
    rng = np.random.default_rng(11)
    xn = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    Wqkv = jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rng.normal(size=(3 * C,)) * 0.05, jnp.float32)
    Wproj = jnp.asarray(rng.normal(size=(C, C)) * 0.05, jnp.float32)
    bproj = jnp.asarray(rng.normal(size=(C,)) * 0.05, jnp.float32)
    hd = C // nH
    Rh = jnp.asarray(rng.normal(size=(ws, ws, hd)) * 0.1, jnp.float32)
    Rw = jnp.asarray(rng.normal(size=(ws, ws, hd)) * 0.1, jnp.float32)
    scale = hd**-0.5
    ref = window_layer_attention(xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, ws,
                                 scale, nH, dtype=jnp.float32, force_xla=True)
    got = window_layer_attention(xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, ws,
                                 scale, nH, dtype=jnp.float32, interpret=True,
                                 rows=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
