"""Fused TwoWayTransformer image-side sweeps vs oracles / module path.

Kernel-vs-oracle in interpreter mode (the reference ops/test.py pattern),
plus a full-transformer wiring test: impl='fused_test' (oracle kernels,
fp32) must reproduce the flax module path bit-close and share its exact
param tree.  Reference: GD/segment_anything/modeling/transformer.py:16-240.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from samrs_tpu.kernels.fused_twoway import (
    NT,
    i2t_update,
    i2t_update_xla,
    t2i_kv_proj,
    t2i_kv_proj_xla,
)

B, N, C, Ci, NH = 2, 256, 64, 32, 4


def _mk(seed=0):
    rng = np.random.default_rng(seed)
    f32 = lambda *s: jnp.asarray(rng.normal(size=s) * 0.5, jnp.float32)
    keys = f32(B, N, C)
    key_pe = f32(N, C)
    Wk, bk = f32(C, Ci), f32(Ci)
    Wv, bv = f32(C, Ci), f32(Ci)
    return keys, key_pe, (Wk, bk, Wv, bv), rng


def test_kv_proj_interpret_matches_oracle():
    keys, key_pe, (Wk, bk, Wv, bv), _ = _mk()
    want = t2i_kv_proj_xla(keys, key_pe, Wk, bk, Wv, bv, jnp.float32)
    got = t2i_kv_proj(keys, key_pe, Wk, bk, Wv, bv, dtype=jnp.float32,
                      interpret=True)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("nt", [3, 9])
def test_i2t_update_interpret_matches_oracle(nt):
    keys, key_pe, _, rng = _mk(1)
    f32 = lambda *s: jnp.asarray(rng.normal(size=s) * 0.5, jnp.float32)
    tok_k = jnp.pad(f32(B, nt, Ci), ((0, 0), (0, NT - nt), (0, 0)))
    tok_v = jnp.pad(f32(B, nt, Ci), ((0, 0), (0, NT - nt), (0, 0)))
    mask_bias = jnp.asarray(np.where(np.arange(NT) < nt, 0.0, -1e9), jnp.float32)
    args = (keys, key_pe, tok_k, tok_v, mask_bias,
            f32(C, Ci), f32(Ci), f32(Ci, C), f32(C), f32(C) * 0 + 1, f32(C),
            f32(C, Ci), f32(Ci), f32(C, Ci), f32(Ci))
    want = i2t_update_xla(*args, NH, jnp.float32)
    got = i2t_update(*args, NH, dtype=jnp.float32, interpret=True)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-5, rtol=2e-5)


def test_i2t_gradients_flow():
    keys, key_pe, _, rng = _mk(2)
    f32 = lambda *s: jnp.asarray(rng.normal(size=s) * 0.5, jnp.float32)
    nt = 5
    tok_k = jnp.pad(f32(B, nt, Ci), ((0, 0), (0, NT - nt), (0, 0)))
    tok_v = jnp.pad(f32(B, nt, Ci), ((0, 0), (0, NT - nt), (0, 0)))
    mask_bias = jnp.asarray(np.where(np.arange(NT) < nt, 0.0, -1e9), jnp.float32)
    weights = (f32(C, Ci), f32(Ci), f32(Ci, C), f32(C), f32(C) * 0 + 1,
               f32(C), f32(C, Ci), f32(Ci), f32(C, Ci), f32(Ci))

    def loss(k):
        keys2, kn, vn = i2t_update(k, key_pe, tok_k, tok_v, mask_bias,
                                   *weights, NH, dtype=jnp.float32,
                                   force_xla=True)
        return (keys2 ** 2).sum() + (kn ** 2).sum() + (vn ** 2).sum()

    g = jax.grad(loss)(keys)
    assert np.isfinite(np.asarray(g)).all()


def test_fused_transformer_matches_module_path():
    """impl='fused_test' (oracle kernels, fp32) == the flax module path, and
    both resolve the SAME param tree (checkpoint compatibility)."""
    from samrs_tpu.sam.transformer import TwoWayTransformer

    rng = np.random.default_rng(3)
    h = w = 8
    emb = 64
    nt = 7
    img = jnp.asarray(rng.normal(size=(B, h, w, emb)), jnp.float32)
    pe = jnp.asarray(rng.normal(size=(h, w, emb)), jnp.float32)
    pts = jnp.asarray(rng.normal(size=(B, nt, emb)), jnp.float32)

    ref_m = TwoWayTransformer(depth=2, embedding_dim=emb, num_heads=4,
                              mlp_dim=128, impl="xla")
    variables = ref_m.init(jax.random.PRNGKey(0), img, pe, pts)
    q_ref, k_ref = ref_m.apply(variables, img, pe, pts)

    fused_m = TwoWayTransformer(depth=2, embedding_dim=emb, num_heads=4,
                                mlp_dim=128, impl="fused_test")
    q_f, k_f = fused_m.apply(variables, img, pe, pts)

    np.testing.assert_allclose(np.asarray(q_f), np.asarray(q_ref),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(k_f), np.asarray(k_ref).reshape(k_f.shape),
        atol=2e-5, rtol=2e-5)

    # the fused path must not invent params: init through the fused path
    # yields the identical tree
    v2 = fused_m.init(jax.random.PRNGKey(0), img, pe, pts)
    t1 = jax.tree_util.tree_structure(variables)
    t2 = jax.tree_util.tree_structure(v2)
    assert t1 == t2

def test_i2t_update_shared_keys_matches_broadcast():
    """Shared-keys mode (keys batch 1, tok batch B — layer 0 of a no-mask
    decode): Pallas flipped-grid path == oracle == explicit broadcast."""
    keys, key_pe, _, rng = _mk(4)
    f32 = lambda *s: jnp.asarray(rng.normal(size=s) * 0.5, jnp.float32)
    nt = 7
    tok_k = jnp.pad(f32(B, nt, Ci), ((0, 0), (0, NT - nt), (0, 0)))
    tok_v = jnp.pad(f32(B, nt, Ci), ((0, 0), (0, NT - nt), (0, 0)))
    mask_bias = jnp.asarray(np.where(np.arange(NT) < nt, 0.0, -1e9), jnp.float32)
    weights = (f32(C, Ci), f32(Ci), f32(Ci, C), f32(C), f32(C) * 0 + 1,
               f32(C), f32(C, Ci), f32(Ci), f32(C, Ci), f32(Ci))
    shared = keys[:1]
    bcast = jnp.broadcast_to(shared, keys.shape)
    want = i2t_update(bcast, key_pe, tok_k, tok_v, mask_bias, *weights, NH,
                      dtype=jnp.float32, interpret=True)
    got = i2t_update(shared, key_pe, tok_k, tok_v, mask_bias, *weights, NH,
                     dtype=jnp.float32, interpret=True)
    got_xla = i2t_update_xla(shared, key_pe, tok_k, tok_v, mask_bias,
                             *weights, NH, jnp.float32)
    for g, w in zip(got, want):
        assert g.shape == w.shape
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-5, rtol=2e-5)
    for g, w in zip(got_xla, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-5, rtol=2e-5)


def test_i2t_shared_keys_gradients_flow():
    keys, key_pe, _, rng = _mk(5)
    f32 = lambda *s: jnp.asarray(rng.normal(size=s) * 0.5, jnp.float32)
    nt = 5
    tok_k = jnp.pad(f32(B, nt, Ci), ((0, 0), (0, NT - nt), (0, 0)))
    tok_v = jnp.pad(f32(B, nt, Ci), ((0, 0), (0, NT - nt), (0, 0)))
    mask_bias = jnp.asarray(np.where(np.arange(NT) < nt, 0.0, -1e9), jnp.float32)
    weights = (f32(C, Ci), f32(Ci), f32(Ci, C), f32(C), f32(C) * 0 + 1,
               f32(C), f32(C, Ci), f32(Ci), f32(C, Ci), f32(Ci))

    def loss(k):
        keys2, kn, vn = i2t_update(k, key_pe, tok_k, tok_v, mask_bias,
                                   *weights, NH, dtype=jnp.float32,
                                   force_xla=True)
        return (keys2 ** 2).sum() + (kn ** 2).sum() + (vn ** 2).sum()

    g = jax.grad(loss)(keys[:1])
    assert g.shape == (1, N, C)
    assert np.isfinite(np.asarray(g)).all()


def test_fused_transformer_uniform_src_matches_broadcast():
    """keys at batch 1 with B prompts (uniform src) == the broadcast keys
    run, on both the fused_test and the module paths."""
    from samrs_tpu.sam.transformer import TwoWayTransformer

    rng = np.random.default_rng(6)
    h = w = 8
    emb = 64
    nt = 7
    img1 = jnp.asarray(rng.normal(size=(1, h, w, emb)), jnp.float32)
    imgB = jnp.broadcast_to(img1, (B, h, w, emb))
    pe = jnp.asarray(rng.normal(size=(h, w, emb)), jnp.float32)
    pts = jnp.asarray(rng.normal(size=(B, nt, emb)), jnp.float32)

    for impl in ("xla", "fused_test"):
        m = TwoWayTransformer(depth=2, embedding_dim=emb, num_heads=4,
                              mlp_dim=128, impl=impl)
        variables = m.init(jax.random.PRNGKey(0), imgB, pe, pts)
        q_b, k_b = m.apply(variables, imgB, pe, pts)
        q_u, k_u = m.apply(variables, img1, pe, pts)
        assert q_u.shape == q_b.shape and k_u.shape == k_b.shape
        np.testing.assert_allclose(np.asarray(q_u), np.asarray(q_b),
                                   atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(k_u), np.asarray(k_b),
                                   atol=2e-5, rtol=2e-5)


def test_sam_predict_uniform_src_matches_reference_path(tiny_sam):
    """Sam.predict (masks=None -> src_uniform) is value-identical to the
    explicit broadcast decode on the end-to-end model."""
    from samrs_tpu.sam.sam import Sam

    model, variables = tiny_sam
    cfg = model.cfg
    rng = np.random.default_rng(7)
    g = cfg.grid_size
    feats = jnp.asarray(
        rng.standard_normal((1, g, g, cfg.prompt_embed_dim)), jnp.float32)
    nb = 5
    pts = jnp.asarray(
        np.sort(rng.uniform(0, cfg.image_size, (nb, 2, 2)), axis=1),
        jnp.float32)
    labs = jnp.tile(jnp.asarray([[2, 3]], jnp.int32), (nb, 1))

    low_u, iou_u = model.apply(variables, feats, pts, labs, None, False,
                               method=Sam.predict)
    # reference path: force the broadcast by disabling the uniform flag
    sparse, dense = model.apply(variables, pts, labs, None,
                                method=Sam.encode_prompts)
    low_b, iou_b = model.apply(variables, feats, sparse, dense, False,
                               method=Sam.decode_masks)
    np.testing.assert_allclose(np.asarray(low_u), np.asarray(low_b),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(iou_u), np.asarray(iou_b),
                               atol=1e-5, rtol=1e-5)
