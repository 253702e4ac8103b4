"""Fused-MLP Pallas kernel vs the Dense-gelu-Dense oracle (interpret mode),
plus MLPBlock impl="fused" numerical + param-structure equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from samrs_tpu.kernels.fused_mlp import fused_mlp, mlp_xla, _pick_block_t
from samrs_tpu.kernels import fused_mlp as fused_mlp_mod
from samrs_tpu.nn.layers import MLPBlock


def _make(T, C, M, seed=0, dt=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(T, C)), dt)
    w1 = jnp.asarray(rng.normal(size=(C, M)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(M,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(M, C)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
    return x, w1, b1, w2, b2


def test_pick_block_t():
    assert _pick_block_t(19600) == 400  # 4-img ViT-H windowed token count
    assert _pick_block_t(16384) == 512
    assert _pick_block_t(100) == 0  # no mult-of-8 divisor in range -> pad
    assert 19600 % _pick_block_t(19600) == 0


@pytest.mark.parametrize("T,C,M", [(512, 256, 1024), (392, 128, 512), (100, 128, 512)])
def test_fused_mlp_interpret_matches_oracle(T, C, M):
    x, w1, b1, w2, b2 = _make(T, C, M)
    want = mlp_xla(x, w1, b1, w2, b2, jnp.float32)
    got = fused_mlp(x, w1, b1, w2, b2, dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)


def test_fused_mlp_interpret_bf16():
    x, w1, b1, w2, b2 = _make(256, 128, 512, dt=jnp.bfloat16)
    want = mlp_xla(x, w1, b1, w2, b2, jnp.bfloat16).astype(jnp.float32)
    got = fused_mlp(x, w1, b1, w2, b2, dtype=jnp.bfloat16, interpret=True).astype(
        jnp.float32
    )
    # kernel applies gelu on the fp32 accumulator (better than the bf16 oracle)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.15, rtol=0.1)


def test_fused_mlp_leading_dims_and_grads():
    x, w1, b1, w2, b2 = _make(96, 128, 256)
    x3 = x.reshape(4, 24, 128)
    want = mlp_xla(x, w1, b1, w2, b2, jnp.float32).reshape(4, 24, 128)
    got = fused_mlp(x3, w1, b1, w2, b2, dtype=jnp.float32)  # CPU -> oracle path
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def loss_fused(w1_):
        return jnp.sum(fused_mlp(x3, w1_, b1, w2, b2, dtype=jnp.float32) ** 2)

    def loss_ref(w1_):
        return jnp.sum(mlp_xla(x, w1_, b1, w2, b2, jnp.float32) ** 2)

    g1 = jax.grad(loss_fused)(w1)
    g2 = jax.grad(loss_ref)(w1)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4, rtol=1e-4)


def test_mlpblock_fused_matches_xla_and_param_tree():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 14, 14, 128)), jnp.float32)
    mx = MLPBlock(mlp_dim=512, dtype=jnp.float32, impl="xla")
    mf = MLPBlock(mlp_dim=512, dtype=jnp.float32, impl="fused")
    vx = mx.init(jax.random.PRNGKey(0), x)
    vf = mf.init(jax.random.PRNGKey(0), x)
    # identical param tree (checkpoint/porter compatibility)
    assert jax.tree_util.tree_structure(vx) == jax.tree_util.tree_structure(vf)
    assert jax.tree_util.tree_map(lambda a: a.shape, vx) == jax.tree_util.tree_map(
        lambda a: a.shape, vf
    )
    # same params -> same output (CPU: fused falls back to the oracle compose)
    yx = mx.apply(vx, x)
    yf = mf.apply(vx, x)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yx), atol=1e-6)


class TestFusedLnMlpResidual:
    def _inputs(self, T=64, C=32, M=128, seed=3):
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.normal(size=(T, C)), jnp.float32)
        g_ln = jnp.asarray(rng.normal(size=(C,)) * 0.1 + 1.0, jnp.float32)
        b_ln = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(C, M)) * 0.05, jnp.float32)
        b1 = jnp.asarray(rng.normal(size=(M,)) * 0.05, jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(M, C)) * 0.05, jnp.float32)
        b2 = jnp.asarray(rng.normal(size=(C,)) * 0.05, jnp.float32)
        return x, g_ln, b_ln, w1, b1, w2, b2

    def test_oracle_matches_flax_composition(self):
        import flax.linen as nn

        x, g_ln, b_ln, w1, b1, w2, b2 = self._inputs()
        ref_ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32).apply(
            {"params": {"scale": g_ln, "bias": b_ln}}, x)
        ref = x + (jax.nn.gelu(ref_ln @ w1 + b1, approximate=False) @ w2 + b2)
        got = fused_mlp_mod.ln_mlp_residual_xla(
            x, g_ln, b_ln, w1, b1, w2, b2, jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_pallas_interpret_matches_oracle(self):
        x, g_ln, b_ln, w1, b1, w2, b2 = self._inputs(T=96, C=32, M=160)
        ref = fused_mlp_mod.fused_ln_mlp_residual(
            x, g_ln, b_ln, w1, b1, w2, b2, dtype=jnp.float32, force_xla=True)
        got = fused_mlp_mod.fused_ln_mlp_residual(
            x, g_ln, b_ln, w1, b1, w2, b2, dtype=jnp.float32, interpret=True,
            block_k=32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)

    def test_gradients_flow(self):
        x, g_ln, b_ln, w1, b1, w2, b2 = self._inputs(T=32, C=16, M=64)

        def loss(x, w1, w2, g_ln):
            out = fused_mlp_mod.fused_ln_mlp_residual(
                x, g_ln, b_ln, w1, b1, w2, b2, dtype=jnp.float32,
                force_xla=True)
            return jnp.sum(out * out)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3))(x, w1, w2, g_ln)
        for g in grads:
            assert np.isfinite(np.asarray(g)).all()


# ------------------------- sublayer tail kernel (crop+add+LN+MLP+residual)


def _make_tail(B, H, W, Hp, Wp, C, M, seed=7):
    rng = np.random.default_rng(seed)
    att_p = jnp.asarray(rng.normal(size=(B, Hp, Wp, C)), jnp.float32)
    sc = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    g_ln = jnp.asarray(1.0 + 0.1 * rng.normal(size=(C,)), jnp.float32)
    b_ln = jnp.asarray(0.1 * rng.normal(size=(C,)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(C, M)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(M,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(M, C)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
    return att_p, sc, g_ln, b_ln, w1, b1, w2, b2


@pytest.mark.parametrize("B,H,W,Hp,Wp", [(2, 16, 16, 21, 21), (1, 32, 16, 32, 16)])
def test_tail_interpret_matches_oracle(B, H, W, Hp, Wp):
    from samrs_tpu.kernels.fused_mlp import (
        fused_tail_ln_mlp_residual,
        tail_ln_mlp_residual_xla,
    )

    C, M = 128, 256
    args = _make_tail(B, H, W, Hp, Wp, C, M)
    want = tail_ln_mlp_residual_xla(*args, jnp.float32)
    got = fused_tail_ln_mlp_residual(*args, dtype=jnp.float32, interpret=True)
    assert got.shape == (B, H, W, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_tail_gradients_match_composition():
    from samrs_tpu.kernels.fused_mlp import (
        fused_tail_ln_mlp_residual,
        tail_ln_mlp_residual_xla,
    )

    args = _make_tail(1, 16, 16, 21, 21, 64, 128)
    att_p, sc = args[0], args[1]

    def loss_fused(a, s):
        return jnp.sum(
            fused_tail_ln_mlp_residual(a, s, *args[2:], dtype=jnp.float32) ** 2)

    def loss_ref(a, s):
        return jnp.sum(tail_ln_mlp_residual_xla(a, s, *args[2:], jnp.float32) ** 2)

    ga, gs = jax.grad(loss_fused, argnums=(0, 1))(att_p, sc)
    ra, rs = jax.grad(loss_ref, argnums=(0, 1))(att_p, sc)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ra), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(rs), atol=1e-4, rtol=1e-4)
    # pad positions of att_p must carry ZERO gradient (never read)
    assert float(jnp.abs(ga[:, 16:, :, :]).max()) == 0.0
    assert float(jnp.abs(ga[:, :, 16:, :]).max()) == 0.0


def test_tail_encoder_wiring_matches_unfused():
    """tail_impl='fused' (XLA fallback off-TPU) must reproduce the default
    Block path bit-close on the same params, and share the param tree."""
    from samrs_tpu.core.config import sam_config
    from samrs_tpu.sam.build import init_sam_variables
    from samrs_tpu.sam.sam import Sam

    kw = dict(image_size=112, encoder_embed_dim=64, encoder_depth=2,
              encoder_num_heads=2, encoder_global_attn_indexes=(1,),
              window_size=4, compute_dtype="float32",
              use_flash_attention=False, window_attn_impl="block_ijb",
              mlp_impl="fused")
    ref_m = Sam(sam_config("vit_b", tail_impl="xla", **kw))
    variables = init_sam_variables(ref_m, seed=0)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, 112, 112, 3)), jnp.float32)
    want = ref_m.apply(variables, img, method=Sam.encode_image)

    tail_m = Sam(sam_config("vit_b", tail_impl="fused", **kw))
    v2 = init_sam_variables(tail_m, seed=0)
    assert (jax.tree_util.tree_structure(v2)
            == jax.tree_util.tree_structure(variables))
    got = tail_m.apply(variables, img, method=Sam.encode_image)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
