"""Fused mask-upscale+hypernetwork kernel vs the exact XLA composition
(interpret mode), gradient fallback, and MaskDecoder wiring equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from samrs_tpu.kernels.fused_upscale import (
    fused_upscale_hyper,
    upscale_hyper_xla,
)


def _make(B=2, h=8, w=8, C=64, C1=16, C2=8, M=2, seed=0):
    rng = np.random.default_rng(seed)
    src = jnp.asarray(rng.normal(size=(B, h, w, C)), jnp.float32)
    k1 = jnp.asarray(rng.normal(size=(2, 2, C, C1)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(C1,)) * 0.1, jnp.float32)
    lns = jnp.asarray(1.0 + 0.1 * rng.normal(size=(C1,)), jnp.float32)
    lnb = jnp.asarray(rng.normal(size=(C1,)) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.normal(size=(2, 2, C1, C2)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(C2,)) * 0.1, jnp.float32)
    hyper = jnp.asarray(rng.normal(size=(B, M, C2)), jnp.float32)
    return src, k1, b1, lns, lnb, k2, b2, hyper


def test_oracle_matches_module_composition():
    """The kernel's XLA oracle must equal ConvTranspose2x(interleave=False)
    -> LayerNorm2d -> gelu -> ConvTranspose2x -> gelu -> einsum -> interleave
    (the exact predict_masks tail it replaces)."""
    from samrs_tpu.nn.layers import ConvTranspose2x, LayerNorm2d

    src, k1, b1, lns, lnb, k2, b2, hyper = _make()
    B, h, w, _ = src.shape

    conv1 = ConvTranspose2x(k1.shape[-1])
    conv2 = ConvTranspose2x(k2.shape[-1])
    ln = LayerNorm2d()
    up = conv1.apply({"params": {"kernel": k1, "bias": b1}}, src, interleave=False)
    up = ln.apply({"params": {"scale": lns, "bias": lnb}}, up)
    up = jax.nn.gelu(up, approximate=False)
    up = conv2.apply({"params": {"kernel": k2, "bias": b2}}, up, interleave=False)
    up = jax.nn.gelu(up, approximate=False)
    want = jnp.einsum(
        "bmc,bhwijklc->bmhwijkl", hyper, up, preferred_element_type=jnp.float32
    )
    M = want.shape[1]
    want = want.transpose(0, 1, 2, 4, 6, 3, 5, 7).reshape(B, M, 4 * h, 4 * w)

    got = upscale_hyper_xla(src, k1, b1, lns, lnb, k2, b2, hyper, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("B,h,w,C,C1,C2,M", [
    (2, 8, 8, 64, 16, 8, 2),
    (1, 16, 16, 256, 64, 32, 1),   # SAM-shaped channels
    (3, 8, 8, 128, 32, 16, 4),
    (1, 6, 6, 64, 16, 8, 1),       # R=36: exercises the pad path
])
def test_kernel_interpret_matches_oracle(B, h, w, C, C1, C2, M):
    src, k1, b1, lns, lnb, k2, b2, hyper = _make(B, h, w, C, C1, C2, M)
    want = upscale_hyper_xla(src, k1, b1, lns, lnb, k2, b2, hyper, jnp.float32)
    got = fused_upscale_hyper(
        src, k1, b1, lns, lnb, k2, b2, hyper, dtype=jnp.float32, interpret=True
    )
    assert got.shape == (B, M, 4 * h, 4 * w)
    # only difference: in-kernel erf is the Abramowitz-Stegun rational
    # (|err| <= 1.5e-7 on erf; amplified through conv2 + mask dot)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4, rtol=5e-4)


def test_gradients_fall_back_to_oracle():
    src, k1, b1, lns, lnb, k2, b2, hyper = _make()

    def loss_fused(*a):
        return fused_upscale_hyper(*a, dtype=jnp.float32, force_xla=True).sum()

    def loss_oracle(*a):
        return upscale_hyper_xla(*a, jnp.float32).sum()

    args = (src, k1, b1, lns, lnb, k2, b2, hyper)
    g1 = jax.grad(loss_fused, argnums=(0, 1, 7))(*args)
    g2 = jax.grad(loss_oracle, argnums=(0, 1, 7))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_mask_decoder_fused_equals_xla():
    """MaskDecoder(upscale_impl='fused') == 'xla' off-TPU (the kernel falls
    back to the identical composition), including the token-slice path."""
    from samrs_tpu.sam.mask_decoder import MaskDecoder

    rng = np.random.default_rng(1)
    kwargs = dict(
        transformer_dim=64, transformer_depth=2, transformer_mlp_dim=128,
        transformer_num_heads=4,
    )
    dec_f = MaskDecoder(upscale_impl="fused", **kwargs)
    dec_x = MaskDecoder(upscale_impl="xla", **kwargs)
    img = jnp.asarray(rng.normal(size=(1, 8, 8, 64)), jnp.float32)
    pe = jnp.asarray(rng.normal(size=(8, 8, 64)), jnp.float32)
    sparse = jnp.asarray(rng.normal(size=(3, 2, 64)), jnp.float32)
    dense = jnp.asarray(rng.normal(size=(3, 8, 8, 64)), jnp.float32)
    variables = dec_f.init(jax.random.PRNGKey(0), img, pe, sparse, dense)
    assert jax.tree_util.tree_structure(
        dec_x.init(jax.random.PRNGKey(0), img, pe, sparse, dense)
    ) == jax.tree_util.tree_structure(variables)

    for mm in (False, True):
        mf, if_ = dec_f.apply(variables, img, pe, sparse, dense, mm)
        mx, ix = dec_x.apply(variables, img, pe, sparse, dense, mm)
        assert mf.shape == mx.shape == (3, 3 if mm else 1, 32, 32)
        np.testing.assert_allclose(np.asarray(mf), np.asarray(mx), atol=1e-6)
        np.testing.assert_allclose(np.asarray(if_), np.asarray(ix), atol=1e-6)


def test_token_slice_matches_full_compute():
    """Computing only the requested tokens == computing all 4 then slicing
    (the reference's order, mask_decoder.py:102-107)."""
    from samrs_tpu.sam.mask_decoder import MaskDecoder

    rng = np.random.default_rng(2)
    dec = MaskDecoder(
        transformer_dim=64, transformer_depth=2, transformer_mlp_dim=128,
        transformer_num_heads=4, upscale_impl="xla",
    )
    img = jnp.asarray(rng.normal(size=(1, 8, 8, 64)), jnp.float32)
    pe = jnp.asarray(rng.normal(size=(8, 8, 64)), jnp.float32)
    sparse = jnp.asarray(rng.normal(size=(2, 2, 64)), jnp.float32)
    dense = jnp.asarray(rng.normal(size=(2, 8, 8, 64)), jnp.float32)
    variables = dec.init(jax.random.PRNGKey(0), img, pe, sparse, dense)

    full, iou = dec.apply(
        variables, img, pe, sparse, dense, method=MaskDecoder.predict_masks
    )
    for mm, sl in ((False, slice(0, 1)), (True, slice(1, None))):
        m, i = dec.apply(variables, img, pe, sparse, dense, mm)
        np.testing.assert_allclose(np.asarray(m), np.asarray(full[:, sl]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(i), np.asarray(iou[:, sl]), atol=1e-6)
