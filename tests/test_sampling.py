"""Sampling-op oracle tests (the reference ops/test.py pattern): our pure-JAX
grid_sample vs torch.nn.functional.grid_sample, plus MSDA/DCNv3 invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from samrs_tpu.kernels.sampling import dcnv3, grid_sample, ms_deform_attn


def test_grid_sample_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 7, 9, 4)).astype(np.float32)
    grid = (rng.random((2, 5, 6, 2)) * 2.4 - 1.2).astype(np.float32)  # includes OOB

    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    theirs = torch.nn.functional.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_grid_sample_align_corners_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    img = rng.normal(size=(1, 6, 6, 2)).astype(np.float32)
    grid = (rng.random((1, 4, 4, 2)) * 2 - 1).astype(np.float32)
    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid), align_corners=True))
    theirs = torch.nn.functional.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2), torch.from_numpy(grid),
        align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_grid_sample_gradients():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.normal(size=(1, 5, 5, 2)), jnp.float32)
    grid = jnp.asarray(rng.random((1, 3, 3, 2)) * 1.6 - 0.8, jnp.float32)

    g_img, g_grid = jax.grad(
        lambda i, g: jnp.sum(grid_sample(i, g) ** 2), argnums=(0, 1)
    )(img, grid)
    assert np.isfinite(np.asarray(g_img)).all()
    assert np.isfinite(np.asarray(g_grid)).all()
    assert float(jnp.abs(g_grid).sum()) > 0  # coords receive gradient


def test_ms_deform_attn_center_identity():
    """Sampling exactly at pixel centers with all weight on one point must
    return that pixel's value."""
    B, nH, D = 1, 2, 4
    shapes = [(4, 4), (2, 2)]
    S = sum(h * w for h, w in shapes)
    rng = np.random.default_rng(3)
    value = jnp.asarray(rng.normal(size=(B, S, nH, D)), jnp.float32)

    # query 0 samples level-0 pixel (1, 2) center: normalized ((2+.5)/4, (1+.5)/4)
    Q, L, P = 1, 2, 1
    loc = np.zeros((B, Q, nH, L, P, 2), np.float32)
    loc[..., 0, :, 0] = (2 + 0.5) / 4  # x
    loc[..., 0, :, 1] = (1 + 0.5) / 4  # y
    loc[..., 1, :, :] = 0.5
    wts = np.zeros((B, Q, nH, L, P), np.float32)
    wts[..., 0, :] = 1.0  # all weight on level 0

    out = ms_deform_attn(value, shapes, jnp.asarray(loc), jnp.asarray(wts))
    expect = value[:, 1 * 4 + 2]  # (B, nH, D) at flat index of (1,2)
    np.testing.assert_allclose(
        np.asarray(out).reshape(B, nH, D), np.asarray(expect), atol=1e-5
    )


def test_ms_deform_attn_weight_mixing():
    """Output must be linear in attention weights across levels."""
    B, nH, D, Q, P = 2, 2, 8, 5, 3
    shapes = [(6, 6), (3, 3)]
    S = sum(h * w for h, w in shapes)
    rng = np.random.default_rng(4)
    value = jnp.asarray(rng.normal(size=(B, S, nH, D)), jnp.float32)
    loc = jnp.asarray(rng.random((B, Q, nH, 2, P, 2)), jnp.float32)
    w1 = jnp.asarray(rng.random((B, Q, nH, 2, P)), jnp.float32)
    w2 = jnp.asarray(rng.random((B, Q, nH, 2, P)), jnp.float32)
    o1 = ms_deform_attn(value, shapes, loc, w1)
    o2 = ms_deform_attn(value, shapes, loc, w2)
    o12 = ms_deform_attn(value, shapes, loc, w1 + w2)
    np.testing.assert_allclose(np.asarray(o1 + o2), np.asarray(o12), atol=1e-4)


def test_dcnv3_identity_1x1():
    """1x1 kernel, zero offset, unit mask -> identity."""
    rng = np.random.default_rng(5)
    B, H, W, G, Gc = 1, 6, 6, 2, 4
    x = jnp.asarray(rng.normal(size=(B, H, W, G * Gc)), jnp.float32)
    offset = jnp.zeros((B, H, W, G * 1 * 2), jnp.float32)
    mask = jnp.ones((B, H, W, G * 1), jnp.float32)
    out = dcnv3(x, offset, mask, 1, 1, pad_h=0, pad_w=0, groups=G, group_channels=Gc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_dcnv3_uniform_mask_is_avgpool():
    """3x3 kernel, zero offsets, uniform mask == 3x3 average (zero padded)."""
    rng = np.random.default_rng(6)
    B, H, W = 1, 5, 5
    x = jnp.asarray(rng.normal(size=(B, H, W, 1)), jnp.float32)
    K = 9
    offset = jnp.zeros((B, H, W, K * 2), jnp.float32)
    mask = jnp.full((B, H, W, K), 1.0 / K, jnp.float32)
    out = dcnv3(x, offset, mask, 3, 3, pad_h=1, pad_w=1, groups=1, group_channels=1)
    padded = jnp.pad(x[0, :, :, 0], 1)
    expect = np.zeros((H, W), np.float32)
    for i in range(H):
        for j in range(W):
            expect[i, j] = np.asarray(padded[i : i + 3, j : j + 3]).mean()
    np.testing.assert_allclose(np.asarray(out[0, :, :, 0]), expect, atol=1e-5)
