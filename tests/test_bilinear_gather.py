"""Pallas DCNv3 bilinear-gather kernel vs the pure-JAX oracle
(kernels/sampling.py::dcnv3 — itself torch-grid_sample-parity-tested).

Interpret mode on CPU; the compiled-TPU A/B lives in bench_train.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from samrs_tpu.kernels.bilinear_gather import (
    dcnv3_pallas,
    grid_sample_pallas,
    ms_deform_attn_hybrid,
    ms_deform_attn_pallas,
)
from samrs_tpu.kernels.sampling import dcnv3, grid_sample, ms_deform_attn


def _make(rng, B, H, W, G, Gc, K, Ho=None, Wo=None, off_range=2.5):
    Ho, Wo = Ho or H, Wo or W
    x = rng.normal(size=(B, H, W, G * Gc)).astype(np.float32)
    # keep offsets away from exact integers so d(hat)/dt is well-defined
    offset = (rng.random((B, Ho, Wo, G * K * 2)) * 2 - 1) * off_range + 0.123
    offset = offset.astype(np.float32)
    mask = rng.random((B, Ho, Wo, G * K)).astype(np.float32)
    mask = mask.reshape(B, Ho, Wo, G, K)
    mask = mask / mask.sum(-1, keepdims=True)
    return jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask.reshape(B, Ho, Wo, G * K))


CASES = [
    # kh, kw, sh, sw, ph, pw, dh, dw, G, Gc, H, W, scale
    (3, 3, 1, 1, 1, 1, 1, 1, 2, 16, 10, 12, 1.0),   # internimage shape class
    (3, 3, 1, 1, 1, 1, 1, 1, 1, 8, 7, 9, 0.5),      # odd sizes, scale != 1
    (3, 3, 2, 2, 1, 1, 1, 1, 2, 4, 12, 8, 1.0),     # stride 2
    (3, 3, 1, 1, 2, 2, 2, 2, 1, 4, 11, 11, 1.0),    # dilation 2
    (1, 1, 1, 1, 0, 0, 1, 1, 3, 4, 6, 6, 1.0),      # K=1 degenerate
]


@pytest.mark.parametrize("case", CASES)
def test_forward_matches_oracle(rng, case):
    kh, kw, sh, sw, ph, pw, dh, dw, G, Gc, H, W, scale = case
    Ho = (H + 2 * ph - (dh * (kh - 1) + 1)) // sh + 1
    Wo = (W + 2 * pw - (dw * (kw - 1) + 1)) // sw + 1
    x, off, m = _make(rng, 2, H, W, G, Gc, kh * kw, Ho, Wo)
    args = (kh, kw, sh, sw, ph, pw, dh, dw, G, Gc, scale)
    ref = dcnv3(x, off, m, *args)
    out = dcnv3_pallas(x, off, m, *args, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_gradients_match_oracle(rng):
    kh = kw = 3
    G, Gc, H, W = 2, 8, 9, 10
    x, off, m = _make(rng, 2, H, W, G, Gc, 9)
    args = (kh, kw, 1, 1, 1, 1, 1, 1, G, Gc, 1.0)

    def loss_ref(x, off, m):
        return jnp.sum(jnp.sin(dcnv3(x, off, m, *args)))

    def loss_ker(x, off, m):
        return jnp.sum(jnp.sin(dcnv3_pallas(x, off, m, *args, interpret=True)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, off, m)
    gk = jax.grad(loss_ker, argnums=(0, 1, 2))(x, off, m)
    for a, b, name in zip(gr, gk, ["dx", "doffset", "dmask"]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-4, err_msg=name
        )


def test_bf16_path_close(rng):
    """bf16 features run the matmuls in bf16; stay within bf16 tolerance."""
    G, Gc, H, W = 2, 16, 8, 8
    x, off, m = _make(rng, 1, H, W, G, Gc, 9, off_range=1.5)
    args = (3, 3, 1, 1, 1, 1, 1, 1, G, Gc, 1.0)
    ref = dcnv3(x, off, m, *args)
    out = dcnv3_pallas(x.astype(jnp.bfloat16), off, m, *args, interpret=True)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-2, rtol=5e-2)


@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_matches_oracle(rng, align_corners):
    img = jnp.asarray(rng.normal(size=(3, 9, 11, 8)), jnp.float32)
    grid = jnp.asarray(rng.random((3, 6, 7, 2)) * 2.4 - 1.2 + 0.017, jnp.float32)
    ref = grid_sample(img, grid, align_corners=align_corners)
    out = grid_sample_pallas(img, grid, align_corners=align_corners, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_grid_sample_gradients_match_oracle(rng):
    img = jnp.asarray(rng.normal(size=(2, 7, 7, 4)), jnp.float32)
    grid = jnp.asarray(rng.random((2, 5, 5, 2)) * 1.7 - 0.85 + 0.013, jnp.float32)

    def l_ref(i, g):
        return jnp.sum(jnp.cos(grid_sample(i, g, align_corners=True)))

    def l_ker(i, g):
        return jnp.sum(jnp.cos(
            grid_sample_pallas(i, g, align_corners=True, interpret=True)))

    gr = jax.grad(l_ref, argnums=(0, 1))(img, grid)
    gk = jax.grad(l_ker, argnums=(0, 1))(img, grid)
    for a, b, name in zip(gr, gk, ["dimg", "dgrid"]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-4, err_msg=name)


def _msda_inputs(rng, B=2, nH=3, D=8, Pt=4, shapes=((6, 7), (3, 4))):
    S = sum(h * w for h, w in shapes)
    Q = 11
    val = jnp.asarray(rng.normal(size=(B, S, nH, D)), jnp.float32)
    loc = jnp.asarray(rng.random((B, Q, nH, len(shapes), Pt, 2)) * 1.2 - 0.1,
                      jnp.float32)  # includes out-of-range
    w = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(B, Q, nH, len(shapes), Pt)), jnp.float32))
    return val, list(shapes), loc, w


def test_ms_deform_attn_matches_oracle(rng):
    val, shapes, loc, w = _msda_inputs(rng)
    ref = ms_deform_attn(val, shapes, loc, w)
    out = ms_deform_attn_pallas(val, shapes, loc, w, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_ms_deform_attn_hybrid_matches_oracle(rng):
    # threshold 6 puts the (6,7) level on the XLA-gather branch and the
    # (3,4) level on the Pallas branch — both groups exercised
    val, shapes, loc, w = _msda_inputs(rng)
    ref = ms_deform_attn(val, shapes, loc, w)
    out = ms_deform_attn_hybrid(val, shapes, loc, w, min_rows_xla=6,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5,
                               rtol=1e-5)

    def l_ref(v, l, ww):
        return jnp.sum(jnp.sin(ms_deform_attn(v, shapes, l, ww)))

    def l_hyb(v, l, ww):
        return jnp.sum(jnp.sin(ms_deform_attn_hybrid(
            v, shapes, l, ww, min_rows_xla=6, interpret=True)))

    gr = jax.grad(l_ref, argnums=(0, 1, 2))(val, loc, w)
    gh = jax.grad(l_hyb, argnums=(0, 1, 2))(val, loc, w)
    for a, b, name in zip(gr, gh, ["dvalue", "dloc", "dweights"]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-4, err_msg=name)


def test_ms_deform_attn_ghb_chunked_matches_oracle(rng, monkeypatch):
    # force the gather-forward into multiple query chunks (concat path)
    import samrs_tpu.kernels.bilinear_gather as bg
    monkeypatch.setattr(bg, "_GATHER_CHUNK_BYTES", 4 * 4 * 8 * 4 * 4)
    val, shapes, loc, w = _msda_inputs(rng)
    ref = ms_deform_attn(val, shapes, loc, w)
    out = ms_deform_attn_hybrid(val, shapes, loc, w, min_rows_xla=3,
                                interpret=True, big_impl="ghb")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5,
                               rtol=1e-5)


def test_ms_deform_attn_hybrid_ghb_matches_oracle(rng):
    # gather-forward + transposed-hat-backward variant on the big level
    val, shapes, loc, w = _msda_inputs(rng)
    ref = ms_deform_attn(val, shapes, loc, w)
    out = ms_deform_attn_hybrid(val, shapes, loc, w, min_rows_xla=6,
                                interpret=True, big_impl="ghb")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5,
                               rtol=1e-5)

    def l_ref(v, l, ww):
        return jnp.sum(jnp.sin(ms_deform_attn(v, shapes, l, ww)))

    def l_ghb(v, l, ww):
        return jnp.sum(jnp.sin(ms_deform_attn_hybrid(
            v, shapes, l, ww, min_rows_xla=6, interpret=True,
            big_impl="ghb")))

    gr = jax.grad(l_ref, argnums=(0, 1, 2))(val, loc, w)
    gh = jax.grad(l_ghb, argnums=(0, 1, 2))(val, loc, w)
    for a, b, name in zip(gr, gh, ["dvalue", "dloc", "dweights"]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-4, err_msg=name)


def test_ms_deform_attn_gradients_match_oracle(rng):
    val, shapes, loc, w = _msda_inputs(rng)

    def l_ref(v, l, ww):
        return jnp.sum(jnp.sin(ms_deform_attn(v, shapes, l, ww)))

    def l_ker(v, l, ww):
        return jnp.sum(jnp.sin(ms_deform_attn_pallas(v, shapes, l, ww, interpret=True)))

    gr = jax.grad(l_ref, argnums=(0, 1, 2))(val, loc, w)
    gk = jax.grad(l_ker, argnums=(0, 1, 2))(val, loc, w)
    for a, b, name in zip(gr, gk, ["dvalue", "dloc", "dweights"]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-4, err_msg=name)


def test_nonmultiple_p_padding(rng):
    """P = Ho*Wo not a multiple of the block size exercises the pad path."""
    G, Gc = 1, 4
    x, off, m = _make(rng, 1, 13, 11, G, Gc, 9)
    args = (3, 3, 1, 1, 1, 1, 1, 1, G, Gc, 1.0)
    ref = dcnv3(x, off, m, *args)
    out = dcnv3_pallas(x, off, m, *args, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_vmem_limit_raised_only_for_large_maps():
    from samrs_tpu.kernels.bilinear_gather import _vmem_limit

    # small maps keep Mosaic's 16 MB default (None = no override)
    assert _vmem_limit(128, 28, 28 * 64) is None
    # Mask2Former pixel-decoder level at 1024^2 (H=W=128, D=32): a 128-query
    # block needs ~21 MB of stack -> limit must be raised with headroom
    lim = _vmem_limit(128, 128, 128 * 32)
    assert lim is not None and 21_000_000 < lim <= 100_000_000


def test_ms_deform_attn_large_map_small_blocks(rng):
    """Shapes that trigger the VMEM-driven block shrink still match the
    oracle (the m2f pixel decoder's 1024^2 failure mode, scaled down in B/Q)."""
    B, nH, D, Pt = 1, 2, 32, 4
    shapes = [(128, 128)]
    S = sum(h * w for h, w in shapes)
    Q = 136  # > one shrunken block, not a multiple of it
    val = jnp.asarray(rng.normal(size=(B, S, nH, D)), jnp.float32)
    loc = jnp.asarray(rng.random((B, Q, nH, 1, Pt, 2)), jnp.float32)
    w = jax.nn.softmax(jnp.asarray(rng.normal(size=(B, Q, nH, 1, Pt)), jnp.float32))
    ref = ms_deform_attn(val, shapes, loc, w)
    out = ms_deform_attn_pallas(val, shapes, loc, w, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)

    def l_ref(v):
        return jnp.sum(jnp.sin(ms_deform_attn(v, shapes, loc, w)))

    def l_ker(v):
        return jnp.sum(jnp.sin(ms_deform_attn_pallas(v, shapes, loc, w, interpret=True)))

    np.testing.assert_allclose(
        np.asarray(jax.grad(l_ker)(val)), np.asarray(jax.grad(l_ref)(val)),
        atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("spread", [0.06, 1.0])
def test_ms_deform_attn_row_slab_matches_oracle(rng, spread):
    """Slab-skipping kernels vs the oracle: clustered sampling rows (the
    deformable regime where slabs are skipped) and fully scattered rows
    (every slab active), incl. out-of-map coords and a padded last block."""
    B, nH, D, Pt = 1, 2, 8, 4
    shapes = [(32, 16), (16, 8)]  # level 0 slabs (Hs=16), level 1 dense
    S = sum(h * w for h, w in shapes)
    Q = 133  # pads the last block -> edge-padded coords path
    val = jnp.asarray(rng.normal(size=(B, S, nH, D)), jnp.float32)
    base = rng.random((B, Q, nH, 2, 1, 1)) * 1.1 - 0.05
    jitter = (rng.random((B, Q, nH, 2, Pt, 2)) - 0.5) * spread
    loc = jnp.asarray(base + jitter, jnp.float32)
    w = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(B, Q, nH, 2, Pt)), jnp.float32))
    ref = ms_deform_attn(val, shapes, loc, w)
    out = ms_deform_attn_pallas(val, shapes, loc, w, interpret=True,
                                row_slab=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    def l_ref(v, l, ww):
        return jnp.sum(jnp.sin(ms_deform_attn(v, shapes, l, ww)))

    def l_ker(v, l, ww):
        return jnp.sum(jnp.sin(ms_deform_attn_pallas(
            v, shapes, l, ww, interpret=True, row_slab=16)))

    gr = jax.grad(l_ref, argnums=(0, 1, 2))(val, loc, w)
    gk = jax.grad(l_ker, argnums=(0, 1, 2))(val, loc, w)
    for a, b, name in zip(gr, gk, ["dvalue", "dloc", "dweights"]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-4, err_msg=name)


def test_auto_slab_selection(monkeypatch):
    from samrs_tpu.kernels.bilinear_gather import _auto_slab

    # dense everywhere by default (slab predication measured negative in
    # both target regimes, r4f sweep — see _auto_slab docstring)
    assert _auto_slab(128) == 0 and _auto_slab(64) == 0
    assert _auto_slab(56) == 0 and _auto_slab(16) == 0
    monkeypatch.setenv("SAMRS_BILINEAR_SLAB", "0")
    assert _auto_slab(128) == 0
    monkeypatch.setenv("SAMRS_BILINEAR_SLAB", "32")
    assert _auto_slab(128) == 32 and _auto_slab(56) == 0  # only where it divides H


def test_dcnv3_row_slab_matches_oracle(rng):
    """DCNv3 on a >=32-row map auto-selects the slab kernels (H=40 -> Hs=8);
    values and all gradients must match the dense oracle."""
    G, Gc, H, W = 2, 8, 40, 12
    x, off, m = _make(rng, 1, H, W, G, Gc, 9, off_range=3.0)
    args = (3, 3, 1, 1, 1, 1, 1, 1, G, Gc, 1.0)
    ref = dcnv3(x, off, m, *args)
    out = dcnv3_pallas(x, off, m, *args, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)

    def l_ref(x, off, m):
        return jnp.sum(jnp.sin(dcnv3(x, off, m, *args)))

    def l_ker(x, off, m):
        return jnp.sum(jnp.sin(dcnv3_pallas(x, off, m, *args, interpret=True)))

    gr = jax.grad(l_ref, argnums=(0, 1, 2))(x, off, m)
    gk = jax.grad(l_ker, argnums=(0, 1, 2))(x, off, m)
    for a, b, name in zip(gr, gk, ["dx", "doffset", "dmask"]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-4, err_msg=name)


def test_point_sample_matches_oracle(rng):
    """Points-in-lanes kernel vs grid_sample(C=1): values, out-of-range
    coords, and gradients (img + coords)."""
    from samrs_tpu.kernels.bilinear_gather import point_sample_pallas

    N, H, W, K = 3, 12, 9, 37
    img = jnp.asarray(rng.normal(size=(N, H, W)), jnp.float32)
    # cover in-range, border-partial, and fully-out-of-range points
    grid = jnp.asarray(rng.random((N, K, 2)) * 3.0 - 1.5 + 0.017, jnp.float32)
    ref = grid_sample(img[..., None], grid[:, None])[:, 0, :, 0]
    out = point_sample_pallas(img, grid, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    def l_ref(im, g):
        return jnp.sum(jnp.sin(grid_sample(im[..., None], g[:, None])[:, 0, :, 0]))

    def l_ker(im, g):
        return jnp.sum(jnp.sin(point_sample_pallas(im, g, interpret=True)))

    gr = jax.grad(l_ref, argnums=(0, 1))(img, grid)
    gk = jax.grad(l_ker, argnums=(0, 1))(img, grid)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gr[1]), atol=1e-5, rtol=1e-5)


def test_point_sample_integer_coords_grad(rng):
    """Exact-integer pixel coords (power-of-two maps hit them): the coord
    gradient must match the floor-based oracle's one-sided derivative, not
    the all-zero -sign(0) convention."""
    from samrs_tpu.kernels.bilinear_gather import point_sample_pallas

    N, H, W = 2, 16, 16
    img = jnp.asarray(rng.normal(size=(N, H, W)), jnp.float32)
    # pixel coords: exact integers, half-integers, and a border-exact point
    px = jnp.asarray([[3.0, 7.5, 0.0, 15.0, 4.0], [2.0, 9.0, 1.5, 0.0, 14.0]])
    py = jnp.asarray([[5.0, 2.5, 0.0, 15.0, 11.5], [8.0, 3.0, 1.0, 15.0, 0.5]])
    # invert the pixel->grid map used by point_sample_pallas
    grid = jnp.stack([(2 * px + 1) / W - 1, (2 * py + 1) / H - 1], -1)

    def l_ref(im, g):
        return jnp.sum(jnp.sin(grid_sample(im[..., None], g[:, None])[:, 0, :, 0]))

    def l_ker(im, g):
        return jnp.sum(jnp.sin(point_sample_pallas(im, g, interpret=True)))

    gr = jax.grad(l_ref, argnums=(0, 1))(img, grid)
    gk = jax.grad(l_ker, argnums=(0, 1))(img, grid)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gr[1]), atol=1e-4, rtol=1e-5)


def test_point_sample_blocked_k(rng):
    """K > one 512-lane block and not a multiple of it."""
    from samrs_tpu.kernels.bilinear_gather import point_sample_pallas

    N, H, W, K = 2, 8, 8, 700
    img = jnp.asarray(rng.normal(size=(N, H, W)), jnp.float32)
    grid = jnp.asarray(rng.random((N, K, 2)) * 2 - 1 + 0.013, jnp.float32)
    ref = grid_sample(img[..., None], grid[:, None])[:, 0, :, 0]
    out = point_sample_pallas(img, grid, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    def l_ker(im):
        return jnp.sum(jnp.cos(point_sample_pallas(im, grid, interpret=True)))

    def l_ref(im):
        return jnp.sum(jnp.cos(grid_sample(im[..., None], grid[:, None])[:, 0, :, 0]))

    np.testing.assert_allclose(
        np.asarray(jax.grad(l_ker)(img)), np.asarray(jax.grad(l_ref)(img)),
        atol=1e-5, rtol=1e-5)


def test_remat_save_policy_dces_sampler_fwd(rng):
    """nn.remat(policy=save_only_these_names('msda_sampled')) must NOT re-run
    the sampling kernel in the backward (the Mask2Former pixel decoder relies
    on this: plain remat duplicated 1.74 s/step of Pallas forward at 1024^2).

    Counts pallas_call eqns in the fully-transposed grad jaxpr: plain vjp and
    remat+save both have exactly fwd+bwd = 2; remat-without-policy has 3."""
    from jax.ad_checkpoint import checkpoint_name

    from samrs_tpu.kernels.bilinear_gather import sample_weighted

    BG, H, W, Gc, P, K = 2, 16, 16, 8, 64, 4
    xg = jnp.asarray(rng.normal(size=(BG, H, W * Gc)), jnp.float32)
    fx = jnp.asarray(rng.random((BG, P, K)) * (W - 1), jnp.float32)
    fy = jnp.asarray(rng.random((BG, P, K)) * (H - 1), jnp.float32)
    mask = jnp.asarray(rng.random((BG, P, K)), jnp.float32)
    wo = jnp.asarray(rng.normal(size=(Gc, Gc)), jnp.float32)

    def body(xg, fx, fy, mask, wo):
        out = sample_weighted(xg, fx, fy, mask, Gc, interpret=True)
        return jnp.tanh(checkpoint_name(out, "msda_sampled") @ wo)

    saved = jax.checkpoint(
        body, policy=jax.checkpoint_policies.save_only_these_names("msda_sampled"))
    rematall = jax.checkpoint(body)
    args = (xg, fx, fy, mask, wo)

    def count(f):
        def loss(*a):
            return jnp.sum(f(*a) ** 2)
        return str(jax.make_jaxpr(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))(*args)
                   ).count("pallas_call")

    assert count(body) == 2
    assert count(saved) == 2  # fwd kernel DCE'd from the bwd recompute
    assert count(rematall) == 3  # plain remat re-runs the fwd kernel

    def lp(*a):
        return jnp.sum(body(*a) ** 2)

    def ls(*a):
        return jnp.sum(saved(*a) ** 2)

    g0 = jax.grad(lp, argnums=(0, 1, 2, 3, 4))(*args)
    g1 = jax.grad(ls, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(g0, g1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
