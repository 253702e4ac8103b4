import jax
import jax.numpy as jnp
import numpy as np

from samrs_tpu.sam.sam import Sam, postprocess_masks, preprocess


def test_sam_end_to_end_shapes(tiny_sam):
    model, variables = tiny_sam
    cfg = model.cfg
    x = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    pts = jnp.asarray([[[10.0, 20.0], [50.0, 60.0]]])
    lab = jnp.asarray([[2, 3]], jnp.int32)
    masks, iou = model.apply(variables, x, pts, lab, False)
    g4 = cfg.grid_size * 4
    assert masks.shape == (1, 1, g4, g4)
    assert iou.shape == (1, 1)


def test_sam_multimask_slice(tiny_sam):
    model, variables = tiny_sam
    cfg = model.cfg
    x = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    pts = jnp.asarray([[[10.0, 20.0], [0.0, 0.0]]])
    lab = jnp.asarray([[1, -1]], jnp.int32)
    masks, iou = model.apply(variables, x, pts, lab, True)
    assert masks.shape[1] == cfg.num_multimask_outputs
    assert iou.shape == (1, cfg.num_multimask_outputs)


def test_encoder_feature_shape(tiny_sam):
    model, variables = tiny_sam
    cfg = model.cfg
    x = jnp.zeros((2, cfg.image_size, cfg.image_size, 3), jnp.float32)
    feats = model.apply(variables, x, method=Sam.encode_image)
    assert feats.shape == (2, cfg.grid_size, cfg.grid_size, cfg.prompt_embed_dim)
    assert feats.dtype == jnp.float32


def test_decode_batched_prompts(tiny_sam):
    """Decoding N prompt sets against one image embedding in one call."""
    model, variables = tiny_sam
    cfg = model.cfg
    feats = jnp.zeros((1, cfg.grid_size, cfg.grid_size, cfg.prompt_embed_dim))
    n = 5
    pts = jnp.asarray(np.random.default_rng(0).uniform(0, cfg.image_size, (n, 2, 2)), jnp.float32)
    lab = jnp.tile(jnp.asarray([[2, 3]], jnp.int32), (n, 1))
    masks, iou = model.apply(variables, feats, pts, lab, None, False, method=Sam.predict)
    assert masks.shape[0] == n and iou.shape == (n, 1)


def test_batch_padding_invariance(tiny_sam):
    """Padding extra prompt SETS (batch entries) must not change the real ones.

    This is the property that makes bucket-padding of the box batch in
    SamPredictor.predict_boxes numerically equivalent to the reference's
    variable-length loop (each box is its own prompt set; attention never
    crosses the batch dim)."""
    model, variables = tiny_sam
    cfg = model.cfg
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(1, cfg.grid_size, cfg.grid_size, cfg.prompt_embed_dim)),
                        jnp.float32)
    pts = jnp.asarray(rng.uniform(0, cfg.image_size, (1, 2, 2)), jnp.float32)
    lab = jnp.asarray([[2, 3]], jnp.int32)
    m1, i1 = model.apply(variables, feats, pts, lab, None, False, method=Sam.predict)

    pts_pad = jnp.concatenate([pts, jnp.zeros((3, 2, 2), jnp.float32)], axis=0)
    lab_pad = jnp.concatenate([lab, jnp.full((3, 2), -1, jnp.int32)], axis=0)
    m2, i2 = model.apply(variables, feats, pts_pad, lab_pad, None, False, method=Sam.predict)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2[:1]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i2[:1]), atol=1e-5)


def test_preprocess_pad_and_normalize():
    x = jnp.full((1, 6, 4, 3), 100.0)
    out = preprocess(x, (100.0, 100.0, 100.0), (2.0, 2.0, 2.0), 8)
    assert out.shape == (1, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(out[0, :6, :4]), 0.0)
    # padded region: (0 - 100)/2 = -50? No: reference normalizes THEN pads.
    np.testing.assert_allclose(np.asarray(out[0, 6:, :]), 0.0)
    np.testing.assert_allclose(np.asarray(out[0, :, 4:]), 0.0)


def test_postprocess_masks_crop_resize():
    masks = jnp.asarray(np.random.default_rng(0).normal(size=(2, 1, 32, 32)), jnp.float32)
    out = postprocess_masks(masks, (100, 128), (200, 256), img_size=128)
    assert out.shape == (2, 1, 200, 256)


def test_sam_forward_batched_dict_api(tiny_sam):
    """Reference Sam.forward parity: list of per-image prompt dicts."""
    from samrs_tpu.sam.api import sam_forward_batched
    from samrs_tpu.sam.predictor import SamPredictor

    model, variables = tiny_sam
    pred = SamPredictor(model, variables, buckets=(4, 16))
    rng = np.random.default_rng(0)
    batched_input = [
        {
            "image": (rng.random((48, 64, 3)) * 255).astype(np.uint8),
            "boxes": np.array([[5, 5, 30, 30], [10, 20, 60, 40]], np.float32),
        },
        {
            "image": (rng.random((3, 40, 40)) * 255).astype(np.uint8),  # CHW form
            "point_coords": np.array([[20.0, 20.0]]),
            "point_labels": np.array([1]),
        },
    ]
    outs = sam_forward_batched(pred, batched_input, multimask_output=False)
    assert len(outs) == 2
    assert outs[0]["masks"].shape == (2, 1, 48, 64)
    assert outs[0]["iou_predictions"].shape == (2, 1)
    assert outs[1]["masks"].shape[-2:] == (40, 40)


def test_chunked_decode_matches_direct(tiny_sam):
    """predict_boxes with N > decode_chunk runs the lax.map chunked path;
    results must match the direct single-batch decode (memory-bounding
    rewrite of the image-embedding broadcast, predictor._decode)."""
    from samrs_tpu.sam.predictor import SamPredictor

    model, variables = tiny_sam
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (48, 64, 3), np.uint8)
    boxes = rng.uniform(2, 40, (7, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + 8

    direct = SamPredictor(model, variables, buckets=(8,), decode_chunk=64)
    direct.set_image(img)
    chunked = SamPredictor(model, variables, buckets=(8,), decode_chunk=4)
    chunked.set_image_features(direct.features, direct.original_size, direct.input_size)

    md, iod, lrd = direct.predict_boxes(boxes)
    mc, ioc, lrc = chunked.predict_boxes(boxes)
    np.testing.assert_allclose(lrc, lrd, atol=1e-5)
    np.testing.assert_allclose(ioc, iod, atol=1e-5)
    # binarized masks may flip only where the upsampled logit sits exactly at
    # the threshold (lax.map vs batched reduction order, ~1e-6 logit delta)
    _, _, logits_d = direct.predict_boxes(boxes, return_logits=True)
    mismatch = mc != md
    assert mismatch.mean() < 1e-3
    if mismatch.any():
        up = direct.upscale_chunk(jnp.asarray(logits_d), binarize=False)
        near = np.abs(np.asarray(up) - model.cfg.mask_threshold) < 1e-4
        assert near[mismatch].all()
