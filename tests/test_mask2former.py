"""Mask2Former decoder / matching / loss tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute e2e; excluded from the default fast gate

from samrs_tpu.seg.decoders.mask2former import (
    Mask2FormerDecoder,
    hungarian_match,
    mask2former_loss,
    mask2former_predict,
    semantic_to_instances,
    sine_positional_encoding,
)

SIZE = 64


def test_sine_pe_shape():
    pe = sine_positional_encoding(8, 12, 32)
    assert pe.shape == (8, 12, 32)
    assert np.isfinite(np.asarray(pe)).all()


def test_hungarian_matches_scipy():
    from scipy.optimize import linear_sum_assignment

    rng = np.random.default_rng(0)
    cost = rng.random((2, 5, 3)).astype(np.float32)
    assign = np.asarray(hungarian_match(jnp.asarray(cost)))
    for b in range(2):
        rows, cols = linear_sum_assignment(cost[b])
        expect = np.full(5, -1, np.int32)
        expect[rows] = cols
        np.testing.assert_array_equal(assign[b], expect)


def test_hungarian_device_exactness_sweep():
    """The on-device JV solver attains scipy's optimal TOTAL COST on random,
    square, large-spread (1e6 invalid-slot sentinel) and tied matrices —
    assignments may differ only between equal-cost optima."""
    from scipy.optimize import linear_sum_assignment

    rng = np.random.default_rng(1)
    cases = []
    for _ in range(10):
        q = int(rng.integers(2, 40))
        g = int(rng.integers(1, q + 1))
        cases.append(rng.random((q, g)).astype(np.float32) * 10)
    c = rng.random((20, 7)).astype(np.float32)
    c[:, 3:] = 1e6  # mask2former's invalid-gt sentinel
    cases.append(c)
    cases.append(np.ones((6, 4), np.float32))  # fully tied
    cases.append(np.asarray([[0.0, 1.0], [0.0, 1.0], [1.0, 0.0]], np.float32))
    for _ in range(4):  # Q < G (tiny-config shape)
        q = int(rng.integers(1, 8))
        cases.append(rng.random((q, int(rng.integers(q, 20)))).astype(np.float32))
    for cost in cases:
        q, g = cost.shape
        g = min(g, q)  # scipy matches min(Q, G) pairs
        assign = np.asarray(hungarian_match(jnp.asarray(cost)[None]))[0]
        rows = np.nonzero(assign >= 0)[0]
        assert len(rows) == g, (q, g, assign)
        cols = assign[rows]
        assert len(np.unique(cols)) == g  # a valid assignment
        ours = cost[rows, cols].sum()
        r2, c2 = linear_sum_assignment(cost)
        np.testing.assert_allclose(ours, cost[r2, c2].sum(), rtol=1e-6)


def test_semantic_to_instances():
    labels = jnp.asarray([[[0, 0], [2, 255]]], jnp.int32)
    masks, valid = semantic_to_instances(labels, 4)
    assert masks.shape == (1, 4, 2, 2)
    assert valid[0].tolist() == [True, False, True, False]
    np.testing.assert_array_equal(np.asarray(masks[0, 0]), [[1, 1], [0, 0]])
    np.testing.assert_array_equal(np.asarray(masks[0, 2]), [[0, 0], [1, 0]])


def _tiny_decoder(nc=5):
    return Mask2FormerDecoder(
        in_channels=(16, 16, 32, 32), embed_dim=32,
        num_queries=8, num_decoder_layers=3, num_heads=2,
    )


def _feats(rng, B=1):
    sizes = [(16, 16, 16), (8, 8, 16), (4, 4, 32), (2, 2, 32)]
    img = jnp.zeros((B, SIZE, SIZE, 3))
    return [img] + [
        jnp.asarray(rng.normal(size=(B, h, w, c)), jnp.float32) for h, w, c in sizes
    ]


def test_decoder_outputs():
    model = _tiny_decoder()
    feats = _feats(np.random.default_rng(0))
    variables = model.init(jax.random.PRNGKey(0), feats, False)
    outs = model.apply(variables, feats, False)
    assert len(outs) == 4  # initial + 3 layers
    for query_feats, mask_logits in outs:
        assert query_feats.shape == (1, 8, 32)  # class-agnostic query feats
        assert mask_logits.shape == (1, 8, 16, 16)  # stride-4 map


def test_loss_and_grads():
    model = _tiny_decoder()
    feats = _feats(np.random.default_rng(1))
    variables = model.init(jax.random.PRNGKey(0), feats, False)
    labels = jnp.asarray(
        np.random.default_rng(2).integers(0, 5, (1, SIZE, SIZE)), jnp.int32
    )

    from samrs_tpu.seg.decoders.mask2former import Mask2FormerHead

    head = Mask2FormerHead(5)
    outs0 = model.apply(variables, feats, False)
    hv = head.init(jax.random.PRNGKey(1), outs0)

    def loss_fn(params, hparams):
        outs = model.apply({"params": params}, feats, True)
        outs = head.apply({"params": hparams}, outs)
        losses = mask2former_loss(outs, labels, num_classes=5)
        return losses["loss_cls"] + losses["loss_mask"] + losses["loss_dice"]

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"], hv["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_point_sample_matches_dense():
    """point_sample at exact pixel centers must reproduce the dense mask
    (mmcv.ops.point_sample = grid_sample align_corners=False)."""
    from samrs_tpu.seg.decoders.mask2former import point_sample

    rng = np.random.default_rng(3)
    m = jnp.asarray(rng.normal(size=(2, 8, 8)), jnp.float32)
    ys, xs = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    coords = np.stack([(xs + 0.5) / 8, (ys + 0.5) / 8], -1).reshape(1, 64, 2)
    coords = jnp.asarray(np.tile(coords, (2, 1, 1)), jnp.float32)
    out = point_sample(m, coords)
    np.testing.assert_allclose(np.asarray(out).reshape(2, 8, 8), np.asarray(m), atol=1e-6)


def test_uncertain_point_coords_shapes():
    from samrs_tpu.seg.decoders.mask2former import uncertain_point_coords

    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.normal(size=(3, 16, 16)) * 3, jnp.float32)
    pts = uncertain_point_coords(jax.random.PRNGKey(0), logits, 64, 3.0, 0.75)
    assert pts.shape == (3, 64, 2)
    assert float(pts.min()) >= 0.0 and float(pts.max()) <= 1.0
    # the uncertain (first 75%) points must carry lower |logit| than random ones
    from samrs_tpu.seg.decoders.mask2former import point_sample

    sampled = np.abs(np.asarray(point_sample(logits, pts)))
    assert sampled[:, :48].mean() < sampled[:, 48:].mean()


def test_loss_point_sampled_mode():
    """Point-sampled losses (mmdet 12544-point scheme) stay finite with
    nonzero grads and track the exact full-mask losses at moderate K."""
    model = _tiny_decoder()
    feats = _feats(np.random.default_rng(5))
    variables = model.init(jax.random.PRNGKey(0), feats, False)
    labels = jnp.asarray(
        np.random.default_rng(6).integers(0, 5, (1, SIZE, SIZE)), jnp.int32
    )
    from samrs_tpu.seg.decoders.mask2former import Mask2FormerHead

    head = Mask2FormerHead(5)
    outs0 = model.apply(variables, feats, False)
    hv = head.init(jax.random.PRNGKey(1), outs0)

    def loss_fn(params, hparams, num_points):
        outs = model.apply({"params": params}, feats, True)
        outs = head.apply({"params": hparams}, outs)
        losses = mask2former_loss(
            outs, labels, num_classes=5, num_points=num_points,
            rng=jax.random.PRNGKey(7) if num_points else None,
        )
        return losses["loss_cls"] + losses["loss_mask"] + losses["loss_dice"]

    loss_pt, grads = jax.value_and_grad(loss_fn)(
        variables["params"], hv["params"], 256
    )
    assert np.isfinite(float(loss_pt))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)

    loss_full = loss_fn(variables["params"], hv["params"], None)
    # point estimate should be in the same ballpark as the exact loss
    assert abs(float(loss_pt) - float(loss_full)) / max(float(loss_full), 1e-6) < 0.5


def test_predict_semantic():
    cls_logits = jnp.asarray(np.random.default_rng(3).normal(size=(1, 8, 6)), jnp.float32)
    mask_logits = jnp.asarray(
        np.random.default_rng(4).normal(size=(1, 8, 16, 16)), jnp.float32
    )
    seg = mask2former_predict(cls_logits, mask_logits, 5)
    assert seg.shape == (1, 16, 16, 5)
    assert (np.asarray(seg) >= 0).all()
