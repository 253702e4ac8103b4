"""Checkpoint-porting tests: structural coverage + layout-convention parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from samrs_tpu.sam.port import flax_sam_to_torch, torch_sam_to_flax


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = np.asarray(v)
    return out


def test_roundtrip_covers_every_param(tiny_sam):
    """flax -> torch -> flax must reproduce the tree exactly (keys + values).

    Guarantees the mapping table covers every parameter of the model and both
    direction transforms are mutual inverses."""
    model, variables = tiny_sam
    cfg = model.cfg
    sd = flax_sam_to_torch(variables, cfg)
    back = torch_sam_to_flax(sd, cfg)

    a = _flatten(jax.tree_util.tree_map(np.asarray, variables["params"]))
    b = _flatten(back["params"])
    assert set(a) == set(b), (set(a) - set(b), set(b) - set(a))
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_port_rejects_extra_keys(tiny_sam):
    model, variables = tiny_sam
    sd = flax_sam_to_torch(variables, model.cfg)
    sd["bogus.weight"] = np.zeros((1,))
    with pytest.raises(ValueError, match="unconsumed"):
        torch_sam_to_flax(sd, model.cfg)


def test_port_rejects_missing_keys(tiny_sam):
    model, variables = tiny_sam
    sd = flax_sam_to_torch(variables, model.cfg)
    sd.pop("image_encoder.pos_embed")
    with pytest.raises(KeyError):
        torch_sam_to_flax(sd, model.cfg)


def test_convtranspose_convention_matches_torch():
    """The convT transform must make flax ConvTranspose equal torch
    conv_transpose2d (mask decoder upscaling, mask_decoder.py:53-59)."""
    torch = pytest.importorskip("torch")
    from flax import linen as nn

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 4, 4, 3)).astype(np.float32)
    w_t = rng.normal(size=(3, 5, 2, 2)).astype(np.float32)  # (in, out, kh, kw)
    b = rng.normal(size=(5,)).astype(np.float32)

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    yt = torch.nn.functional.conv_transpose2d(
        xt, torch.from_numpy(w_t), torch.from_numpy(b), stride=2
    ).permute(0, 2, 3, 1).numpy()

    from samrs_tpu.sam.port import _TO_FLAX

    kernel = _TO_FLAX["convT"](w_t)
    mod = nn.ConvTranspose(5, (2, 2), strides=(2, 2))
    y = mod.apply(
        {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(b)}}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(y), yt, atol=1e-5)


def test_conv_and_dense_convention_matches_torch():
    torch = pytest.importorskip("torch")
    from flax import linen as nn

    from samrs_tpu.sam.port import _TO_FLAX

    rng = np.random.default_rng(1)
    # conv
    x = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    w = rng.normal(size=(6, 3, 3, 3)).astype(np.float32)  # (O, I, kh, kw)
    b = rng.normal(size=(6,)).astype(np.float32)
    yt = torch.nn.functional.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w), torch.from_numpy(b),
        padding=1,
    ).permute(0, 2, 3, 1).numpy()
    mod = nn.Conv(6, (3, 3), padding=((1, 1), (1, 1)))
    y = mod.apply(
        {"params": {"kernel": jnp.asarray(_TO_FLAX["conv"](w)), "bias": jnp.asarray(b)}},
        jnp.asarray(x),
    )
    np.testing.assert_allclose(np.asarray(y), yt, atol=1e-4)
    # dense
    xd = rng.normal(size=(2, 5)).astype(np.float32)
    wd = rng.normal(size=(7, 5)).astype(np.float32)
    bd = rng.normal(size=(7,)).astype(np.float32)
    yt = (torch.from_numpy(xd) @ torch.from_numpy(wd).T + torch.from_numpy(bd)).numpy()
    dm = nn.Dense(7)
    y = dm.apply(
        {"params": {"kernel": jnp.asarray(_TO_FLAX["dense"](wd)), "bias": jnp.asarray(bd)}},
        jnp.asarray(xd),
    )
    np.testing.assert_allclose(np.asarray(y), yt, atol=1e-5)
