"""Shape/grad tests for the heavier backbones: InternImage-T, ViTAEv2-S,
ViT-Adapter-B (shrunken configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

SIZE = 64


def _run(model, x, train=False):
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x, train
    )
    out = model.apply(
        variables, x, train,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"] if "batch_stats" in variables else False,
    )
    if isinstance(out, tuple):
        out = out[0]
    return out, variables


def test_internimage_shapes():
    from samrs_tpu.seg.backbones.internimage import internimage_t

    model = internimage_t(channels=16, depths=(1, 1, 1, 1), groups=(2, 2, 4, 4))
    assert model.out_channels == (3, 16, 32, 64, 128)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, SIZE, SIZE, 3)), jnp.float32)
    out, _ = _run(model, x)
    strides = [1, 4, 8, 16, 32]
    for o, s, c in zip(out, strides, model.out_channels):
        assert o.shape == (1, SIZE // s, SIZE // s, c)
    assert all(np.isfinite(np.asarray(o)).all() for o in out)


def test_vitae_shapes():
    from samrs_tpu.seg.backbones.vitae import ViTAEv2

    model = ViTAEv2(
        embed_dims=(8, 8, 16, 16), token_dims=(8, 16, 32, 64),
        NC_depth=(1, 1, 1, 1), NC_heads=(1, 2, 2, 2), RC_heads=(1, 1, 2, 2),
        NC_group=(1, 4, 8, 8), RC_group=(1, 2, 4, 4), window_size=4,
    )
    assert model.out_channels == (3, 8, 16, 32, 64)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, SIZE, SIZE, 3)), jnp.float32)
    out, _ = _run(model, x, train=False)
    strides = [1, 4, 8, 16, 32]
    for o, s, c in zip(out, strides, model.out_channels):
        assert o.shape == (1, SIZE // s, SIZE // s, c)


def test_vit_adapter_shapes():
    from samrs_tpu.seg.backbones.vit_adapter import ViTAdapter

    model = ViTAdapter(
        img_size=SIZE, embed_dim=32, depth=4, num_heads=2,
        interaction_indexes=((0, 1), (2, 3)), deform_num_heads=2, n_points=2,
        deform_ratio=0.5,
    )
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, SIZE, SIZE, 3)), jnp.float32)
    out, _ = _run(model, x)
    strides = [1, 4, 8, 16, 32]
    for o, s in zip(out, strides):
        assert o.shape[:3] == (1, SIZE // s, SIZE // s)
    assert all(np.isfinite(np.asarray(o)).all() for o in out)


def test_internimage_gradflow():
    """DCNv3 offsets/masks must receive gradients (the custom-VJP path)."""
    from samrs_tpu.seg.backbones.internimage import DCNv3Module

    mod = DCNv3Module(channels=8, groups=2)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 8, 8, 8)), jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x)

    def loss(params):
        return jnp.sum(mod.apply({"params": params}, x) ** 2)

    g = jax.grad(loss)(variables["params"])
    assert float(jnp.abs(g["offset"]["kernel"]).sum()) >= 0
    assert np.isfinite(np.asarray(g["dw_conv"]["kernel"])).all()
    # value path must definitely flow
    assert float(jnp.abs(g["input_proj"]["kernel"]).sum()) > 0
