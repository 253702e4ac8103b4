"""Backbone weight-porting tests (MAE/timm-style ViT -> RVSA trunk)."""

import jax
import jax.numpy as jnp
import numpy as np

from samrs_tpu.seg.backbones.rvsa import vit_b_rvsa
from samrs_tpu.seg.port import interpolate_pos_embed, load_torch_vit_backbone


def _mae_style_sd(depth=2, dim=32, grid=4):
    rng = np.random.default_rng(0)
    sd = {
        "cls_token": rng.normal(size=(1, 1, dim)).astype(np.float32),
        "pos_embed": rng.normal(size=(1, 1 + grid * grid, dim)).astype(np.float32),
        "patch_embed.proj.weight": rng.normal(size=(dim, 3, 16, 16)).astype(np.float32),
        "patch_embed.proj.bias": rng.normal(size=(dim,)).astype(np.float32),
        "norm.weight": np.ones(dim, np.float32),
        "norm.bias": np.zeros(dim, np.float32),
    }
    for i in range(depth):
        b = f"blocks.{i}."
        sd[b + "norm1.weight"] = np.ones(dim, np.float32)
        sd[b + "norm1.bias"] = np.zeros(dim, np.float32)
        sd[b + "norm2.weight"] = np.ones(dim, np.float32)
        sd[b + "norm2.bias"] = np.zeros(dim, np.float32)
        sd[b + "attn.qkv.weight"] = rng.normal(size=(3 * dim, dim)).astype(np.float32)
        sd[b + "attn.qkv.bias"] = np.zeros(3 * dim, np.float32)
        sd[b + "attn.proj.weight"] = rng.normal(size=(dim, dim)).astype(np.float32)
        sd[b + "attn.proj.bias"] = np.zeros(dim, np.float32)
        sd[b + "mlp.fc1.weight"] = rng.normal(size=(4 * dim, dim)).astype(np.float32)
        sd[b + "mlp.fc1.bias"] = np.zeros(4 * dim, np.float32)
        sd[b + "mlp.fc2.weight"] = rng.normal(size=(dim, 4 * dim)).astype(np.float32)
        sd[b + "mlp.fc2.bias"] = np.zeros(dim, np.float32)
    return sd


def test_interpolate_pos_embed():
    pos = np.random.default_rng(1).normal(size=(1, 1 + 16, 8)).astype(np.float32)
    out = interpolate_pos_embed(pos, 64)  # 4x4 -> 8x8
    assert out.shape == (1, 64, 8)
    same = interpolate_pos_embed(pos, 16)
    np.testing.assert_allclose(same, pos[:, 1:], atol=1e-6)


def test_load_mae_into_rvsa():
    # use_abs_pos_emb=True opts back into the pos-embed path to exercise the
    # loader's interpolation; the real RVSA builders ship WITHOUT abs pos
    # embed (vit_win_rvsa_v3_wsz7.py:819-881 use_abs_pos_emb=False), where
    # the MAE checkpoint's pos_embed is simply dropped
    model = vit_b_rvsa(
        image_size=64, embed_dim=32, depth=2, num_heads=2, window_size=4,
        out_indices=(0, 0, 1, 1), interval=2, use_abs_pos_emb=True,
    )
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x, False
    )
    params = variables["params"]
    sd = _mae_style_sd(depth=2, dim=32, grid=4)  # model grid for 64 img = 4
    new_params, loaded, skipped = load_torch_vit_backbone(sd, params)

    # qkv kernels of both blocks must now equal the torch tensors (transposed)
    np.testing.assert_allclose(
        np.asarray(new_params["blocks_0"]["attn"]["qkv"]["kernel"]),
        sd["blocks.0.attn.qkv.weight"].T,
    )
    # pos embed interpolated/copied, cls dropped
    np.testing.assert_allclose(
        np.asarray(new_params["pos_embed"]), sd["pos_embed"][:, 1:], atol=1e-6
    )
    # RVSA-specific params untouched but present
    assert "sampling_offsets" in new_params["blocks_0"]["attn"]
    assert "cls_token" in skipped and "norm.weight" in skipped
    assert len(loaded) >= 2 * 12 + 3  # blocks + patch/pos

    # model still runs with ported weights
    out = model.apply({"params": new_params}, x, False,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    assert len(out) == 5
    assert np.isfinite(np.asarray(out[1])).all()

def test_load_swin_checkpoint():
    from samrs_tpu.seg.backbones.swin import Swin
    from samrs_tpu.seg.port import load_torch_swin_backbone

    model = Swin(embed_dim=8, depths=(1, 1), num_heads=(1, 2), window_size=4)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x, False
    )
    params = variables["params"]
    rng = np.random.default_rng(0)
    sd = {
        "patch_embed.proj.weight": rng.normal(size=(8, 3, 4, 4)).astype(np.float32),
        "patch_embed.proj.bias": np.zeros(8, np.float32),
        "patch_embed.norm.weight": np.ones(8, np.float32),
        "patch_embed.norm.bias": np.zeros(8, np.float32),
        "layers.0.blocks.0.norm1.weight": np.ones(8, np.float32),
        "layers.0.blocks.0.norm1.bias": np.zeros(8, np.float32),
        "layers.0.blocks.0.attn.qkv.weight": rng.normal(size=(24, 8)).astype(np.float32),
        "layers.0.blocks.0.attn.qkv.bias": np.zeros(24, np.float32),
        "layers.0.blocks.0.attn.proj.weight": rng.normal(size=(8, 8)).astype(np.float32),
        "layers.0.blocks.0.attn.proj.bias": np.zeros(8, np.float32),
        "layers.0.blocks.0.attn.relative_position_bias_table":
            rng.normal(size=(49, 1)).astype(np.float32),
        "layers.0.blocks.0.attn.relative_position_index": np.zeros((16, 16), np.int64),
        "layers.0.blocks.0.norm2.weight": np.ones(8, np.float32),
        "layers.0.blocks.0.norm2.bias": np.zeros(8, np.float32),
        "layers.0.blocks.0.mlp.fc1.weight": rng.normal(size=(32, 8)).astype(np.float32),
        "layers.0.blocks.0.mlp.fc1.bias": np.zeros(32, np.float32),
        "layers.0.blocks.0.mlp.fc2.weight": rng.normal(size=(8, 32)).astype(np.float32),
        "layers.0.blocks.0.mlp.fc2.bias": np.zeros(8, np.float32),
        "layers.0.downsample.reduction.weight": rng.normal(size=(16, 32)).astype(np.float32),
        "layers.0.downsample.norm.weight": np.ones(32, np.float32),
        "layers.0.downsample.norm.bias": np.zeros(32, np.float32),
        "norm0.weight": np.ones(8, np.float32),
        "norm0.bias": np.zeros(8, np.float32),
    }
    new_params, loaded, skipped = load_torch_swin_backbone(sd, params)
    np.testing.assert_allclose(
        np.asarray(new_params["stage0_block0"]["attn"]["qkv"]["kernel"]),
        sd["layers.0.blocks.0.attn.qkv.weight"].T,
    )
    np.testing.assert_allclose(
        np.asarray(new_params["merge0"]["reduction"]["kernel"]),
        sd["layers.0.downsample.reduction.weight"].T,
    )
    assert "layers.0.blocks.0.attn.relative_position_index" in skipped
    # still runs
    out = model.apply({"params": new_params}, x, False,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    assert len(out) == 3
