"""Cross-resolution SEP -> finetune: the reference's checkpoint pos-embed
surgery (ED/main_finetune.py:290-332, F.interpolate bicubic align_corners=
False) must be reproduced exactly when a pretrain-grid encoder is grafted
into a finetune model at a different resolution."""

import numpy as np
import pytest
import jax.numpy as jnp

from samrs_tpu.core.checkpoint import save_checkpoint
from samrs_tpu.train.finetune import load_pretrained_encoder


def test_bicubic_matches_torch_oracle():
    torch = pytest.importorskip("torch")
    from samrs_tpu.nn.interpolate import resize_bicubic_torch

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 5, 8, 8)).astype(np.float32)
    for out in ((16, 16), (14, 14), (4, 4), (13, 7)):
        ours = np.asarray(resize_bicubic_torch(jnp.asarray(x), out))
        with torch.no_grad():
            ref = torch.nn.functional.interpolate(
                torch.from_numpy(x), size=out, mode="bicubic", align_corners=False
            ).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5,
                                   err_msg=f"bicubic {out} != torch")


def test_pos_embed_surgery_on_graft(tmp_path):
    """Graft a 32px-pretrained ViTSeg encoder (8x8 pos grid at patch 4) into
    a 64px finetune model (16x16): the grafted pos_embed must equal the
    torch-interpolated oracle, and the model must run forward at 64px."""
    torch = pytest.importorskip("torch")
    from samrs_tpu.seg.backbones.vit import ViTSeg
    from samrs_tpu.seg.frameworks import SegHead, SegModel
    from samrs_tpu.seg.decoders.unet import UnetDecoder

    D = 16

    class Tiny(SegModel):
        size: int = 32

        def setup(self):
            self.encoder = ViTSeg(img_size=self.size, patch_size=4, embed_dim=D,
                                  depth=2, num_heads=2)
            self.seg_decoder = UnetDecoder(decoder_channels=(16, 16, 8, 8))
            self.head = SegHead(6)

    rng = np.random.default_rng(1)
    pre = Tiny(num_classes=6, image_size=32, size=32)
    v32 = pre.init({"params": jnp.zeros(2, jnp.uint32)},
                   jnp.zeros((1, 32, 32, 3)), False)
    # give pos_embed non-trivial values
    p32 = v32["params"]
    pos_old = rng.normal(size=np.shape(p32["encoder"]["pos_embed"])).astype(np.float32)
    p32["encoder"]["pos_embed"] = pos_old
    ckpt = tmp_path / "enc.msgpack"
    save_checkpoint(str(ckpt), {"params": {"encoder": p32["encoder"]}})

    ft = Tiny(num_classes=6, image_size=64, size=64)
    v64 = ft.init({"params": jnp.zeros(2, jnp.uint32)},
                  jnp.zeros((1, 64, 64, 3)), False)
    params = load_pretrained_encoder(dict(v64["params"]), str(ckpt))

    # oracle: the reference's exact surgery (main_finetune.py:308-331)
    g_old, g_new = 8, 16
    pt = torch.from_numpy(pos_old.reshape(1, g_old, g_old, D)).permute(0, 3, 1, 2)
    with torch.no_grad():
        ref = torch.nn.functional.interpolate(
            pt, size=(g_new, g_new), mode="bicubic", align_corners=False
        ).permute(0, 2, 3, 1).reshape(1, g_new * g_new, D).numpy()
    got = np.asarray(params["encoder"]["pos_embed"])
    assert got.shape == (1, g_new * g_new, D)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    # non-pos-embed weights grafted unchanged
    np.testing.assert_array_equal(
        np.asarray(params["encoder"]["blocks_0_attn"]["qkv"]["kernel"]),
        np.asarray(p32["encoder"]["blocks_0_attn"]["qkv"]["kernel"]),
    )

    # and the finetune model actually runs at the new resolution
    out = ft.apply({"params": params, "batch_stats": v64["batch_stats"]},
                   jnp.zeros((1, 64, 64, 3)), False)
    assert out.shape[0] == 1 and out.shape[-1] == 6 and np.all(np.isfinite(out))


def test_rvsa_cross_resolution_forward():
    """RVSA has NO absolute pos embed (reference builders) and window-local
    rel-pos tables, so a pretrain-grid checkpoint applies at any finetune
    resolution without surgery — verify a 64px-initialized trunk runs at
    128px with identical params."""
    from samrs_tpu.seg.backbones.rvsa import ViTRVSA

    m = ViTRVSA(img_size=64, patch_size=16, embed_dim=32, depth=4, num_heads=2,
                out_indices=(0, 1, 2, 3), interval=3, use_abs_pos_emb=False)
    v = m.init({"params": jnp.zeros(2, jnp.uint32)}, jnp.zeros((1, 64, 64, 3)), False)
    outs = m.apply(v, jnp.zeros((1, 128, 128, 3)), False)
    assert outs[3].shape[1:3] == (8, 8)  # 128/16 identity tap
