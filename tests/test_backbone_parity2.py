"""Torch forward-parity for the remaining backbone families: RVSA (the
paper's flagship), Swin-T, and plain ViT-B's 4-branch FPN neck.

Same harness as test_backbone_parity.py: instantiate the REFERENCE torch
modules (ED/backbone/{vit_win_rvsa_v3_wsz7,swin,vit}.py via the stubbed
import), port random-init weights through the FULL porters
(seg/port.py load_torch_{rvsa,swin,vitseg}_backbone), assert feature parity.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from _torch_ref_backbones import import_ed_backbone

torch = pytest.importorskip("torch")


def _to_nchw(x):
    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2)).contiguous()


def _randomize_zero_params(module, seed, std=0.02):
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            if p.numel() and float(p.abs().max()) == 0.0:
                p.copy_(torch.randn(p.shape, generator=gen) * std)


def _assert_feats_close(t_outs, f_outs, atol, rtol, what):
    assert len(t_outs) == len(f_outs) == 5
    for i in range(1, 5):
        t = t_outs[i].numpy().transpose(0, 2, 3, 1)
        f = np.asarray(f_outs[i])
        assert t.shape == f.shape, (i, t.shape, f.shape)
        np.testing.assert_allclose(
            t, f, atol=atol, rtol=rtol,
            err_msg=f"stage c{i} diverges from reference {what}",
        )


def test_rvsa_parity_and_port():
    """Reference ViT_Win_RVSA_V3_WSZ7 (vit_win_rvsa_v3_wsz7.py:587-817):
    RVSA windows (offset/scale/angle nets -> rotated grid_sample of K/V,
    decomposed rel-pos + Swin bias table), plain full attention every 3rd
    block (NO rel-pos, :83-103), 4-tap FPN neck.  160px -> 10x10 grid pads
    to 14x14 windows, exercising the asymmetric pad + the h//ws offset
    normalization quirk."""
    from samrs_tpu.seg.backbones.rvsa import ViTRVSA
    from samrs_tpu.seg.port import load_torch_rvsa_backbone

    rv = import_ed_backbone("vit_win_rvsa_v3_wsz7")
    torch.manual_seed(20)
    tm = rv.ViT_Win_RVSA_V3_WSZ7(
        img_size=160, patch_size=16, embed_dim=144, depth=8, num_heads=4,
        mlp_ratio=4.0, qkv_bias=True, drop_path_rate=0.1,
        use_abs_pos_emb=False, out_indices=[1, 3, 5, 7], interval=3,
    )
    tm.eval()
    _randomize_zero_params(tm, seed=21, std=0.02)

    fm = ViTRVSA(img_size=160, patch_size=16, embed_dim=144, depth=8,
                 num_heads=4, mlp_ratio=4.0, window_size=7, interval=3,
                 out_indices=(1, 3, 5, 7), drop_path_rate=0.1,
                 use_abs_pos_emb=False)
    rng = np.random.default_rng(22)
    x = rng.normal(size=(2, 160, 160, 3)).astype(np.float32)
    variables = fm.init({"params": jnp.zeros(2, jnp.uint32)}, jnp.asarray(x), False)

    params, loaded, skipped = load_torch_rvsa_backbone(
        tm.state_dict(), variables["params"]
    )
    # final-norm params are the only legitimately unused torch tensors
    real_skips = [k for k in skipped if not k.startswith("norm.")]
    assert not real_skips, f"unexpectedly skipped: {real_skips[:8]}"

    with torch.no_grad():
        t_outs = tm(_to_nchw(x))
    f_outs = fm.apply({"params": params}, jnp.asarray(x), False)
    _assert_feats_close(t_outs, f_outs, atol=5e-4, rtol=1e-3, what="RVSA")


def test_rvsa_no_pad_grid_parity():
    """112px -> 7x7 grid: windows tile exactly (zero pad, single window,
    offset normalization divides by h//ws == 1) — the complementary geometry
    to the padded 10x10 case above."""
    from samrs_tpu.seg.backbones.rvsa import ViTRVSA
    from samrs_tpu.seg.port import load_torch_rvsa_backbone

    rv = import_ed_backbone("vit_win_rvsa_v3_wsz7")
    torch.manual_seed(30)
    tm = rv.ViT_Win_RVSA_V3_WSZ7(
        img_size=112, patch_size=16, embed_dim=96, depth=8, num_heads=4,
        mlp_ratio=2.0, qkv_bias=True, drop_path_rate=0.0,
        use_abs_pos_emb=False, out_indices=[1, 3, 5, 7], interval=3,
    )
    tm.eval()
    _randomize_zero_params(tm, seed=31, std=0.02)

    fm = ViTRVSA(img_size=112, patch_size=16, embed_dim=96, depth=8,
                 num_heads=4, mlp_ratio=2.0, window_size=7, interval=3,
                 out_indices=(1, 3, 5, 7), drop_path_rate=0.0,
                 use_abs_pos_emb=False)
    rng = np.random.default_rng(32)
    x = rng.normal(size=(1, 112, 112, 3)).astype(np.float32)
    variables = fm.init({"params": jnp.zeros(2, jnp.uint32)}, jnp.asarray(x), False)
    params, loaded, skipped = load_torch_rvsa_backbone(tm.state_dict(), variables["params"])

    with torch.no_grad():
        t_outs = tm(_to_nchw(x))
    f_outs = fm.apply({"params": params}, jnp.asarray(x), False)
    _assert_feats_close(t_outs, f_outs, atol=5e-4, rtol=1e-3, what="RVSA-7x7")


def test_swin_t_parity_and_port():
    """Reference Swin (ED/backbone/swin.py:455-692, built as ED/models.py:
    73-81 with drop_path 0.3/ape=False/patch_norm=True) vs our flax Swin
    through the porter.  96px -> 24x24 stage-0 grid exercises window pad +
    shifted-window masking at the 3x3-window stages."""
    from samrs_tpu.seg.backbones.swin import swin_t
    from samrs_tpu.seg.port import load_torch_swin_backbone

    sw = import_ed_backbone("swin")
    torch.manual_seed(40)
    tm = sw.swin(
        embed_dim=96, depths=[2, 2, 6, 2], num_heads=[3, 6, 12, 24],
        window_size=7, ape=False, drop_path_rate=0.3, patch_norm=True,
    )
    tm.eval()
    _randomize_zero_params(tm, seed=41, std=0.02)

    fm = swin_t()
    rng = np.random.default_rng(42)
    x = rng.normal(size=(1, 96, 96, 3)).astype(np.float32)
    variables = fm.init({"params": jnp.zeros(2, jnp.uint32)}, jnp.asarray(x), False)

    params, loaded, skipped = load_torch_swin_backbone(
        tm.state_dict(), variables["params"]
    )
    real_skips = [k for k in skipped if "relative_position_index" not in k
                  and "attn_mask" not in k]
    assert not real_skips, f"unexpectedly skipped: {real_skips[:8]}"

    with torch.no_grad():
        t_outs = tm(_to_nchw(x))
    f_outs = fm.apply({"params": params}, jnp.asarray(x), False)
    _assert_feats_close(t_outs, f_outs, atol=5e-4, rtol=1e-3, what="Swin-T")


def test_vit_b_fpn_parity_and_port():
    """Reference plain ViT (ED/backbone/vit.py:184-388, built as
    ED/models.py:124-139: full attention, abs pos embed, final norm, then
    the 4-branch FPN neck on the LAST map) vs our ViTSeg."""
    from samrs_tpu.seg.backbones.vit import ViTSeg
    from samrs_tpu.seg.port import load_torch_vitseg_backbone

    vt = import_ed_backbone("vit")
    torch.manual_seed(50)
    tm = vt.ViT(
        img_size=96, patch_size=16, embed_dim=192, depth=6, num_heads=6,
        mlp_ratio=4.0, qkv_bias=True, drop_path_rate=0.15,
        use_abs_pos_emb=True,
    )
    tm.eval()
    _randomize_zero_params(tm, seed=51, std=0.02)

    fm = ViTSeg(img_size=96, patch_size=16, embed_dim=192, depth=6,
                num_heads=6, mlp_ratio=4.0, drop_path_rate=0.15,
                use_abs_pos_emb=True)
    rng = np.random.default_rng(52)
    x = rng.normal(size=(2, 96, 96, 3)).astype(np.float32)
    variables = fm.init({"params": jnp.zeros(2, jnp.uint32)}, jnp.asarray(x), False)

    params, loaded, skipped = load_torch_vitseg_backbone(
        tm.state_dict(), variables["params"]
    )
    assert not skipped, f"unexpectedly skipped: {skipped[:8]}"

    with torch.no_grad():
        t_outs = tm(_to_nchw(x))
    f_outs = fm.apply({"params": params}, jnp.asarray(x), False)
    _assert_feats_close(t_outs, f_outs, atol=5e-4, rtol=1e-3, what="ViT-B-FPN")
