"""Per-block remat (use_checkpoint) parity tests.

The reference's ViT_Win_RVSA uses torch.utils.checkpoint per block
(ED/.../vit_win_rvsa.py `use_checkpoint`); our equivalent is nn.remat around
one transformer block.  These tests pin (a) the param tree is unchanged by
the block refactor (checkpoint/porter compatibility) and (b) loss and grads
match the non-remat path to fp32 reassociation noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from samrs_tpu.seg.backbones.vit import ViTSeg


def _vit(remat: bool) -> ViTSeg:
    return ViTSeg(embed_dim=32, depth=2, num_heads=2, img_size=32,
                  use_checkpoint=remat)


def test_vitseg_block_remat_tree_and_grads():
    x = jnp.asarray(np.random.default_rng(0).random((1, 32, 32, 3)), jnp.float32)
    m0, m1 = _vit(False), _vit(True)
    rngs = {"params": jax.random.PRNGKey(0)}
    v0 = m0.init(rngs, x)
    v1 = m1.init(rngs, x)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)

    def loss(params, m):
        feats = m.apply({"params": params}, x)
        return sum(jnp.mean(f.astype(jnp.float32) ** 2) for f in feats[1:])

    l0, g0 = jax.value_and_grad(lambda p: loss(p, m0))(v0["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(p, m1))(v0["params"])
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    rel = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-8)),
        g0, g1)
    assert max(jax.tree_util.tree_leaves(rel)) < 5e-3


@pytest.mark.parametrize("backbone", ["vit_b", "vit_b_rvsa"])
def test_framework_block_remat_wiring(backbone):
    """MultiHeadSegModel(remat=True) routes ViT-family backbones to per-block
    remat with an identical param tree and identical eval forward."""
    from samrs_tpu.seg.frameworks import MultiHeadSegModel

    kw = dict(backbone=backbone, decoder="unet", num_classes=(4,),
              image_size=64)
    m0 = MultiHeadSegModel(remat=False, **kw)
    m1 = MultiHeadSegModel(remat=True, **kw)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    xs = [jnp.asarray(np.random.default_rng(1).random((1, 64, 64, 3)), jnp.float32)]
    v0 = m0.init(rngs, xs, True)
    v1 = m1.init(rngs, xs, True)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    out0 = m0.apply(v0, xs, False, rngs={"dropout": jax.random.PRNGKey(2)})
    out1 = m1.apply(v0, xs, False, rngs={"dropout": jax.random.PRNGKey(2)})
    for a, b in zip(out0, out1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
