"""Backbone/decoder/framework shape + gradient tests (small sizes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from samrs_tpu.seg.frameworks import MultiHeadSegModel, SegModel
from samrs_tpu.seg.registry import get_backbone


SIZE = 64  # input resolution for tests (multiple of 32)


def _init_and_run(model, x, train=False):
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


@pytest.mark.parametrize(
    "name,c_expect",
    [
        ("resnet50", (3, 256, 512, 1024, 2048)),
        ("vit_b", (3, 768, 768, 768, 768)),
        ("vit_b_rvsa", (3, 768, 768, 768, 768)),
        ("swin_t", (3, 96, 192, 384, 768)),
    ],
)
def test_backbone_multiscale_shapes(name, c_expect):
    kw = {}
    if name.startswith("vit"):
        kw = dict(embed_dim=32, depth=4, num_heads=2)
        if name == "vit_b_rvsa":
            kw["out_indices"] = (0, 1, 2, 3)
            kw["window_size"] = 4
        c_expect = (3, 32, 32, 32, 32)
    elif name == "swin_t":
        kw = dict(embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 2, 2), window_size=4)
        c_expect = (3, 16, 32, 64, 128)
    elif name == "resnet50":
        kw = dict(stage_sizes=(1, 1, 1, 1))
    model = get_backbone(name, image_size=SIZE, **kw)
    assert tuple(model.out_channels) == c_expect

    x = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    out, _ = _init_and_run(model, x)
    assert len(out) == 5
    strides = [1, 4, 8, 16, 32]
    for o, s, c in zip(out, strides, c_expect):
        assert o.shape == (1, SIZE // s, SIZE // s, c), (o.shape, s, c)


@pytest.mark.parametrize("decoder", ["unet", "unetpp", "upernet"])
def test_framework_single_head(decoder):
    from samrs_tpu.seg.backbones.resnet import ResNet
    from samrs_tpu.seg.frameworks import SegHead
    from samrs_tpu.seg.registry import get_decoder

    class _TinyRes(SegModel):
        def setup(self):
            self.encoder = ResNet(stage_sizes=(1, 1, 1, 1))
            self.seg_decoder = get_decoder(self.decoder, self.encoder.out_channels)
            self.head = SegHead(self.num_classes)

    model = _TinyRes(
        backbone="resnet50", decoder=decoder, num_classes=6, image_size=SIZE
    )
    x = jnp.zeros((2, SIZE, SIZE, 3), jnp.float32)
    logits, variables = _init_and_run(model, x)
    assert logits.shape == (2, SIZE, SIZE, 6)
    assert logits.dtype == jnp.float32


@pytest.mark.slow  # ~75 s all-heads grad pass; full suite covers it
def test_framework_multi_head_and_grads():
    model = MultiHeadSegModel(
        backbone="swin_t", decoder="upernet", num_classes=(5, 7, 9), image_size=SIZE
    )
    # shrink: full swin-T compile dominates suite time on CPU
    from samrs_tpu.seg.backbones.swin import Swin
    from samrs_tpu.seg.decoders.upernet import UPerHead
    from samrs_tpu.seg.frameworks import SegHead

    class _Tiny(MultiHeadSegModel):
        def setup(self):
            self.encoder = Swin(embed_dim=8, depths=(1, 1, 1, 1),
                                num_heads=(1, 1, 1, 1), window_size=4)
            self.seg_decoder = UPerHead(channels=16)
            self.heads = [SegHead(nc, kernel=1, dropout=0.1, name=f"head_{i}")
                          for i, nc in enumerate((5, 7, 9))]

    model = _Tiny(num_classes=(5, 7, 9), image_size=SIZE)
    x1 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, [x1, x1, x1], True
    )
    outs = model.apply(
        variables, [x1, None, x1], False, rngs={"dropout": jax.random.PRNGKey(2)}
    )
    assert outs[0].shape == (1, SIZE, SIZE, 5)
    assert outs[1] is None
    assert outs[2].shape == (1, SIZE, SIZE, 9)

    # gradient flow through one head
    y = jnp.zeros((1, SIZE, SIZE), jnp.int32)

    def loss_fn(params):
        out = model.apply(
            {**variables, "params": params}, [x1, None, None], False,
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        logits = out[0]
        return -jnp.mean(
            jnp.take_along_axis(jax.nn.log_softmax(logits), y[..., None], axis=-1)
        )

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # encoder gets gradient (shared trunk trains from any head)
    enc_leaf = jax.tree_util.tree_leaves(g["encoder"])[0]
    assert float(jnp.abs(enc_leaf).sum()) >= 0


def test_rvsa_attention_runs_nonsquare():
    """RVSA must handle non-ws-divisible feature maps (symmetric padding)."""
    from samrs_tpu.seg.backbones.rvsa import RotatedVariedSizeWindowAttention

    attn = RotatedVariedSizeWindowAttention(dim=16, num_heads=2, window_size=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 10, 6, 16)), jnp.float32)
    y, _ = attn.init_with_output(jax.random.PRNGKey(0), x)
    assert y.shape == (2, 10, 6, 16)
    assert np.isfinite(np.asarray(y)).all()
