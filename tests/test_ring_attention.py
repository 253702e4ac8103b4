"""Ring attention vs full-softmax oracle on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from samrs_tpu.kernels.ring_attention import ring_attention, sp_attention


def _oracle(q, k, v, scale, bias=None):
    s = jnp.einsum("bqd,bkd->bqk", q * scale, k).astype(jnp.float32)
    if bias is not None:
        s = s + bias
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v).astype(jnp.float32)


def _mesh():
    return Mesh(np.array(jax.devices()).reshape(8), ("seq",))


@pytest.mark.parametrize("with_bias", [False, True])
def test_ring_attention_matches_full(rng, with_bias):
    B, N, d = 2, 64, 16
    scale = d ** -0.5
    q = jnp.asarray(rng.standard_normal((B, N, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, d)), jnp.float32)
    bias = (
        jnp.asarray(rng.standard_normal((B, N, N)) * 0.5, jnp.float32)
        if with_bias else None
    )
    mesh = _mesh()
    out = jax.jit(
        lambda *a: sp_attention(*a[:3], mesh=mesh, scale=scale,
                                bias=a[3] if with_bias else None)
    )(*(q, k, v, bias) if with_bias else (q, k, v))
    ref = _oracle(q, k, v, scale, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # output keeps the sequence sharding
    assert tuple(out.sharding.spec) + (None,) * (3 - len(out.sharding.spec)) == (
        None, "seq", None)


def test_ring_attention_sequence_sharded_memory_shape(rng):
    """Each shard_map body only ever sees (B, N/8, d) operands."""
    B, N, d = 1, 32, 8
    mesh = _mesh()
    seen = []

    def probe(q, k, v):
        seen.append(q.shape)
        return ring_attention(q, k, v, "seq", 1.0)

    from jax import shard_map

    q = jnp.zeros((B, N, d))
    shard_map(probe, mesh=mesh, in_specs=(P(None, "seq", None),) * 3,
              out_specs=P(None, "seq", None), check_vma=False)(q, q, q)
    assert seen[0] == (B, N // 8, d)


def test_sp_flash_attention_relpos_matches_oracle(rng):
    """Sequence-parallel global attention == the XLA rel-pos oracle that the
    single-chip flash kernel is also tested against."""
    from samrs_tpu.kernels.flash_attention import attention_relpos_xla
    from samrs_tpu.kernels.ring_attention import sp_flash_attention_relpos

    B, H, W, d = 2, 8, 4, 16
    N = H * W
    scale = d ** -0.5
    q = jnp.asarray(rng.standard_normal((B, N, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, d)), jnp.float32)
    Rh = jnp.asarray(rng.standard_normal((H, H, d)) * 0.1, jnp.float32)
    Rw = jnp.asarray(rng.standard_normal((W, W, d)) * 0.1, jnp.float32)
    mesh = _mesh()

    out = jax.jit(lambda *a: sp_flash_attention_relpos(
        *a, (H, W), scale, mesh))(q, k, v, Rh, Rw)

    rel_h = jnp.einsum("bhwc,hkc->bhwk", q.reshape(B, H, W, d), Rh).reshape(B, N, H)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", q.reshape(B, H, W, d), Rw).reshape(B, N, W)
    ref = attention_relpos_xla(q, k, v, rel_h, rel_w, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_encoder_sp_matches_single_device(rng):
    """Full SAM image encoder with sequence parallelism over the 8-device
    mesh == the same encoder (same params) without SP."""
    from samrs_tpu.sam.image_encoder import ImageEncoderViT

    kwargs = dict(
        img_size=128, patch_size=16, embed_dim=32, depth=2, num_heads=2,
        out_chans=16, window_size=4, global_attn_indexes=(1,),
        use_rel_pos=True, use_flash=True,
    )
    enc = ImageEncoderViT(**kwargs)
    enc_sp = ImageEncoderViT(**kwargs, sp_mesh=_mesh())
    x = jnp.asarray(rng.standard_normal((2, 128, 128, 3)), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), x)
    ref = jax.jit(enc.apply)(variables, x)
    out = jax.jit(enc_sp.apply)(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
