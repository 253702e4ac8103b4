"""Tensor-parallel partitioning tests on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from samrs_tpu.core.mesh import MeshSpec, make_mesh
from samrs_tpu.core.partitioning import count_sharded, param_spec, shard_params


def test_param_spec_rules():
    mesh = make_mesh(MeshSpec((4, 2), ("data", "model")))
    qkv = np.zeros((8, 24))
    assert param_spec("encoder/blocks_0/attn/qkv/kernel", qkv, mesh) == P(None, "model")
    proj = np.zeros((8, 8))
    assert param_spec("encoder/blocks_0/attn/proj/kernel", proj, mesh) == P("model", None)
    assert param_spec("encoder/blocks_0/mlp/lin1/kernel", np.zeros((8, 32)), mesh) == P(
        None, "model"
    )
    assert param_spec("encoder/blocks_0/mlp/lin2/kernel", np.zeros((32, 8)), mesh) == P(
        "model", None
    )
    # bias of column-parallel layers shards too
    assert param_spec("encoder/blocks_0/attn/qkv/bias", np.zeros((24,)), mesh) == P("model")
    # norms / odd dims stay replicated
    assert param_spec("encoder/blocks_0/norm1/scale", np.zeros((8,)), mesh) == P()
    assert param_spec("x/qkv/kernel", np.zeros((8, 9)), mesh) == P()  # 9 % 2 != 0


def test_tp_matmul_equivalence():
    """A sharded qkv+proj pipeline must match the replicated result."""
    mesh = make_mesh(MeshSpec((4, 2), ("data", "model")))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
    params = {
        "attn": {
            "qkv": {"kernel": jnp.asarray(rng.normal(size=(16, 48)), jnp.float32)},
            "proj": {"kernel": jnp.asarray(rng.normal(size=(48, 16)), jnp.float32)},
        }
    }

    def fwd(p, x):
        h = x @ p["attn"]["qkv"]["kernel"]
        h = jax.nn.relu(h)
        return h @ p["attn"]["proj"]["kernel"]

    expect = fwd(params, x)
    sharded = shard_params(params, mesh)
    with mesh:
        got = jax.jit(fwd)(sharded, jax.device_put(x, jax.sharding.NamedSharding(mesh, P("data"))))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=2e-5, atol=1e-4)
    n, total = count_sharded(params, mesh)
    assert n == 2 and total == 2