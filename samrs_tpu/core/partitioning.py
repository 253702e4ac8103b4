"""Tensor-parallel parameter partitioning over a (data, model) mesh.

The reference has data parallelism only (SURVEY.md §2.5).  TPU-native
extension: Megatron-style sharding of the transformer matmuls over a `model`
mesh axis — qkv/lin1 kernels column-sharded, proj/lin2 row-sharded — so the
attention heads and MLP hidden dim split across chips and XLA inserts the
all-reduces.  Applies to any of our trunks (SAM encoder, ViT/RVSA, Swin,
decoders) because they share the qkv/proj/lin1/lin2 naming.

Usage:
    mesh = make_mesh(MeshSpec((dp, tp), ("data", "model")))
    params = shard_params(params, mesh)          # device_put w/ NamedShardings
    batch  = jax.device_put(batch, data_sharding(mesh))
    jitted step over these -> GSPMD handles the rest.
"""

from __future__ import annotations

import re
from typing import Any, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, spec builder given param ndim)
_COLUMN = ("qkv/kernel", "lin1/kernel", "q_proj/kernel", "k_proj/kernel",
           "v_proj/kernel", "fc1/kernel", "ffn1/kernel")
_ROW = ("proj/kernel", "lin2/kernel", "out_proj/kernel", "fc2/kernel", "ffn2/kernel")
_COLUMN_BIAS = ("qkv/bias", "lin1/bias", "q_proj/bias", "k_proj/bias", "v_proj/bias",
                "fc1/bias", "ffn1/bias")


def _path_str(path) -> str:
    return "/".join(p.key if hasattr(p, "key") else str(getattr(p, "idx", p)) for p in path)


def param_spec(path: str, param, mesh: Mesh, axis: str = "model") -> P:
    """PartitionSpec for one param; replicated unless a TP rule matches and
    the dimension divides the axis size."""
    if axis not in mesh.axis_names:
        return P()
    size = mesh.shape[axis]
    if param.ndim == 2:
        if any(path.endswith(s) for s in _COLUMN) and param.shape[1] % size == 0:
            return P(None, axis)
        if any(path.endswith(s) for s in _ROW) and param.shape[0] % size == 0:
            return P(axis, None)
    if param.ndim == 1 and any(path.endswith(s) for s in _COLUMN_BIAS):
        if param.shape[0] % size == 0:
            return P(axis)
    return P()


def shard_params(params: Any, mesh: Mesh, axis: str = "model") -> Any:
    """device_put every leaf with its TP NamedSharding (replicated default)."""
    def place(path, p):
        return jax.device_put(p, NamedSharding(mesh, param_spec(_path_str(path), p, mesh, axis)))

    return jax.tree_util.tree_map_with_path(place, params)


def count_sharded(params: Any, mesh: Mesh, axis: str = "model") -> Tuple[int, int]:
    """(num TP-sharded leaves, total leaves) — sanity metric for tests/logs."""
    n_shard = 0
    n_total = 0

    def visit(path, p):
        nonlocal n_shard, n_total
        n_total += 1
        if param_spec(_path_str(path), p, mesh, axis) != P():
            n_shard += 1
        return p

    jax.tree_util.tree_map_with_path(visit, params)
    return n_shard, n_total
