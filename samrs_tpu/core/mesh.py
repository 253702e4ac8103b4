"""Device mesh + sharding helpers.

The reference's distributed runtime is NCCL DDP with SLURM rendezvous
(ED/main_pretrain.py:111-148).  The TPU-native equivalent is GSPMD: build one
`jax.sharding.Mesh`, annotate array shardings with `NamedSharding`, and let XLA
insert collectives over ICI/DCN.  No process-group management beyond
`jax.distributed.initialize` (called by the drivers when running multi-host).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Logical mesh description. ``-1`` in shape means 'all remaining devices'.

    Axes (by convention, any subset may be size 1):
      data   -- data parallel (the reference's only strategy, DDP)
      fsdp   -- parameter sharding along data for ZeRO-style memory scaling
      tensor -- tensor parallel within a model block
    """

    shape: Tuple[int, ...] = (-1,)
    axes: Tuple[str, ...] = ("data",)

    def resolve(self, n_devices: int) -> Tuple[int, ...]:
        shape = list(self.shape)
        if -1 in shape:
            known = int(np.prod([s for s in shape if s != -1]))
            if n_devices % known:
                raise ValueError(f"{n_devices} devices not divisible by {known}")
            shape[shape.index(-1)] = n_devices // known
        if int(np.prod(shape)) != n_devices:
            raise ValueError(f"mesh {shape} != {n_devices} devices")
        return tuple(shape)


def make_mesh(spec: MeshSpec = MeshSpec(), devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    shape = spec.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, spec.axes)


def data_sharding(mesh: Mesh, *, axis: str = "data") -> NamedSharding:
    """Batch-dim sharding: the GSPMD analogue of DistributedSampler + DDP."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global(x, sharding: NamedSharding):
    """Place a batch on a (possibly multi-process) mesh, globally.

    Single-process: plain ``device_put``.  Multi-process: each process's
    loader yields only ITS rows (``DataLoader(process_index=...)``), so the
    global array must be assembled from per-process local shards via
    ``jax.make_array_from_process_local_data`` — a bare ``device_put`` would
    treat the local rows as the whole global value and silently drop the
    rows owned by other processes' devices.  This is the GSPMD analogue of
    the reference's DistributedSampler + DDP pairing
    (ED/main_pretrain.py:111-148).
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def shard_batch(batch, mesh: Mesh, *, axis: str = "data"):
    """Place a host-side pytree of arrays batch-sharded on the mesh."""
    sh = data_sharding(mesh, axis=axis)
    return jax.tree_util.tree_map(lambda x: put_global(x, sh), batch)
