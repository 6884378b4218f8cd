"""Device mesh / sharding helpers.

The TPU-native replacement for the reference's NCCL DDP plumbing
(reference: mmcv init_dist at tools/train.py:173, MMDistributedDataParallel;
SURVEY.md §2.10): no bespoke backend — a jax.sharding.Mesh over ICI plus
sharding annotations, and XLA emits the collectives.

Mesh axes:
  data : batch / video / clip sharding (gradient psum rides this axis)
  time : optional frame-axis sharding for clip inference (sequence
         parallelism where the reference chunks; SURVEY §5 long-context)
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_time: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_time
    use = n_data * n_time
    dev_array = np.asarray(devices[:use]).reshape(n_data, n_time)
    return Mesh(dev_array, axis_names=("data", "time"))


def data_sharding(mesh: Mesh, *axes: Optional[str]) -> NamedSharding:
    """NamedSharding with the given per-dimension axis names
    (None = replicated dim). data_sharding(mesh, 'data') shards dim 0."""
    return NamedSharding(mesh, P(*axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host pytree so dim 0 of every leaf is sharded over `axis`."""
    def place(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(place, batch)
