"""Device mesh + sharding rules (the Lightning-DDP/NCCL replacement,
SURVEY.md §5.8).

Data parallelism is expressed as GSPMD: the clip batch is sharded over the
``data`` mesh axis, params/optimizer state are replicated, and XLA inserts the
gradient all-reduce over ICI automatically from the sharded-autodiff mean.
The mesh carries a (currently size-1) ``model`` axis so tensor-parallel
shardings can be added without re-plumbing."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_data: int | None = None, num_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if num_data is None:
        num_data = len(devices) // num_model
    devs = np.asarray(devices[: num_data * num_model]).reshape(
        num_data, num_model)
    return Mesh(devs, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, batch):
    """Place a host-global batch with the batch axis sharded over ``data``."""
    s = data_sharded(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
