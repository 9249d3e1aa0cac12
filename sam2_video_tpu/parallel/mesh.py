"""Device mesh + sharding rules (the Lightning-DDP/NCCL replacement,
SURVEY.md §5.8).

Data parallelism is expressed as GSPMD: the clip batch is sharded over the
``data`` mesh axis, params/optimizer state are replicated, and XLA inserts the
gradient all-reduce over ICI automatically from the sharded-autodiff mean.
The mesh carries a (currently size-1) ``model`` axis so tensor-parallel
shardings can be added without re-plumbing."""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_dist_initialized = False


def maybe_initialize_distributed(dist_cfg=None) -> bool:
    """``jax.distributed.initialize`` behind a flag (SURVEY.md §5.8 — the
    reference gets multi-process from Lightning DDP, README.md:149-156).

    Enabled by ``trainer.distributed.enabled=true`` or by the presence of
    ``JAX_COORDINATOR_ADDRESS`` in the environment. On TPU pods,
    ``jax.distributed.initialize()`` with no args auto-discovers the
    coordinator from the TPU metadata; for CPU/GPU clusters pass
    coordinator_address/num_processes/process_id (config keys or the
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars).
    MUST run before any other jax call initializes the backend. Returns
    whether distributed mode is active. Idempotent."""
    global _dist_initialized
    dist_cfg = dict(dist_cfg or {})
    enabled = bool(dist_cfg.get("enabled", False)) or bool(
        os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if not enabled or _dist_initialized:
        return _dist_initialized
    kwargs = {}
    addr = (dist_cfg.get("coordinator_address")
            or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if addr:
        kwargs["coordinator_address"] = addr
        nproc = (dist_cfg.get("num_processes")
                 or os.environ.get("JAX_NUM_PROCESSES"))
        pid = dist_cfg.get("process_id")
        if pid is None:
            pid = os.environ.get("JAX_PROCESS_ID")
        if nproc is None or pid is None:
            raise ValueError(
                "distributed init with an explicit coordinator_address also "
                "needs num_processes and process_id (config keys or "
                "JAX_NUM_PROCESSES / JAX_PROCESS_ID)")
        kwargs["num_processes"] = int(nproc)
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)
    _dist_initialized = True
    return True


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


def shard_batch(mesh: Mesh, batch, process_local: bool | None = None):
    """Place a batch with the leading (batch) axis sharded over ``data``.

    Single-process: ``batch`` is host-global and is device_put with the
    sharded layout. Multi-process (``jax.process_count() > 1``): every host
    passes only its LOCAL shard — produced by
    ``ClipLoader(process_index=..., process_count=...)`` — and the global
    array is assembled via ``jax.make_array_from_process_local_data``; no
    host ever materializes the global batch (SURVEY.md §5.8 per-host input
    feeding). ``process_local`` overrides the auto-detection (tests)."""
    s = data_sharded(mesh)
    if process_local is None:
        process_local = jax.process_count() > 1
    if not process_local:
        return jax.tree.map(lambda x: jax.device_put(x, s), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
        batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
