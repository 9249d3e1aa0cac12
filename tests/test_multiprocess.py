"""Multi-process (multi-host) training path: per-host input sharding
disjointness/coverage, the process-local batch assembly in
``mesh.shard_batch``, the distributed-init gate, and a REAL 2-process x
4-CPU-device run through ``jax.distributed.initialize`` asserted against
the single-process 8-device trajectory (SURVEY.md §5.8 — the reference
gets this from Lightning DDP, README.md:149-156)."""

import json
import os
import socket
import subprocess
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sam2_video_tpu.data.pipeline import ClipLoader
from sam2_video_tpu.parallel import mesh as mesh_mod


class _FakeDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n


@pytest.mark.parametrize("n,procs", [(64, 2), (64, 4), (37, 4), (8, 8)])
def test_loader_host_shards_disjoint_and_cover(n, procs):
    """Every clip index lands on exactly one process per epoch; the shuffled
    permutation is identical across processes (seeded by (seed, epoch) only),
    which is what makes the strided shard split valid."""
    ds = _FakeDataset(n)
    loaders = [ClipLoader(ds, batch_size=1, shuffle=True, seed=3,
                          process_index=p, process_count=procs)
               for p in range(procs)]
    shards = [ld._epoch_indices() for ld in loaders]
    all_idx = np.concatenate(shards)
    assert len(all_idx) == n
    assert set(all_idx.tolist()) == set(range(n))
    for a in range(procs):
        for b in range(a + 1, procs):
            assert not set(shards[a].tolist()) & set(shards[b].tolist())
    # balanced within 1
    sizes = [len(s) for s in shards]
    assert max(sizes) - min(sizes) <= 1


def test_loader_shard_changes_per_epoch_but_stays_disjoint():
    ds = _FakeDataset(32)
    l0 = ClipLoader(ds, batch_size=1, shuffle=True, seed=0,
                    process_index=0, process_count=2)
    l1 = ClipLoader(ds, batch_size=1, shuffle=True, seed=0,
                    process_index=1, process_count=2)
    e0 = (l0._epoch_indices(), l1._epoch_indices())
    l0.epoch = l1.epoch = 1
    e1 = (l0._epoch_indices(), l1._epoch_indices())
    assert not np.array_equal(e0[0], e1[0])  # reshuffled
    assert not set(e1[0].tolist()) & set(e1[1].tolist())
    assert set(np.concatenate(e1).tolist()) == set(range(32))


def test_shard_batch_process_local_path_matches_device_put():
    """The make_array_from_process_local_data path (used when
    process_count > 1) must produce the same global array + sharding as the
    single-process device_put path. Exercised on the 8-device CPU mesh with
    process_local forced (single process holds the full batch)."""
    mesh = mesh_mod.make_mesh(num_data=8, num_model=1)
    batch = {"x": np.arange(8 * 3, dtype=np.float32).reshape(8, 3),
             "y": np.arange(8, dtype=np.int32)}
    a = mesh_mod.shard_batch(mesh, batch, process_local=False)
    b = mesh_mod.shard_batch(mesh, batch, process_local=True)
    for k in batch:
        assert a[k].sharding.is_equivalent_to(b[k].sharding, a[k].ndim)
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
    # the batch axis is actually split: one row per device
    assert len(b["x"].addressable_shards) == 8
    assert b["x"].addressable_shards[0].data.shape == (1, 3)


def test_sharded_train_step_accepts_process_local_batch(rng):
    """End-to-end: a training step jitted over the mesh consumes a batch
    assembled through the process-local path."""
    from sam2_video_tpu.models import VideoModelConfig
    from sam2_video_tpu.models import sam2 as sam2_mod
    from sam2_video_tpu.models.sam2 import SAM2Config
    from sam2_video_tpu.training.loop import TrainState, make_train_step
    from sam2_video_tpu.training.losses import CORE_LOSS_KEY, LossConfig
    from sam2_video_tpu.training.optimizer import make_optimizer
    from tests.test_training import make_batch, tiny_cfg

    cfg = tiny_cfg()
    mcfg = VideoModelConfig(sam2=cfg, prompt_type="point")
    mesh = mesh_mod.make_mesh(num_data=8, num_model=1)
    params = sam2_mod.init(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(params, {"lr": 1e-4}, {"enabled": False},
                        total_steps=4,
                        trainable_modules=["memory_attention"])
    state = mesh_mod.replicate(mesh, TrainState.create(params, tx))
    batch = mesh_mod.shard_batch(mesh, make_batch(rng, cfg, B=8),
                                 process_local=True)
    step = make_train_step(mcfg, LossConfig(), tx, mesh=mesh,
                           trainable_modules=["memory_attention"])
    _, metrics = step(state, batch)
    assert np.isfinite(float(metrics[CORE_LOSS_KEY]))


def test_maybe_initialize_distributed_disabled_is_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert mesh_mod.maybe_initialize_distributed({}) is False
    assert mesh_mod.maybe_initialize_distributed(None) is False
    assert mesh_mod.maybe_initialize_distributed(
        {"enabled": False, "coordinator_address": "1.2.3.4:99"}) is False


def test_maybe_initialize_distributed_requires_proc_info(monkeypatch):
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("JAX_PROCESS_ID", raising=False)
    monkeypatch.setattr(mesh_mod, "_dist_initialized", False)
    with pytest.raises(ValueError, match="num_processes"):
        mesh_mod.maybe_initialize_distributed(
            {"enabled": True, "coordinator_address": "localhost:1234"})


def test_maybe_initialize_distributed_passes_explicit_args(monkeypatch):
    seen = {}
    monkeypatch.setattr(mesh_mod, "_dist_initialized", False)
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda **kw: seen.update(kw))
    out = mesh_mod.maybe_initialize_distributed(
        {"enabled": True, "coordinator_address": "h:1", "num_processes": 4,
         "process_id": 2})
    assert out is True
    assert seen == {"coordinator_address": "h:1", "num_processes": 4,
                    "process_id": 2}
    mesh_mod._dist_initialized = False  # leave module state clean


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_run_matches_single_process(tmp_path):
    """REAL multi-process execution: 2 subprocesses x 4 forced CPU devices,
    ``jax.distributed.initialize`` via a local coordinator, per-process
    ``ClipLoader`` shards assembled with
    ``jax.make_array_from_process_local_data``, 3 optimizer steps — the
    loss trajectory must match the single-process 8-device run on the same
    global batches to f32 tolerance (only the collective implementation —
    cross-process gloo vs in-process — differs)."""
    from tests import _mp_common as C

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    outs, procs = [], []
    for pid in range(2):
        out = tmp_path / f"worker{pid}.json"
        env = dict(
            os.environ,
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "tests._mp_worker", str(out)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
        outs.append(out)
    logs = []
    try:
        for p in procs:
            logs.append(p.communicate(timeout=1200)[0])
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out:\n" + "\n".join(logs))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log}"

    results = [json.loads(o.read_text()) for o in outs]
    by_pid = {r["process_index"]: r["losses"] for r in results}
    assert set(by_pid) == {0, 1}
    # the replicated loss scalar must agree across processes
    np.testing.assert_allclose(by_pid[0], by_pid[1], rtol=0, atol=0)

    # single-process reference on this pytest process's 8 CPU devices,
    # fed the SAME global batches (proc0 shard rows first — the order
    # make_array_from_process_local_data assembles, since jax.devices()
    # lists proc0's devices before proc1's)
    from sam2_video_tpu.parallel import mesh as mesh_mod
    l0, l1 = C.make_loader(0, 2), C.make_loader(1, 2)
    ref_batches = [
        jax.tree.map(lambda a, b: np.concatenate([np.asarray(a),
                                                  np.asarray(b)]), b0, b1)
        for _, b0, b1 in zip(range(C.STEPS), iter(l0), iter(l1))]
    assert len(ref_batches) == C.STEPS
    mesh = mesh_mod.make_mesh(num_data=8, num_model=1)
    ref_losses = C.run_steps(mesh, ref_batches, process_local=False)
    np.testing.assert_allclose(by_pid[0], ref_losses, rtol=2e-5)
