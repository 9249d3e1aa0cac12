"""Worker process for the REAL multi-process training test
(tests/test_multiprocess_real.py). Runs as one of N subprocesses, each with
4 forced CPU devices, joined into one 8-device JAX distributed job via
``mesh.maybe_initialize_distributed`` (env-driven), and trains a tiny model
for a few steps through the per-host ``ClipLoader`` shard +
``shard_batch``'s ``make_array_from_process_local_data`` path.

Usage (spawned by the test — env carries the distributed settings):
    python tests/mp_worker.py <num_steps> <global_batch> <outfile>
Writes {"losses": [...], "process_index": i, ...} to <outfile>.
"""

from __future__ import annotations

import json
import os
import sys


def det_sample(i: int, cfg) -> dict:
    """Deterministic clip #i (ignores the loader's rng on purpose: the
    multi-process loss trajectory must depend only on WHICH clips form the
    global batch, not on which process loads them)."""
    import numpy as np
    r = np.random.default_rng(1000 + i)
    H = cfg.image_size
    T, O, C = 2, 2, 3
    images = r.standard_normal((T, H, H, 3)).astype(np.float32)
    cat_masks = np.zeros((T, C, H, H), bool)
    cat_masks[:, 0, 8:24, 8:24] = True
    cat_masks[:, 1, 36:56, 36:56] = True
    obj_masks = np.zeros((O, H, H), np.float32)
    obj_masks[0, 8:24, 8:24] = 1.0
    obj_masks[1, 36:56, 36:56] = 1.0
    obj_to_cat = np.array([0, 1], np.int32)
    coords = np.array([[[16, 16]], [[45, 45]]], np.float32)
    labels = np.ones((O, 1), np.int32)
    return dict(images=images, cat_masks=cat_masks, obj_masks=obj_masks,
                obj_to_cat=obj_to_cat, point_coords=coords,
                point_labels=labels)


class DetDataset:
    def __init__(self, n, cfg):
        self.n = n
        self.cfg = cfg

    def __len__(self):
        return self.n

    def get(self, i, rng):
        return det_sample(i, self.cfg)


def run_worker(num_steps: int, global_batch: int, outfile: str):
    import jax
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from sam2_video_tpu.parallel import mesh as mesh_mod

    # the real gate, driven by JAX_COORDINATOR_ADDRESS/_NUM_PROCESSES/_ID
    assert mesh_mod.maybe_initialize_distributed(None) is True
    nproc = jax.process_count()
    pid = jax.process_index()
    assert nproc == int(os.environ["JAX_NUM_PROCESSES"])

    from sam2_video_tpu.data.pipeline import ClipLoader
    from sam2_video_tpu.models import VideoModelConfig
    from sam2_video_tpu.models import sam2 as sam2_mod
    from sam2_video_tpu.models.sam2 import SAM2Config
    from sam2_video_tpu.training.loop import TrainState, make_train_step
    from sam2_video_tpu.training.losses import CORE_LOSS_KEY, LossConfig
    from sam2_video_tpu.training.optimizer import make_optimizer

    cfg = SAM2Config(image_size=64, compute_dtype="float32",
                     use_activation_checkpoint=False)
    mcfg = VideoModelConfig(sam2=cfg, prompt_type="point")
    mesh = mesh_mod.make_mesh(num_model=1)
    assert mesh.devices.size == len(jax.devices())

    params = sam2_mod.init(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(params, {"lr": 1e-3}, {"enabled": False},
                        total_steps=num_steps,
                        trainable_modules=["memory_attention"])
    state = mesh_mod.replicate(mesh, TrainState.create(params, tx))
    step = make_train_step(mcfg, LossConfig(), tx, mesh=mesh,
                           trainable_modules=["memory_attention"])

    ds = DetDataset(2 * global_batch * num_steps, cfg)
    loader = ClipLoader(ds, batch_size=global_batch // nproc, shuffle=True,
                        seed=7, num_workers=1, process_index=pid,
                        process_count=nproc)
    losses = []
    shards_seen = None
    for bi, batch in enumerate(loader):
        if bi >= num_steps:
            break
        gb = mesh_mod.shard_batch(mesh, batch)
        if shards_seen is None:
            # the local host only holds ITS shard of the global batch
            shards_seen = len(gb.images.addressable_shards)
            assert gb.images.shape[0] == global_batch
        state, metrics = step(state, gb)
        losses.append(float(jax.device_get(metrics[CORE_LOSS_KEY])))

    with open(outfile, "w") as f:
        json.dump({"losses": losses, "process_index": pid,
                   "num_processes": nproc,
                   "local_devices": len(jax.local_devices()),
                   "addressable_shards": shards_seen}, f)


if __name__ == "__main__":
    run_worker(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
