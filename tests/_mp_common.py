"""Shared model/data construction for the REAL multi-process test.

Both the 2-subprocess workers (``tests/_mp_worker.py``) and the in-process
single-process reference run (``tests/test_multiprocess.py``) build their
model, optimizer and data through these helpers, so any loss divergence
between the runs isolates the distributed runtime (gloo CPU collectives +
``make_array_from_process_local_data``), not construction drift.

The fake dataset is deterministic PER CLIP INDEX and ignores the sampler RNG
``ClipLoader`` passes in (that RNG is seeded by ``(seed, epoch,
process_index, batch, slot)`` — layout-dependent by design for real point
sampling, which would break the exact cross-layout comparison)."""

from __future__ import annotations

import numpy as np

SEED = 7
N_CLIPS = 24
LOCAL_BATCH = 4  # x2 processes -> global batch 8, one clip per CPU device
STEPS = 3
TRAINABLE = ["memory_attention"]


class DeterministicClipDataset:
    """Index-deterministic synthetic clips shaped like ``ClipDataset.get``."""

    def __init__(self, n=N_CLIPS, T=2, O=2, C=3, H=64):
        self.n, self.T, self.O, self.C, self.H = n, T, O, C, H

    def __len__(self):
        return self.n

    def get(self, i: int, rng) -> dict:  # rng intentionally unused
        T, O, C, H = self.T, self.O, self.C, self.H
        g = np.random.default_rng(1000 + i)
        images = g.standard_normal((T, H, H, 3)).astype(np.float32)
        cat_masks = np.zeros((T, C, H, H), bool)
        cat_masks[:, 0, 8:24, 8:24] = True
        cat_masks[:, 1, 36:56, 36:56] = True
        obj_masks = np.zeros((O, H, H), np.float32)
        obj_masks[0, 8:24, 8:24] = 1.0
        obj_masks[1, 36:56, 36:56] = 1.0
        obj_to_cat = np.array([0, 1], np.int32)
        coords = np.array([[[16.0, 16.0]], [[45.0, 45.0]]], np.float32)
        labels = np.ones((O, 1), np.int32)
        return {
            "images": images, "cat_masks": cat_masks,
            "obj_masks": obj_masks, "obj_to_cat": obj_to_cat,
            "point_coords": coords, "point_labels": labels,
        }


def make_loader(process_index: int, process_count: int):
    from sam2_video_tpu.data.pipeline import ClipLoader
    return ClipLoader(DeterministicClipDataset(), batch_size=LOCAL_BATCH,
                      shuffle=True, seed=SEED, num_workers=1,
                      process_index=process_index,
                      process_count=process_count)


def build_model_and_step(mesh):
    import jax

    from sam2_video_tpu.models import VideoModelConfig
    from sam2_video_tpu.models import sam2 as sam2_mod
    from sam2_video_tpu.models.sam2 import SAM2Config
    from sam2_video_tpu.parallel import mesh as mesh_mod
    from sam2_video_tpu.training.loop import TrainState, make_train_step
    from sam2_video_tpu.training.losses import LossConfig
    from sam2_video_tpu.training.optimizer import make_optimizer

    cfg = SAM2Config(image_size=64, compute_dtype="float32",
                     use_activation_checkpoint=False)
    mcfg = VideoModelConfig(sam2=cfg, prompt_type="point")
    params = sam2_mod.init(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(params, {"lr": 1e-3, "type": "AdamW"},
                        {"enabled": False}, total_steps=STEPS,
                        trainable_modules=TRAINABLE)
    state = mesh_mod.replicate(mesh, TrainState.create(params, tx))
    step = make_train_step(mcfg, LossConfig(), tx, mesh=mesh,
                           trainable_modules=TRAINABLE)
    return state, step


def run_steps(mesh, loader_batches, process_local: bool):
    """Run STEPS training steps over pre-iterated batches; return losses."""
    from sam2_video_tpu.parallel import mesh as mesh_mod
    from sam2_video_tpu.training.losses import CORE_LOSS_KEY

    state, step = build_model_and_step(mesh)
    losses = []
    for batch in loader_batches:
        sharded = mesh_mod.shard_batch(mesh, batch,
                                       process_local=process_local)
        state, metrics = step(state, sharded)
        losses.append(float(metrics[CORE_LOSS_KEY]))
    return losses
