"""Throughput benchmark: EndoVis18-style fine-tuning step (10-frame 384px
clips, SAM2-hiera-tiny, trainable memory modules) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` divides by an *estimated* reference throughput of 2.0
clips/sec for the PyTorch-Lightning stack on one A100 (the reference repo
publishes no throughput numbers — SURVEY.md §6; estimate: its per-frame
Python tracking loop over ~5 objects with per-step host sync
(trainer.py:186-187 forces torch.cuda.synchronize + empty_cache every
forward) is launch-bound at roughly 30-60 ms/frame -> ~0.2-0.5 s per
10-frame clip). The BASELINE.json gate is >=2x A100, i.e. vs_baseline >= 2.
"""

from __future__ import annotations

import json
import time

import numpy as np

A100_BASELINE_CLIPS_PER_SEC = 2.0


def main():
    import pathlib

    import jax
    cache = pathlib.Path(__file__).resolve().parent / ".jax_cache"
    cache.mkdir(exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from sam2_video_tpu.models import VideoModelConfig
    from sam2_video_tpu.models import sam2 as sam2_mod
    from sam2_video_tpu.models.sam2 import SAM2Config
    from sam2_video_tpu.training.loop import TrainState, make_train_step
    from sam2_video_tpu.training.losses import LossConfig
    from sam2_video_tpu.training.optimizer import make_optimizer
    from __graft_entry__ import _example_clip

    # measured optimum on v5e (see docs/DESIGN.md §3): B=1 without
    # rematerialization beats B=4 with scan-body remat (7.6 vs 5.3 clips/s) —
    # the recompute costs more than batching gains; this matches the default
    # training config (batch_size 1, use_activation_checkpoint false).
    B, T, O, C, S = 1, 10, 8, 7, 384
    cfg = SAM2Config(backbone="tiny", image_size=S, compute_dtype="bfloat16",
                     use_activation_checkpoint=False)
    mcfg = VideoModelConfig(sam2=cfg, prompt_type="point")
    params = sam2_mod.init(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(params, {"lr": 1e-4, "type": "AdamW"},
                        {"enabled": False}, total_steps=1000,
                        trainable_modules=["memory_attention",
                                           "memory_encoder"])
    state = TrainState.create(params, tx)
    step = make_train_step(mcfg, LossConfig(), tx,
                           trainable_modules=["memory_attention",
                                              "memory_encoder"])
    batch = _example_clip(S, T=T, O=O, C=C, B=B)

    # warmup / compile (device_get forces execution; on this TPU tunnel
    # backend block_until_ready can return before the device finishes)
    state, metrics = step(state, batch)
    float(jax.device_get(metrics["total_loss"]))

    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, batch)
    float(jax.device_get(metrics["total_loss"]))
    dt = time.perf_counter() - t0

    clips_per_sec = B * n_steps / dt
    print(json.dumps({
        "metric": "clips/sec/chip (10-frame 384px EndoVis18-style "
                  "fine-tune step, SAM2-tiny, B=1, bf16)",
        "value": round(clips_per_sec, 3),
        "unit": "clips/sec/chip",
        "vs_baseline": round(clips_per_sec / A100_BASELINE_CLIPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
