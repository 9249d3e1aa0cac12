"""Per-stage host input-pipeline budget (VERDICT r3 item 4).

Times each host stage of producing one training clip — PNG decode + resize +
crop, RLE decode + mask assembly, connected components + point sampling,
stack/collate — cold and cache-warm, then prints the arithmetic that turns
"ms per clip per stage" into "cores needed to feed N clips/s": a production
TPU-VM host sizing claim computed from measured numbers, not prose.

Run on any host: `python benchmarks/loader_budget.py [--size 384] [--t 10]`.
The per-stage numbers scale ~linearly with worker cores because every stage
is NumPy/PIL work that releases the GIL (pipeline.py uses a thread pool) and
clips are independent.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import time

import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _dataset(S, T, C):
    from sam2_video_tpu.data.synthetic import make_synthetic_dataset
    root = pathlib.Path(__file__).resolve().parent.parent / ".bench_data" / \
        f"loader_s{S}_t{T}_c{C}"
    json_path = root / "annotations.json"
    if not json_path.exists():
        make_synthetic_dataset(root, num_videos=8, frames_per_video=4 * T,
                               image_hw=(S, S + 128), num_categories=C,
                               seed=0)
    return json_path


def _time_stage(fn, n_clips):
    t0 = time.perf_counter()
    for i in range(n_clips):
        fn(i)
    return (time.perf_counter() - t0) / n_clips * 1000.0  # ms/clip


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=384)
    ap.add_argument("--t", type=int, default=10)
    ap.add_argument("--categories", type=int, default=7)
    ap.add_argument("--objects", type=int, default=8)
    ap.add_argument("--clips", type=int, default=8)
    ap.add_argument("--target-clips-per-sec", type=float, default=22.0)
    args = ap.parse_args()
    S, T, C, O = args.size, args.t, args.categories, args.objects

    from sam2_video_tpu.data.coco import COCOIndex
    from sam2_video_tpu.data.pipeline import ClipDataset, ClipDatasetConfig
    from sam2_video_tpu.utils import prompts as prompts_mod

    json_path = _dataset(S, T, C)
    dcfg = ClipDatasetConfig(clip_length=T, stride=T, max_objects=O,
                             prompt_type="point")

    # fresh index per stage so each stage's timing is not contaminated by
    # another stage's cache fills
    def frames_cold(i):
        idx = frames_cold.index
        clip = frames_cold.ds.clips[i % len(frames_cold.ds.clips)]
        for j in clip["image_indices"]:
            idx.load_image(j, normalize=False)
    frames_cold.index = COCOIndex(json_path, S, C)
    frames_cold.ds = ClipDataset(frames_cold.index, dcfg)

    def masks_cold(i):
        idx = masks_cold.index
        clip = masks_cold.ds.clips[i % len(masks_cold.ds.clips)]
        for j in clip["image_indices"]:
            idx.load_masks(idx.images[j]["id"])
    masks_cold.index = COCOIndex(json_path, S, C)
    masks_cold.ds = ClipDataset(masks_cold.index, dcfg)

    # warm caches for the warm stages + prompt/collate timing
    warm_index = COCOIndex(json_path, S, C, frame_cache_mb=512)
    warm_ds = ClipDataset(warm_index, dcfg)
    for i in range(len(warm_ds)):
        warm_ds.get(i, np.random.default_rng(i))

    def frames_warm(i):
        clip = warm_ds.clips[i % len(warm_ds.clips)]
        for j in clip["image_indices"]:
            warm_index.load_image(j, normalize=False)

    def masks_warm(i):
        clip = warm_ds.clips[i % len(warm_ds.clips)]
        for j in clip["image_indices"]:
            warm_index.load_masks(warm_index.images[j]["id"])

    def prompt_stage(i):
        clip = warm_ds.clips[i % len(warm_ds.clips)]
        j0 = clip["image_indices"][0]
        cm = warm_index.load_masks(warm_index.images[j0]["id"])
        obj_masks, _ = prompts_mod.cat_to_obj_masks(cm, O)
        prompts_mod.generate_point_prompt(
            obj_masks, 1, 0, True, np.random.default_rng(i))

    def full_sample_warm(i):
        warm_ds.get(i % len(warm_ds), np.random.default_rng(i))

    n = args.clips
    rows = {
        "png_decode_resize_crop_cold": _time_stage(frames_cold, n),
        "rle_decode_mask_assembly_cold": _time_stage(masks_cold, n),
        "frame_fetch_cache_warm": _time_stage(frames_warm, n),
        "mask_fetch_cache_warm": _time_stage(masks_warm, n),
        "cc_plus_point_sampling": _time_stage(prompt_stage, n),
        "full_sample_cache_warm": _time_stage(full_sample_warm, n),
    }
    cold_total = (rows["png_decode_resize_crop_cold"]
                  + rows["rle_decode_mask_assembly_cold"]
                  + rows["cc_plus_point_sampling"])
    warm_total = rows["full_sample_cache_warm"]
    tgt = args.target_clips_per_sec
    budget = {
        "ms_per_clip": {k: round(v, 2) for k, v in rows.items()},
        "cold_epoch_ms_per_clip": round(cold_total, 2),
        "warm_epoch_ms_per_clip": round(warm_total, 2),
        "clips_per_sec_per_core_cold": round(1000.0 / cold_total, 2),
        "clips_per_sec_per_core_warm": round(1000.0 / warm_total, 2),
        "cores_for_target_cold": round(tgt * cold_total / 1000.0, 2),
        "cores_for_target_warm": round(tgt * warm_total / 1000.0, 2),
        "target_clips_per_sec": tgt,
        "frame_cache_mb_per_1k_frames": round(S * S * 3 / 1024 / 1024 * 1000,
                                              1),
        "note": "per-core figures; stages release the GIL and clips are "
                "independent, so N worker cores scale ~N x (pipeline.py "
                "thread pool). Measured on this host — see DESIGN.md §5 "
                "for the TPU-VM sizing conclusion.",
    }
    print(json.dumps(budget, indent=2))


if __name__ == "__main__":
    main()
