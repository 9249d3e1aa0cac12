"""Grouped (lockstep-batched) InferenceRunner path: batch_videos>1 groups
same-shape clips across videos, runs them through BatchedVideoPredictor, and
falls back to the sequential predictor for clips that don't fill a group.
Numerical equivalence batched==sequential is pinned in
tests/test_batched_predictor.py; this covers the runner plumbing."""

import json
from pathlib import Path

import numpy as np
import pytest

import jax

from sam2_video_tpu.data.synthetic import make_synthetic_dataset
from sam2_video_tpu.eval.inference import (InferenceConfig, InferenceRunner,
                                           inference)
from sam2_video_tpu.models import sam2 as sam2_mod
from sam2_video_tpu.models.sam2 import SAM2Config


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("batchsynth")
    json_path = make_synthetic_dataset(root, num_videos=2,
                                       frames_per_video=6,
                                       image_hw=(96, 128), num_categories=2)
    cfg = SAM2Config(image_size=128, compute_dtype="float32",
                     use_activation_checkpoint=False)
    params = sam2_mod.init(jax.random.PRNGKey(0), cfg)
    return json_path, cfg, params


def test_grouping_keys(setup, tmp_path):
    json_path, cfg, params = setup
    runner = InferenceRunner(
        params, cfg, InferenceConfig(prompt_type="points", clip_length=3,
                                     max_objects=4, batch_videos=2),
        json_path, tmp_path / "eval")
    jobs = runner._collect_clip_jobs()
    # 2 videos x 6 frames / clip_length 3 -> 4 clips; prompts were recorded
    # during collection in video order
    assert len(jobs) == 4
    assert len(runner.prompt_info) == 4
    keys = [runner._job_group_key(j) for j in jobs]
    assert all(k is not None for k in keys)
    # same length/resolution/prompt offset -> same-shape clips group across
    # the two videos
    assert len(set(keys)) <= 2
    for k in keys:
        assert k[0] == 3 and (k[2], k[3]) == (96, 128)


def test_batched_inference_end_to_end(setup, tmp_path):
    json_path, cfg, params = setup
    run_dir = tmp_path / "run_batched"
    predict_path, prompt_path = inference(
        params, cfg, json_path, run_dir, prompt_type="points",
        clip_length=3, num_points=1, max_objects=4, batch_videos=2,
        probs_out_dir="probs")
    preds = json.loads(Path(predict_path).read_text())
    assert isinstance(preds, list)
    assert Path(prompt_path).exists()
    from sam2_video_tpu.data import rle
    covered = set()
    for ann in preds:
        m = rle.decode(ann["segmentation"])
        assert m.shape == (96, 128)
        covered.add(ann["image_id"])
    # both videos produced predictions through the grouped path
    gt = json.loads(Path(json_path).read_text())
    vids = {im["video_id"] for im in gt["images"] if im["id"] in covered}
    assert len(vids) == 2
    # probability dumps flow through the grouped path too (orig-res f16)
    npzs = list((run_dir / "eval" / "probs").glob("*.npz"))
    assert npzs
    data = np.load(npzs[0])
    assert data["probs"].dtype == np.float16
    assert data["probs"].shape[-2:] == (96, 128)


def test_odd_group_falls_back_sequential(setup, tmp_path):
    """batch_videos=3 with only pairs of same-shape clips: nothing fills a
    group of 3, everything runs sequentially — output still complete."""
    json_path, cfg, params = setup
    run_dir = tmp_path / "run_fallback"
    predict_path, _ = inference(
        params, cfg, json_path, run_dir, prompt_type="points",
        clip_length=3, num_points=1, max_objects=4, batch_videos=3)
    preds = json.loads(Path(predict_path).read_text())
    assert isinstance(preds, list) and preds
