"""Clip-scheduling unit tests against hand-computed expectations — the
variable-cats range-merging state machine is SURVEY.md hard-part #6
(reference inference.py:598-767)."""

import json
from pathlib import Path

import numpy as np
import pytest

from sam2_video_tpu.data import rle
from sam2_video_tpu.eval.inference import InferenceConfig, InferenceRunner
from sam2_video_tpu.eval.utils import ClipRange


def _write_coco(tmp_path, frames):
    """frames: list of per-frame lists of category ids (None = no keyframe)."""
    images, annotations = [], []
    aid = 0
    m = np.zeros((16, 16), np.uint8)
    m[4:12, 4:12] = 1
    seg = rle.encode(m)
    for i, cats in enumerate(frames):
        images.append({"id": i, "file_name": f"f{i}.png", "path": f"f{i}.png",
                       "height": 16, "width": 16, "video_id": "v",
                       "is_det_keyframe": cats is not None,
                       "order_in_video": i})
        for c in (cats or []):
            annotations.append({"id": aid, "image_id": i, "category_id": c,
                                "segmentation": seg, "area": 64,
                                "bbox": [4, 4, 8, 8], "iscrowd": 0})
            aid += 1
    p = tmp_path / "coco.json"
    p.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": c, "name": str(c)} for c in range(3)]}))
    return p


class _StubRunner(InferenceRunner):
    """Scheduling-only runner: skip predictor construction."""

    def __init__(self, coco_path, cfg):
        from sam2_video_tpu.eval.inference import _CocoView
        self.coco = _CocoView(coco_path)
        self.cfg = cfg
        self.obj_count = 0
        self.prompt_info = []
        self.rng = np.random.default_rng(0)
        self.noise = None


def test_clip_length_scheduling_with_gap(tmp_path):
    # 8 frames; frames 2-3 have no annotations -> that window extends the
    # previous clip (inference.py:671-677)
    frames = [[0], [0], None, None, [0, 1], [1], [0], [0]]
    coco = _write_coco(tmp_path, frames)
    r = _StubRunner(coco, InferenceConfig(clip_length=2, num_points=1))
    out = list(r._prompts_by_clip_length(r.coco.frames_of("v"), "points", 2))
    ranges = [(cr.start_idx, cr.end_idx) for _, cr in out]
    # window [0,1] prompts at 0; window [2,3] has no prompt -> extends;
    # window [4,5] prompts at 4; [6,7] prompts at 6
    assert ranges == [(0, 3), (4, 5), (6, 7)]
    prompts = [p[0].frame_idx for p, _ in out]
    assert prompts == [0, 4, 6]


def test_clip_length_none_single_clip(tmp_path):
    frames = [[0], [0], [1], [1]]
    coco = _write_coco(tmp_path, frames)
    r = _StubRunner(coco, InferenceConfig(clip_length=None, num_points=1))
    out = list(r._prompts_by_clip_length(r.coco.frames_of("v"), "points",
                                         None))
    assert len(out) == 1
    (_, cr), = out
    assert (cr.start_idx, cr.end_idx) == (0, 3)


def test_prompts_by_categories_new_category_triggers(tmp_path):
    # category 1 first appears at frame 3, category 2 at frame 5
    frames = [[0], [0], [0], [0, 1], [0, 1], [0, 1, 2], [0, 1, 2], [0]]
    coco = _write_coco(tmp_path, frames)
    r = _StubRunner(coco, InferenceConfig(num_points=1))
    out = r._prompts_by_categories(r.coco.frames_of("v"), "points")
    ranges = [(cr.start_idx, cr.end_idx) for _, cr in out]
    assert ranges == [(0, 2), (3, 4), (5, 7)]
    prompt_frames = [p[0].frame_idx for p, _ in out]
    assert prompt_frames == [0, 3, 5]


def test_merge_prompts_overlap_resolution(tmp_path):
    frames = [[0]] * 10
    coco = _write_coco(tmp_path, frames)
    r = _StubRunner(coco, InferenceConfig(num_points=1))

    def mk(start, end):
        infos, _ = next(iter(r._prompts_by_clip_length(
            r.coco.frames_of("v"), "points", None)))
        for p in infos:
            p.frame_idx = start
        return (infos, ClipRange(start, end))

    by_cats = [mk(0, 9)]
    by_len = [mk(0, 4), mk(5, 9)]
    merged = r._merge_prompts(by_cats, by_len)
    ranges = [(cr.start_idx, cr.end_idx) for _, cr in merged]
    # start-idx-keyed dict: clip-length entries override same-start category
    # entries; overlapping ranges are truncated at the next start
    assert ranges == [(0, 4), (5, 9)]


def test_obj_ids_key_category_via_mod(tmp_path):
    frames = [[0, 2], [0, 2]]
    coco = _write_coco(tmp_path, frames)
    r = _StubRunner(coco, InferenceConfig(num_points=1))
    objs = r._get_each_obj(r.coco.frames_of("v")[0])
    # obj_id % mod recovers the category (inference.py:300)
    mod = r.coco.mod
    assert sorted(o.obj_id % mod for o in objs) == [0, 2]
    assert len({o.obj_id for o in objs}) == len(objs)
