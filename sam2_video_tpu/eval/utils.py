"""Eval-side prompt datatypes + mask utilities.

Parity spec: /root/reference/sam2_video/eval/utils.py (ClipRange/PromptObj/
PromptInfo:10-38, mask_to_masks:95-113, mask_to_points:116-153,
mask_to_bbox:156-165)."""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

_GRID = None


@dataclasses.dataclass
class ClipRange:
    start_idx: int
    end_idx: int


@dataclasses.dataclass
class PromptObj:
    mask: np.ndarray
    bbox: list
    points: np.ndarray
    obj_id: int
    pos_or_neg_label: np.ndarray


@dataclasses.dataclass
class PromptInfo:
    prompt_objs: List[PromptObj]
    frame_idx: int
    prompt_type: str
    video_id: str
    path: str
    clip_range: Optional[ClipRange]


def init_grid(image_hw, spacing: int):
    """Optional grid constraint for point sampling (inference.py grid_spaceing)."""
    global _GRID
    h, w = image_hw
    g = np.zeros((h, w), bool)
    g[::spacing, ::spacing] = True
    _GRID = g


def mask_to_masks(mask: np.ndarray, min_area: int = 10) -> list[np.ndarray]:
    """Split a binary mask into connected components after a 10x10 closing;
    drop tiny components (eval/utils.py:95-113)."""
    m = (np.asarray(mask) > 0).astype(np.uint8)
    if _HAS_CV2:
        kernel = np.ones((10, 10), np.uint8)
        closed = cv2.morphologyEx(m, cv2.MORPH_CLOSE, kernel)
        n, labels = cv2.connectedComponents(closed)
        out = []
        for i in range(1, n):
            comp = labels == i
            if comp.sum() >= min_area:
                out.append(comp.astype(np.uint8))
        return out
    from scipy import ndimage
    labels, n = ndimage.label(m)
    return [(labels == i).astype(np.uint8) for i in range(1, n + 1)
            if (labels == i).sum() >= min_area]


def mask_to_points(mask: np.ndarray, num_points: int = 1,
                   include_center: bool = True,
                   rng: np.random.Generator | None = None) -> np.ndarray:
    """Sample (x, y) points inside a mask: optional center-of-mass first,
    then random pixels (optionally constrained to the grid)."""
    rng = rng or np.random.default_rng()
    m = np.asarray(mask) > 0
    if _GRID is not None:
        mg = m & _GRID
        if mg.any():
            m = mg
    ys, xs = np.nonzero(m)
    if xs.size == 0 or num_points <= 0:
        return np.zeros((0, 2), np.float32)
    pts = []
    if include_center:
        pts.append((float(xs.mean()), float(ys.mean())))
    need = num_points - len(pts)
    if need > 0:
        idx = rng.permutation(xs.size)[:need]
        pts.extend(zip(xs[idx].astype(float), ys[idx].astype(float)))
    while len(pts) < num_points:
        pts.append(pts[0])
    return np.asarray(pts, np.float32)


def select_closest_cond_frames(frame_idx: int, cond_frame_outputs: dict,
                               max_cond_frame_num: int):
    """Pick up to ``max_cond_frame_num`` conditioning frames temporally
    closest to ``frame_idx``: nearest before, nearest at/after, then by
    absolute distance (reference modeling/sam2_utils.py:19-61). Returns
    (selected, unselected) dicts."""
    if max_cond_frame_num == -1 or len(cond_frame_outputs) <= max_cond_frame_num:
        return dict(cond_frame_outputs), {}
    assert max_cond_frame_num >= 2, "allow using 2+ conditioning frames"
    selected = {}
    before = max((t for t in cond_frame_outputs if t < frame_idx),
                 default=None)
    if before is not None:
        selected[before] = cond_frame_outputs[before]
    after = min((t for t in cond_frame_outputs if t >= frame_idx),
                default=None)
    if after is not None:
        selected[after] = cond_frame_outputs[after]
    remaining = sorted((t for t in cond_frame_outputs if t not in selected),
                       key=lambda x: abs(x - frame_idx))
    for t in remaining[: max_cond_frame_num - len(selected)]:
        selected[t] = cond_frame_outputs[t]
    unselected = {t: v for t, v in cond_frame_outputs.items()
                  if t not in selected}
    return selected, unselected


def mask_to_bbox(mask: np.ndarray) -> list[float]:
    """[x_min, y_min, x_max, y_max] (the SAM2 box-prompt convention used by
    the reference eval, utils.py:156-165)."""
    ys, xs = np.nonzero(np.asarray(mask) > 0)
    if xs.size == 0:
        return [0.0, 0.0, 0.0, 0.0]
    return [float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())]
