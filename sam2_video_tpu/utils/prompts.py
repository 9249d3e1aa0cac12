"""Host-side prompt generation (runs in the data pipeline, per clip, on CPU —
keeping all data-dependent logic out of the jitted graph; cf. SURVEY.md §7
"hard parts" #7).

Parity specs:
- ``find_connected_components`` / ``cat_to_obj_masks``:
  /root/reference/sam2_video/utils/masks.py:13-50 (5x5 ellipse open, cv2
  connected components, fail-fast on empty).
- ``generate_point_prompt`` / ``generate_box_prompt``:
  /root/reference/sam2_video/utils/prompts.py:13-97 (center-of-mass + random
  positive/negative pixels; box corners labeled 2/3).

All outputs are padded to static shapes: objects to ``max_objects`` (largest
components kept), points to ``num_pos + num_neg`` with label -1 padding.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def find_connected_components(mask: np.ndarray) -> list[np.ndarray]:
    """Binary [H, W] -> list of component masks (after 5x5 ellipse open)."""
    m = (mask > 0).astype(np.uint8)
    if _HAS_CV2:
        kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
        opened = cv2.dilate(cv2.erode(m, kernel, iterations=1), kernel,
                            iterations=1)
        n, labels = cv2.connectedComponents(opened)
        return [(labels == i).astype(np.float32) for i in range(1, n)]
    # pure-NumPy fallback: no morphology, 4-connected flood labeling
    from scipy import ndimage
    labels, n = ndimage.label(m)
    return [(labels == i).astype(np.float32) for i in range(1, n + 1)]


def cat_to_obj_masks(cat_masks: np.ndarray, max_objects: int):
    """[C, H, W] category masks -> ([O, H, W] f32 object masks, [O] int32
    obj_to_cat with -1 padding). Components beyond ``max_objects`` are dropped
    largest-area-first (the reference has no cap; too-small static budgets
    should be raised via config)."""
    C, H, W = cat_masks.shape
    objs: list[tuple[float, np.ndarray, int]] = []
    for c in range(C):
        m = (cat_masks[c] > 0).astype(np.float32)
        if m.sum() == 0:
            continue
        for comp in find_connected_components(m):
            objs.append((float(comp.sum()), comp, c))
    if not objs:
        raise ValueError("cat_to_obj_masks: no objects found (fail-fast, "
                         "masks.py:46-49)")
    # preserve reference ordering (category-major) but drop smallest if over
    if len(objs) > max_objects:
        keep = sorted(range(len(objs)), key=lambda i: -objs[i][0])[:max_objects]
        objs = [objs[i] for i in sorted(keep)]
    obj_masks = np.zeros((max_objects, H, W), np.float32)
    obj_to_cat = -np.ones((max_objects,), np.int32)
    for i, (_, m, c) in enumerate(objs):
        obj_masks[i] = m
        obj_to_cat[i] = c
    return obj_masks, obj_to_cat


def center_of_mass(mask: np.ndarray) -> tuple[float, float]:
    ys, xs = np.nonzero(mask)
    return float(ys.mean()), float(xs.mean())


def generate_point_prompt(obj_masks: np.ndarray, num_pos: int, num_neg: int,
                          include_center: bool, rng: np.random.Generator):
    """obj_masks [O, H, W] -> coords [O, P, 2] (x, y) f32, labels [O, P] i32.
    P = num_pos + num_neg. Invalid (all-zero) objects get label -1 padding."""
    O, H, W = obj_masks.shape
    P = num_pos + num_neg
    coords = np.zeros((O, P, 2), np.float32)
    labels = -np.ones((O, P), np.int32)
    for o in range(O):
        m = obj_masks[o] > 0
        pos_ys, pos_xs = np.nonzero(m)
        if pos_ys.size == 0:
            continue  # padded object
        pts = []
        if include_center and num_pos > 0:
            cy, cx = center_of_mass(m)
            pts.append((cx, cy))
        need = num_pos - len(pts)
        if need > 0:
            idx = rng.permutation(pos_ys.size)[:need]
            pts.extend(zip(pos_xs[idx].astype(float),
                           pos_ys[idx].astype(float)))
        # if fewer positives available than requested, repeat the first
        while len(pts) < num_pos:
            pts.append(pts[0])
        for i, (x, y) in enumerate(pts):
            coords[o, i] = (x, y)
            labels[o, i] = 1
        if num_neg > 0:
            neg_ys, neg_xs = np.nonzero(~m)
            if neg_ys.size > 0:
                idx = rng.permutation(neg_ys.size)[:num_neg]
                for j, k in enumerate(idx):
                    coords[o, num_pos + j] = (float(neg_xs[k]),
                                              float(neg_ys[k]))
                    labels[o, num_pos + j] = 0
    return coords, labels


def generate_box_prompt(obj_masks: np.ndarray):
    """obj_masks [O, H, W] -> corner coords [O, 2, 2], labels [O, 2] (2, 3)."""
    O = obj_masks.shape[0]
    coords = np.zeros((O, 2, 2), np.float32)
    labels = -np.ones((O, 2), np.int32)
    for o in range(O):
        ys, xs = np.nonzero(obj_masks[o] > 0)
        if xs.size == 0:
            continue
        coords[o, 0] = (float(xs.min()), float(ys.min()))
        coords[o, 1] = (float(xs.max()), float(ys.max()))
        labels[o] = (2, 3)
    return coords, labels
