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


def sample_box_points(obj_masks: np.ndarray, rng: np.random.Generator,
                      noise: float = 0.1, noise_bound: int = 20):
    """Noised box-corner prompts (interactive-training sampler parity,
    reference modeling/sam2_utils.py:156-198). obj_masks [O, H, W] ->
    (coords [O, 2, 2], labels [O, 2] with 2/3)."""
    O, H, W = obj_masks.shape
    coords = np.zeros((O, 2, 2), np.float32)
    labels = -np.ones((O, 2), np.int32)
    for o in range(O):
        ys, xs = np.nonzero(obj_masks[o] > 0)
        if xs.size == 0:
            continue
        box = np.asarray([xs.min(), ys.min(), xs.max(), ys.max()], np.float32)
        if noise > 0:
            bw, bh = box[2] - box[0], box[3] - box[1]
            max_dx = min(bw * noise, noise_bound)
            max_dy = min(bh * noise, noise_bound)
            jitter = (2 * rng.random(4) - 1) * np.asarray(
                [max_dx, max_dy, max_dx, max_dy])
            box = np.clip(box + jitter, 0,
                          np.asarray([W - 1, H - 1, W - 1, H - 1]))
        coords[o] = box.reshape(2, 2)
        labels[o] = (2, 3)
    return coords, labels


def sample_random_points_from_errors(gt_masks, pred_masks,
                                     rng: np.random.Generator, num_pt=1):
    """Correction clicks from FP/FN error regions (sam2_utils.py:201-249).
    gt/pred: [O, H, W] bool -> (points [O, num_pt, 2], labels [O, num_pt])."""
    gt = np.asarray(gt_masks) > 0
    pred = (np.zeros_like(gt) if pred_masks is None
            else np.asarray(pred_masks) > 0)
    O, H, W = gt.shape
    fp = ~gt & pred
    fn = gt & ~pred
    all_correct = (gt == pred).reshape(O, -1).all(axis=1)
    points = np.zeros((O, num_pt, 2), np.float32)
    labels = np.zeros((O, num_pt), np.int32)
    for o in range(O):
        noise = rng.random((num_pt, H, W, 2))
        neg_region = fp[o] | (all_correct[o] & ~gt[o])
        noise[..., 0] *= neg_region
        noise[..., 1] *= fn[o]
        flat = noise.reshape(num_pt, -1)
        idx = flat.argmax(axis=1)
        labels[o] = (idx % 2).astype(np.int32)
        pix = idx // 2
        points[o, :, 0] = pix % W
        points[o, :, 1] = pix // W
    return points, labels


def sample_one_point_from_error_center(gt_masks, pred_masks, padding=True):
    """RITM-style click at the interior point of the largest error region
    (sam2_utils.py:252-311). Returns (points [O, 1, 2], labels [O, 1])."""
    import cv2
    gt = np.asarray(gt_masks) > 0
    pred = (np.zeros_like(gt) if pred_masks is None
            else np.asarray(pred_masks) > 0)
    O, H, W = gt.shape
    points = np.zeros((O, 1, 2), np.float32)
    labels = np.ones((O, 1), np.int32)
    for o in range(O):
        fn = (gt[o] & ~pred[o]).astype(np.uint8)
        fp = (~gt[o] & pred[o]).astype(np.uint8)
        if padding:
            fn = np.pad(fn, 1)
            fp = np.pad(fp, 1)
        fn_dt = cv2.distanceTransform(fn, cv2.DIST_L2, 0)
        fp_dt = cv2.distanceTransform(fp, cv2.DIST_L2, 0)
        if padding:
            fn_dt = fn_dt[1:-1, 1:-1]
            fp_dt = fp_dt[1:-1, 1:-1]
        fn_flat, fp_flat = fn_dt.reshape(-1), fp_dt.reshape(-1)
        fn_arg, fp_arg = fn_flat.argmax(), fp_flat.argmax()
        is_pos = fn_flat[fn_arg] > fp_flat[fp_arg]
        idx = fn_arg if is_pos else fp_arg
        points[o, 0] = (idx % W, idx // W)
        labels[o, 0] = int(is_pos)
    return points, labels


def get_next_point(gt_masks, pred_masks, method: str,
                   rng: np.random.Generator | None = None):
    """Iterative-correction click dispatcher (sam2_utils.py:314-323)."""
    if method == "uniform":
        return sample_random_points_from_errors(
            gt_masks, pred_masks, rng or np.random.default_rng())
    if method == "center":
        return sample_one_point_from_error_center(gt_masks, pred_masks)
    raise ValueError(f"unknown sampling method {method}")


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
