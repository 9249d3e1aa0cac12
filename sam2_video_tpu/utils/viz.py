"""Training/eval visualization: 2x2 composite frames (image / GT / prompts /
prediction) rendered into a GIF for logging.

Parity spec: /root/reference/sam2_video/utils/viz.py (:14-328). Uses raw
NumPy compositing + imageio (no matplotlib figure round-trip — faster and
headless-safe)."""

from __future__ import annotations

import numpy as np

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)

# distinct colors per category (RGB, uint8)
_PALETTE = np.asarray([
    [230, 25, 75], [60, 180, 75], [255, 225, 25], [0, 130, 200],
    [245, 130, 48], [145, 30, 180], [70, 240, 240], [240, 50, 230],
    [210, 245, 60], [250, 190, 212], [0, 128, 128], [220, 190, 255],
    [170, 110, 40], [255, 250, 200], [128, 0, 0], [170, 255, 195],
], np.uint8)


def denormalize_image(img: np.ndarray) -> np.ndarray:
    """[H, W, 3] normalized f32 -> uint8 RGB."""
    x = img * IMAGENET_STD + IMAGENET_MEAN
    return (np.clip(x, 0, 1) * 255).astype(np.uint8)


def overlay_masks(img: np.ndarray, masks: np.ndarray,
                  alpha: float = 0.55) -> np.ndarray:
    """img uint8 [H, W, 3]; masks bool [C, H, W] -> blended overlay."""
    out = img.astype(np.float32)
    for c in range(masks.shape[0]):
        m = masks[c] > 0
        if not m.any():
            continue
        color = _PALETTE[c % len(_PALETTE)].astype(np.float32)
        out[m] = (1 - alpha) * out[m] + alpha * color
    return out.astype(np.uint8)


def draw_points(img: np.ndarray, coords: np.ndarray, labels: np.ndarray,
                radius: int = 3) -> np.ndarray:
    """coords [N, 2] (x, y); labels 1 pos (green) / 0 neg (red) / 2,3 box
    corners (blue)."""
    out = img.copy()
    h, w = img.shape[:2]
    colors = {1: (0, 255, 0), 0: (255, 0, 0), 2: (0, 120, 255),
              3: (0, 120, 255)}
    for (x, y), l in zip(np.asarray(coords).reshape(-1, 2),
                         np.asarray(labels).reshape(-1)):
        if l < 0:
            continue
        xi, yi = int(round(x)), int(round(y))
        y0, y1 = max(0, yi - radius), min(h, yi + radius + 1)
        x0, x1 = max(0, xi - radius), min(w, xi + radius + 1)
        out[y0:y1, x0:x1] = colors.get(int(l), (255, 255, 255))
    return out


def composite_frame(image, gt_masks, pred_masks, point_coords=None,
                    point_labels=None) -> np.ndarray:
    """2x2 grid: [image | GT] / [prompts | prediction]; all [H, W, ...]."""
    base = denormalize_image(image)
    gt = overlay_masks(base, gt_masks)
    pred = overlay_masks(base, pred_masks)
    prompts = base
    if point_coords is not None:
        prompts = draw_points(base, point_coords, point_labels)
    top = np.concatenate([base, gt], axis=1)
    bottom = np.concatenate([prompts, pred], axis=1)
    return np.concatenate([top, bottom], axis=0)


def create_visualization_gif(frames, gt_masks, pred_logits, point_coords=None,
                             point_labels=None, max_length: int = 4,
                             stride: int = 1, path=None, fps: int = 2):
    """frames [T, H, W, 3] normalized; gt_masks [T, C, H, W] bool;
    pred_logits [T, C, 1, H, W] or [T, C, H, W]. Returns [T', H', W', 3]
    uint8 array; writes a GIF when ``path`` is given."""
    frames = np.asarray(frames)
    gt_masks = np.asarray(gt_masks)
    pred_logits = np.asarray(pred_logits)
    if pred_logits.ndim == 5:
        pred_logits = pred_logits[:, :, 0]
    idxs = list(range(0, frames.shape[0], stride))[:max_length]
    comps = []
    for i, t in enumerate(idxs):
        pc = point_coords if t == 0 else None
        pl = point_labels if t == 0 else None
        comps.append(composite_frame(frames[t], gt_masks[t],
                                     pred_logits[t] > 0, pc, pl))
    out = np.stack(comps)
    if path is not None:
        import imageio
        imageio.mimsave(path, list(out), format="GIF",
                        duration=int(1000 / max(fps, 1)))
    return out
