"""Prompt-noise ablations: perturb mask/bbox prompts before inference.

Parity spec: /root/reference/sam2_video/eval/PromptObjNoiseAdder.py (:8-109).
The reference uses albumentations' ShiftScaleRotate; this re-implements the
same perturbations (uniform shift/scale, rotation for masks, random
dilate/erode) with cv2 affine warps directly — no albumentations dependency.
"""

from __future__ import annotations

import random

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

from .utils import PromptObj


class PromptObjNoiseAdder:
    def __init__(self, bbox_noise_type: str = "shift_scale",
                 noise_intensity: float = 0.1, seed: int | None = None):
        if bbox_noise_type not in ("shift", "scale", "shift_scale"):
            raise ValueError(
                "Invalid bbox_noise_type. Choose from 'shift', 'scale', or "
                "'shift_scale'.")
        self.bbox_noise_type = bbox_noise_type
        self.noise_intensity = noise_intensity
        self.rng = random.Random(seed)

    # -- mask ---------------------------------------------------------------

    def _shift_scale_rotate_mask(self, mask: np.ndarray) -> np.ndarray:
        h, w = mask.shape
        ni = self.noise_intensity
        dx = self.rng.uniform(-ni, ni) * w
        dy = self.rng.uniform(-ni, ni) * h
        scale = 1.0 + self.rng.uniform(-ni, ni)
        angle = self.rng.uniform(-45 * ni, 45 * ni)
        m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, scale)
        m[:, 2] += (dx, dy)
        return cv2.warpAffine(mask.astype(np.uint8), m, (w, h),
                              flags=cv2.INTER_NEAREST)

    def _dilate_or_erode(self, mask: np.ndarray) -> np.ndarray:
        k = self.rng.randrange(3, 3 + int(21 * self.noise_intensity), 2)
        kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (k, k))
        op = cv2.dilate if self.rng.random() < 0.5 else cv2.erode
        return op(mask.astype(np.uint8), kernel)

    def add_noise_to_mask(self, obj: PromptObj):
        mask = obj.mask.astype(np.uint8)
        if self.rng.random() < 0.5:
            mask = self._shift_scale_rotate_mask(mask)
        if self.rng.random() < 0.5:
            mask = self._dilate_or_erode(mask)
        obj.mask = mask.astype(bool)
        if obj.mask.sum() == 0:
            return None
        return obj

    # -- bbox ---------------------------------------------------------------

    def add_noise_to_bbox(self, obj: PromptObj):
        if self.rng.random() >= 0.5:
            return obj  # p=0.5 identity like the reference transform
        x0, y0, x1, y1 = obj.bbox
        h, w = obj.mask.shape
        ni = self.noise_intensity
        cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
        bw, bh = x1 - x0, y1 - y0
        if self.bbox_noise_type in ("shift", "shift_scale"):
            cx += self.rng.uniform(-ni, ni) * w
            cy += self.rng.uniform(-ni, ni) * h
        if self.bbox_noise_type in ("scale", "shift_scale"):
            s = 1.0 + self.rng.uniform(-ni, ni)
            bw *= s
            bh *= s
        nx0 = max(0.0, cx - bw / 2)
        ny0 = max(0.0, cy - bh / 2)
        nx1 = min(float(w - 1), cx + bw / 2)
        ny1 = min(float(h - 1), cy + bh / 2)
        if nx1 <= nx0 or ny1 <= ny0:
            return None
        obj.bbox = [nx0, ny0, nx1, ny1]
        return obj

    def add_noise_to_obj(self, obj: PromptObj, prompt_type: str):
        if prompt_type == "mask":
            return self.add_noise_to_mask(obj)
        if prompt_type == "bbox":
            return self.add_noise_to_bbox(obj)
        return obj
