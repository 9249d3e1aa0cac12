"""COCO-style video dataset indexing + per-frame loading.

Parity spec: /root/reference/sam2_video/data/dataset.py —
``COCOIndex`` == COCOImageDataset init (:31-115): keyframe filter,
category-id -> contiguous-idx map (fail-fast on empty categories), video
grouping sorted by order_in_video; ``clip_windows`` == VideoDataset
(:249-272): fixed-length windows with stride.

Frame loading (:117-216): PIL open -> Resize(smaller edge) -> CenterCrop ->
ImageNet normalize; RLE decode -> NEAREST resize -> center crop -> per-
category bool OR-merge, with an in-memory mask cache; empty-mask frames are
substituted by the next image (dataset.py:207-211).
"""

from __future__ import annotations

import collections
import json
import threading
from pathlib import Path
from typing import Any

import numpy as np
from PIL import Image

from . import rle as rle_mod

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def resize_smaller_edge(w: int, h: int, size: int) -> tuple[int, int]:
    """torchvision Resize(int) semantics: smaller edge -> size."""
    if h <= w:
        return int(round(w * size / h)), size
    return size, int(round(h * size / w))


def center_crop_box(w: int, h: int, size: int) -> tuple[int, int]:
    """(left, top) of the centered size x size crop."""
    return (w - size) // 2, (h - size) // 2


class COCOIndex:
    """Parsed COCO JSON with video/clip structure."""

    def __init__(self, json_path: str | Path, image_size: int,
                 num_categories: int | None = None,
                 filter_keyframes: bool = True,
                 frame_cache_mb: float = 0.0):
        self.json_path = Path(json_path)
        if not self.json_path.exists():
            raise FileNotFoundError(f"COCO JSON not found: {self.json_path}")
        data = json.loads(self.json_path.read_text())
        self.image_size = image_size

        self.images: list[dict] = data.get("images", [])
        if filter_keyframes:
            self.images = [im for im in self.images
                           if im.get("is_det_keyframe", True)]
        self.annotations: list[dict] = data.get("annotations", [])
        self.categories: list[dict] = data.get("categories", [])
        if not self.categories:
            raise ValueError("COCO JSON must include a non-empty 'categories' "
                             "list (fail-fast, dataset.py:63-66)")
        sorted_cats = sorted(self.categories, key=lambda c: c.get("id", 0))
        self.catid_to_idx = {c["id"]: i for i, c in enumerate(sorted_cats)}
        self.num_categories = (num_categories if num_categories is not None
                               else len(sorted_cats))

        self.image_id_to_annotations: dict[Any, list[dict]] = {}
        for ann in self.annotations:
            self.image_id_to_annotations.setdefault(
                ann["image_id"], []).append(ann)

        self.video_to_images: dict[Any, list[dict]] = {}
        for im in self.images:
            self.video_to_images.setdefault(im.get("video_id", 0), []).append(im)
        for vid in self.video_to_images:
            self.video_to_images[vid].sort(
                key=lambda x: x.get("order_in_video", 0))

        self.image_id_to_idx = {im["id"]: i for i, im in enumerate(self.images)}
        self._mask_cache: dict[Any, np.ndarray] = {}
        # Decoded-frame LRU cache (post-resize/crop uint8, so one entry is
        # exactly S*S*3 bytes regardless of source resolution). The reference
        # caches only masks (dataset.py:133-180) because its GPU step is slow
        # enough to hide PNG decode; at TPU step rates the decode IS the
        # bottleneck on small hosts, so epoch>=2 must skip it. Thread-safe:
        # ClipLoader prefetches from a thread pool.
        self._frame_cache_budget = int(frame_cache_mb * 1024 * 1024)
        self._frame_cache: collections.OrderedDict[tuple, np.ndarray] = \
            collections.OrderedDict()
        self._frame_cache_lock = threading.Lock()

    # -- frame loading ------------------------------------------------------

    def load_image(self, idx: int, image_root: str | None = None,
                   normalize: bool = True) -> np.ndarray:
        """-> [S, S, 3] f32 ImageNet-normalized, or raw uint8 when
        ``normalize=False`` (the device normalizes in that contract —
        4x less host->device traffic; sam2.forward_image)."""
        raw = self._decoded_frame(idx, image_root)
        if not normalize:
            return raw
        arr = raw.astype(np.float32) / 255.0
        return (arr - IMAGENET_MEAN) / IMAGENET_STD

    def _decoded_frame(self, idx: int, image_root: str | None) -> np.ndarray:
        """[S, S, 3] uint8 post-resize/crop frame, LRU-cached up to the
        ``frame_cache_mb`` budget. Normalization always starts from this
        uint8 array, so cached and uncached reads are bit-identical. Cached
        arrays are returned read-only (a consumer mutating a cache hit
        in place would otherwise silently corrupt every later epoch); the
        cache key includes ``image_root`` so one index used with two roots
        never serves frames decoded from the other."""
        key = (idx, image_root)
        if self._frame_cache_budget:
            with self._frame_cache_lock:
                hit = self._frame_cache.get(key)
                if hit is not None:
                    self._frame_cache.move_to_end(key)
                    return hit
        info = self.images[idx]
        path = info.get("path") or info["file_name"]
        if image_root is not None:
            cand = Path(image_root) / info.get("file_name", Path(path).name)
            if cand.exists():
                path = str(cand)
        img = Image.open(path).convert("RGB")
        s = self.image_size
        nw, nh = resize_smaller_edge(img.width, img.height, s)
        img = img.resize((nw, nh), Image.BILINEAR)
        left, top = center_crop_box(nw, nh, s)
        img = img.crop((left, top, left + s, top + s))
        raw = np.asarray(img, np.uint8)
        if self._frame_cache_budget:
            raw.setflags(write=False)  # np.stack/astype still work
            entry = raw.nbytes
            with self._frame_cache_lock:
                self._frame_cache[key] = raw
                while (len(self._frame_cache) * entry
                       > self._frame_cache_budget):
                    self._frame_cache.popitem(last=False)
        return raw

    def load_masks(self, image_id) -> np.ndarray:
        """-> [num_categories, S, S] bool (resized, center-cropped, OR-merged
        per category; cached)."""
        if image_id in self._mask_cache:
            return self._mask_cache[image_id]
        s = self.image_size
        masks = np.zeros((self.num_categories, s, s), bool)
        for ann in self.image_id_to_annotations.get(image_id, []):
            seg = ann.get("segmentation")
            cat_id = ann.get("category_id")
            if seg is None or cat_id is None:
                continue
            cat_idx = self.catid_to_idx.get(cat_id)
            if cat_idx is None or cat_idx >= self.num_categories:
                continue
            m = rle_mod.decode(seg)  # [H, W] native res
            h, w = m.shape
            nw, nh = resize_smaller_edge(w, h, s)
            mi = Image.fromarray(m * 255).resize((nw, nh), Image.NEAREST)
            left, top = center_crop_box(nw, nh, s)
            mi = mi.crop((left, top, left + s, top + s))
            masks[cat_idx] |= np.asarray(mi) > 127
        self._mask_cache[image_id] = masks
        return masks

    def mask_empty(self, image_id) -> bool:
        return not self.load_masks(image_id).any()


def clip_windows(index: COCOIndex, clip_length: int, stride: int):
    """Fixed-length clip windows per video (dataset.py:249-272).
    Returns list of dicts with video_id + image indices."""
    clips = []
    for video_id, images in index.video_to_images.items():
        start = 0
        while start + clip_length <= len(images):
            idxs = [index.image_id_to_idx[images[start + i]["id"]]
                    for i in range(clip_length)]
            clips.append({"video_id": video_id, "clip_start": start,
                          "image_indices": idxs})
            start += stride
    return clips
