#!/usr/bin/env python3
"""Apply a kxk morphological opening to every annotation mask in a COCO JSON,
dropping annotations whose mask becomes empty.

Parity spec: /root/reference/data/apply_morphological_opening.py (5x5 default
kernel; empty results removed; areas/segmentations rewritten)."""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from sam2_video_tpu.data import rle as rle_mod  # noqa: E402

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def apply_opening(coco_data: dict, kernel_size: int = 5) -> dict:
    kernel = np.ones((kernel_size, kernel_size), np.uint8)
    keep = []
    dropped = 0
    for ann in coco_data["annotations"]:
        seg = ann.get("segmentation")
        if seg is None:
            keep.append(ann)
            continue
        mask = rle_mod.decode(seg)
        opened = cv2.morphologyEx(mask, cv2.MORPH_OPEN, kernel)
        if opened.sum() == 0:
            dropped += 1
            continue
        ann["segmentation"] = rle_mod.encode(opened)
        ann["area"] = int(opened.sum())
        keep.append(ann)
    coco_data["annotations"] = keep
    print(f"kept {len(keep)} annotations, dropped {dropped} emptied ones")
    return coco_data


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input_json")
    ap.add_argument("output_json")
    ap.add_argument("--kernel-size", type=int, default=5)
    args = ap.parse_args()
    data = json.loads(Path(args.input_json).read_text())
    data = apply_opening(data, args.kernel_size)
    Path(args.output_json).write_text(json.dumps(data))
    print(f"wrote {args.output_json}")


if __name__ == "__main__":
    main()
