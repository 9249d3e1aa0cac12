"""Re-threshold saved probability maps into a COCO predict.json without
re-running the model.

Parity spec: /root/reference/sam2_video/eval/export_predict_from_probs.py
(:22-116): per image per category merge any(prob >= threshold), score = max
prob across the category's objects, RLE-encode.

Merging uses the pixelwise max over the category's object probabilities —
``any_i(prob_i >= t)`` is ``max_i(prob_i) >= t`` — so each category is one
reduction plus one compare, and the detection score falls out of the same
reduction for free.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from ..data import rle as rle_mod
from .probs_io import FrameProbs, iter_frame_probs
from .utils import mask_to_bbox


def _frame_detections(frame: FrameProbs, threshold: float,
                      skip_background: bool):
    """Yield one COCO detection per category visible in this frame."""
    for cat in np.unique(frame.categories):
        if skip_background and cat == 0:
            continue
        peak = frame.category_peak(int(cat))
        merged = peak >= threshold
        if not merged.any():
            continue
        yield {
            "image_id": frame.image_id,
            "category_id": int(cat),
            "segmentation": rle_mod.encode(merged.astype(np.uint8)),
            "bbox": mask_to_bbox(merged),
            "iscrowd": 0,
            "score": float(peak.max()),
        }


def export_predict(probs_dir, threshold: float, output_predict=None,
                   exclude_background: bool = False) -> str:
    detections = [det
                  for frame in iter_frame_probs(probs_dir)
                  for det in _frame_detections(frame, threshold,
                                               exclude_background)]
    if output_predict is None:
        output_predict = str(Path(probs_dir).parent /
                             f"predict_t{threshold:.2f}.json")
    Path(output_predict).write_text(json.dumps(detections, indent=2))
    return output_predict


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--probs-dir", required=True)
    ap.add_argument("--threshold", required=True, type=float)
    ap.add_argument("--output-predict", default=None)
    ap.add_argument("--exclude-background", action="store_true")
    args = ap.parse_args()
    out = export_predict(args.probs_dir, args.threshold, args.output_predict,
                         args.exclude_background)
    print(f"wrote predictions to {out}")


if __name__ == "__main__":
    main()
