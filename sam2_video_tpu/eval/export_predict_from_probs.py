"""Re-threshold saved probability maps into a COCO predict.json without
re-running the model.

Parity spec: /root/reference/sam2_video/eval/export_predict_from_probs.py
(:22-116): per image per category merge any(prob >= threshold), score = max
prob across the category's objects, RLE-encode."""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from ..data import rle as rle_mod
from .tune_threshold import load_meta
from .utils import mask_to_bbox


def export_predict(probs_dir, threshold: float, output_predict=None,
                   exclude_background: bool = False) -> str:
    meta = load_meta(probs_dir)
    mod = int(meta["mod"])
    image_ids = meta.get("image_ids") or [
        int(p.stem) for p in Path(probs_dir).glob("*.npz")
        if p.stem.isdigit()]

    annotations = []
    for image_id in image_ids:
        npz_path = Path(probs_dir) / f"{image_id}.npz"
        if not npz_path.exists():
            continue
        data = np.load(npz_path)
        probs = np.asarray(data["probs"], np.float32)
        obj_ids = data["obj_ids"]

        cat_to_indices: dict[int, list[int]] = {}
        for idx, oid in enumerate(obj_ids.tolist()):
            cat_id = int(oid % mod)
            if exclude_background and cat_id == 0:
                continue
            cat_to_indices.setdefault(cat_id, []).append(idx)

        for cat_id, indices in cat_to_indices.items():
            idx = np.asarray(indices, np.int64)
            merged = np.any(probs[idx] >= threshold, axis=0)
            if merged.sum() == 0:
                continue
            score = float(max(float(probs[i].max()) for i in indices))
            annotations.append({
                "image_id": int(image_id), "category_id": int(cat_id),
                "segmentation": rle_mod.encode(merged.astype(np.uint8)),
                "bbox": mask_to_bbox(merged), "iscrowd": 0, "score": score})

    if output_predict is None:
        output_predict = str(Path(probs_dir).parent /
                             f"predict_t{threshold:.2f}.json")
    Path(output_predict).write_text(json.dumps(annotations, indent=2))
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
