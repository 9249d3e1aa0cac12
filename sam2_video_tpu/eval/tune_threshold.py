"""Threshold grid search over saved probability maps.

Parity spec: /root/reference/sam2_video/eval/tune_threshold.py (:26-177):
sweep thresholds in [t_min, t_max] with t_step, per image per category merge
predictions as any(prob >= thr), Dice vs the per-category merged GT, mean
over (image, category) pairs, argmax with tie-break nearest 0.5; writes
``best_threshold.json``."""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from ..data import rle as rle_mod


def dice_score(pred: np.ndarray, gt: np.ndarray) -> float:
    inter = np.logical_and(pred, gt).sum(dtype=np.float64)
    denom = pred.sum(dtype=np.float64) + gt.sum(dtype=np.float64) + 1e-7
    return float(2.0 * inter / denom)


def load_meta(probs_dir) -> dict:
    meta_path = Path(probs_dir) / "meta.json"
    if not meta_path.exists():
        raise FileNotFoundError(f"meta.json not found in {probs_dir}")
    return json.loads(meta_path.read_text())


def grid_search(probs_dir, coco_path, t_min=0.2, t_max=0.8, t_step=0.05,
                exclude_background=False):
    gt = json.loads(Path(coco_path).read_text())
    gt_anns: dict = {}
    for a in gt["annotations"]:
        gt_anns.setdefault(a["image_id"], []).append(a)
    meta = load_meta(probs_dir)
    mod = int(meta["mod"])
    image_ids = meta.get("image_ids") or [
        int(p.stem) for p in Path(probs_dir).glob("*.npz")
        if p.stem.isdigit()]

    thresholds = []
    t = t_min
    while t <= t_max + 1e-9:
        thresholds.append(round(t, 5))
        t += t_step

    sum_dice = np.zeros(len(thresholds), np.float64)
    count = np.zeros(len(thresholds), np.int64)

    for image_id in image_ids:
        npz_path = Path(probs_dir) / f"{image_id}.npz"
        if not npz_path.exists():
            continue
        data = np.load(npz_path)
        probs = np.asarray(data["probs"], np.float32)
        obj_ids = data["obj_ids"]
        H = int(data["height"]) if "height" in data else probs.shape[1]
        W = int(data["width"]) if "width" in data else probs.shape[2]

        pred_cats = set((obj_ids % mod).tolist()) if obj_ids.size else set()
        anns = gt_anns.get(int(image_id), [])
        gt_cats = {a["category_id"] for a in anns}
        categories = sorted(pred_cats | gt_cats)
        if exclude_background and 0 in categories:
            categories.remove(0)

        gt_masks = {}
        for c in categories:
            cat_anns = [a for a in anns if a["category_id"] == c]
            m = np.zeros((H, W), bool)
            for a in cat_anns:
                m |= rle_mod.decode(a["segmentation"]).astype(bool)
            gt_masks[c] = m

        for ti, thr in enumerate(thresholds):
            for c in categories:
                idx = np.where((obj_ids % mod) == c)[0]
                if idx.size == 0 and not gt_masks[c].any():
                    continue
                pred = (np.any(probs[idx] >= thr, axis=0) if idx.size
                        else np.zeros((H, W), bool))
                sum_dice[ti] += dice_score(pred, gt_masks[c])
                count[ti] += 1

    valid = count > 0
    if not valid.any():
        raise RuntimeError("No valid categories found for Dice computation.")
    mean_dice = np.full_like(sum_dice, -np.inf)
    mean_dice[valid] = sum_dice[valid] / count[valid]
    best_idx = int(np.argmax(mean_dice))
    ties = np.where(mean_dice == mean_dice[best_idx])[0]
    if len(ties) > 1:
        best_idx = min(ties, key=lambda i: abs(thresholds[i] - 0.5))
    per_thr = [(float(thresholds[i]), float(mean_dice[i]))
               for i in range(len(thresholds)) if valid[i]]
    return float(thresholds[best_idx]), float(mean_dice[best_idx]), per_thr


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--probs-dir", required=True)
    ap.add_argument("--coco-path", required=True)
    ap.add_argument("--min", dest="t_min", type=float, default=0.2)
    ap.add_argument("--max", dest="t_max", type=float, default=0.8)
    ap.add_argument("--step", dest="t_step", type=float, default=0.05)
    ap.add_argument("--exclude-background", action="store_true")
    ap.add_argument("--output-json", default=None)
    args = ap.parse_args()
    best_thr, best_dice, per_thr = grid_search(
        args.probs_dir, args.coco_path, args.t_min, args.t_max, args.t_step,
        args.exclude_background)
    out = args.output_json or str(Path(args.probs_dir).parent /
                                  "best_threshold.json")
    Path(out).write_text(json.dumps({
        "best_threshold": best_thr, "best_dice": best_dice,
        "threshold_curve": per_thr,
        "exclude_background": bool(args.exclude_background),
        "range": {"min": args.t_min, "max": args.t_max, "step": args.t_step},
    }, indent=2))
    print(f"best threshold {best_thr:.3f} (Dice={best_dice:.4f}) -> {out}")


if __name__ == "__main__":
    main()
