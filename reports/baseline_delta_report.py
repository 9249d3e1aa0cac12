#!/usr/bin/env python3
"""Baseline-delta analysis report: the feature-engineering analysis of
/root/reference/notebooks/analyze.py (:1-198) over LOCAL metrics.json
artifacts instead of a W&B CSV export.

Joins each trained combo's eval scores against the zero-shot baseline for
the same (dataset, prompt_type) — the reference's max_epochs==0 split —
computes percentage improvements, and emits the same six insights:
overall training impact per dataset, has_memory grouping, has_image_encoder
grouping, prompt-type comparison, best config per dataset, and the best
overall fine-tuning configuration.

    python reports/baseline_delta_report.py --results outputs/combo_runs
        [--baseline baseline_results] [--out baseline_delta_report.md]

Expects ``<results>/**/metrics.json`` as written by baseline_eval.py
({"combo": "<ds>/<n>", "avg_scores": {"dice": .., "iou": .., "mae": ..}});
the baseline tree holds the zero-shot runs in the same format.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import pandas as pd

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def combo_features(combo: str) -> dict:
    """Resolve a combo id ('endovis18/1') to its analysis features via the
    config tree (the reference derives these from W&B columns)."""
    from sam2_video_tpu.config import load_config
    cfg = load_config("config", [f"combo={combo}"])
    modules = list(cfg.model.get("trainable_modules") or [])
    shorts = []
    for m in modules:
        s = _SHORT.get(m, m)
        if s not in shorts:
            shorts.append(s)
    shorts.sort(key=lambda s: _ORDER.get(s, 9))
    return {
        "dataset": combo.split("/")[0],
        "config": "+".join(shorts) or "none",
        "prompt_type": cfg.model.get("prompt_type"),
        "has_memory": "memory_encoder" in modules,
        "has_image_encoder": "image_encoder" in modules,
    }


_SHORT = {"memory_encoder": "mem", "memory_attention": "mem",
          "mask_decoder": "md", "prompt_encoder": "pe",
          "image_encoder": "ie"}
_ORDER = {"mem": 0, "md": 1, "pe": 2, "ie": 3}


def load_rows(root: Path) -> list[dict]:
    rows = []
    for path in sorted(root.glob("**/metrics.json")):
        m = json.loads(path.read_text())
        combo = m.get("combo")
        scores = m.get("avg_scores") or {}
        if not combo or "dice" not in scores:
            continue
        row = {"combo": combo, "run_dir": str(path.parent),
               "dice": float(scores["dice"]), "iou": float(scores["iou"]),
               "mae": float(scores["mae"])}
        row.update(combo_features(combo))
        rows.append(row)
    return rows


def build_report(trained: list[dict], baseline: list[dict]) -> str:
    df = pd.DataFrame(trained)
    bl = pd.DataFrame(baseline)
    lines = ["# Baseline-delta report",
             "",
             f"{len(df)} trained runs, {len(bl)} zero-shot baseline runs.",
             ""]
    if df.empty or bl.empty:
        lines.append("Not enough runs for the delta analysis (need both "
                     "trained and baseline metrics.json trees).")
        return "\n".join(lines) + "\n"

    # reference: baseline keyed by (dataset, prompt_type) (analyze.py:41-55)
    blk = bl.groupby(["dataset", "prompt_type"])[
        ["dice", "iou", "mae"]].mean().rename(
        columns={"dice": "dice_baseline", "iou": "iou_baseline",
                 "mae": "mae_baseline"})
    df = df.join(blk, on=["dataset", "prompt_type"])
    df = df.dropna(subset=["dice_baseline"])
    if df.empty:
        lines.append("No trained run has a matching (dataset, prompt_type) "
                     "baseline.")
        return "\n".join(lines) + "\n"

    # improvements (analyze.py:60-78); MAE: lower is better, keep the
    # reference's signed 'reduction' convention (negative = reduced)
    df["dice_improvement_%"] = ((df["dice"] - df["dice_baseline"])
                                / df["dice_baseline"] * 100)
    df["iou_improvement_%"] = ((df["iou"] - df["iou_baseline"])
                               / df["iou_baseline"] * 100)
    df["mae_reduction_%"] = ((df["mae"] - df["mae_baseline"])
                             / df["mae_baseline"] * 100)

    show = df[["dataset", "prompt_type", "config", "dice", "dice_baseline",
               "dice_improvement_%", "iou", "iou_improvement_%", "mae",
               "mae_reduction_%"]].sort_values(
        ["dataset", "prompt_type", "config"])
    lines += ["## Trained runs vs baseline", "",
              show.to_markdown(index=False, floatfmt=".4f"), ""]

    lines += ["## Insight 1: overall impact of training", ""]
    imp = df.groupby("dataset")[["dice_improvement_%", "iou_improvement_%",
                                 "mae_reduction_%"]].mean()
    lines += [imp.to_markdown(floatfmt=".2f"), ""]

    lines += ["## Insight 2: do memory modules help?", ""]
    mem = df.groupby(["dataset", "has_memory"])["dice"].mean().unstack()
    mem.columns = ["without memory" if not c else "with memory"
                   for c in mem.columns]
    lines += [mem.to_markdown(floatfmt=".4f"), ""]

    lines += ["## Insight 3: does fine-tuning the image encoder help?", ""]
    ie = df.groupby(["dataset", "has_image_encoder"])[
        "dice_improvement_%"].mean().unstack()
    ie.columns = ["without image encoder" if not c else "with image encoder"
                  for c in ie.columns]
    lines += [ie.to_markdown(floatfmt=".2f"), ""]

    lines += ["## Insight 4: prompt-type effectiveness", ""]
    pr = df.groupby(["dataset", "prompt_type"])["dice"].mean().unstack()
    lines += [pr.to_markdown(floatfmt=".4f"), ""]

    lines += ["## Insight 5: best configuration per dataset", ""]
    best = df.loc[df.groupby("dataset")["dice"].idxmax()][
        ["dataset", "combo", "config", "prompt_type", "dice",
         "dice_improvement_%"]].sort_values("dataset")
    lines += [best.to_markdown(index=False, floatfmt=".4f"), ""]

    lines += ["## Insight 6: best overall fine-tuning configuration", ""]
    overall = df.groupby("config").agg(
        mean_dice=("dice", "mean"),
        mean_dice_improvement=("dice_improvement_%", "mean"),
        run_count=("combo", "count")).sort_values(
        "mean_dice", ascending=False)
    lines += [overall.to_markdown(floatfmt=".4f"), ""]
    top = overall.index[0]
    lines += [f"Best overall configuration: `{top}` "
              f"(mean Dice {overall.loc[top, 'mean_dice']:.4f}, "
              f"{overall.loc[top, 'mean_dice_improvement']:.2f}% over "
              "baseline).", ""]
    return "\n".join(lines) + "\n"


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--results", required=True,
                    help="root of trained-run metrics.json artifacts")
    ap.add_argument("--baseline", default=str(REPO / "baseline_results"),
                    help="root of zero-shot baseline metrics.json artifacts")
    ap.add_argument("--out", default="baseline_delta_report.md")
    args = ap.parse_args(argv)
    report = build_report(load_rows(Path(args.results)),
                          load_rows(Path(args.baseline)))
    Path(args.out).write_text(report)
    print(report)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
