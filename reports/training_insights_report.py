#!/usr/bin/env python3
"""Training-insights report: per-run metric curves and config deltas from the
local JSONL metric logs (the W&B-export equivalent of
/root/reference/notebooks/training_insights_report.py).

    python reports/training_insights_report.py [--runs outputs]
        [--out training_insights_report.md]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import pandas as pd


def load_run(run_dir: Path):
    metrics_path = run_dir / "metrics.jsonl"
    if not metrics_path.exists():
        return None
    records = [json.loads(l) for l in metrics_path.read_text().splitlines()
               if l.strip()]
    if not records:
        return None
    df = pd.DataFrame(records)
    cfg = {}
    cfg_path = run_dir / "config.json"
    if cfg_path.exists():
        cfg = json.loads(cfg_path.read_text())
    summary = {}
    s_path = run_dir / "summary.json"
    if s_path.exists():
        summary = json.loads(s_path.read_text())
    return {"dir": run_dir, "df": df, "config": cfg, "summary": summary}


def describe_run(run) -> list[str]:
    df, cfg = run["df"], run["config"]
    lines = [f"## {run['dir']}", ""]
    model = cfg.get("model", {})
    loss = cfg.get("loss", {})
    lines.append(f"- prompt_type: `{model.get('prompt_type')}`, trainable: "
                 f"`{model.get('trainable_modules')}`, loss: "
                 f"`{loss.get('type')}`")
    tr = df[df.get("split", "") == "train"] if "split" in df else df
    if "train/total_loss" in df.columns:
        t = df.dropna(subset=["train/total_loss"])
        if len(t):
            lines.append(f"- train loss: first {t['train/total_loss'].iloc[0]:.4f}"
                         f" -> last {t['train/total_loss'].iloc[-1]:.4f} "
                         f"(min {t['train/total_loss'].min():.4f})")
    if "val/total_loss" in df.columns:
        v = df.dropna(subset=["val/total_loss"])
        if len(v):
            lines.append(f"- val loss: min {v['val/total_loss'].min():.4f}")
    for k, val in (run["summary"] or {}).items():
        if k.startswith("eval/") or k.startswith("baseline_delta/"):
            lines.append(f"- {k}: {val:.4f}" if isinstance(val, float)
                         else f"- {k}: {val}")
    lines.append("")
    return lines


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--runs", default="outputs")
    ap.add_argument("--out", default="training_insights_report.md")
    args = ap.parse_args()
    runs = []
    for metrics in sorted(Path(args.runs).glob("**/metrics.jsonl")):
        r = load_run(metrics.parent)
        if r is not None:
            runs.append(r)
    lines = ["# Training insights", "", f"{len(runs)} runs found.", ""]
    for r in runs:
        lines.extend(describe_run(r))
    Path(args.out).write_text("\n".join(lines))
    print(f"wrote {args.out} ({len(runs)} runs)")


if __name__ == "__main__":
    main()
