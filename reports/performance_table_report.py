#!/usr/bin/env python3
"""Generate the markdown performance table (datasets x prompt types, rows =
trainable-module sets, cells = Dice / mIoU / MAE).

Parity spec: /root/reference/notebooks/performance_table_report.py, which
aggregates a W&B CSV export; ours aggregates the local artifacts —
``baseline_results/**/metrics.json`` and ``outputs/**/summary.json`` — into
the same table shape as notebooks/performance_table_report.md.

    python reports/performance_table_report.py [--results baseline_results]
        [--out performance_table_report.md]
"""

from __future__ import annotations

import argparse
import json
import re
from collections import defaultdict
from pathlib import Path

DATASETS = ["endovis18", "endovis17", "cholecseg8k"]
PROMPTS = ["point", "box", "mask"]
ROW_ORDER = ["baseline", "mem", "mem+md", "mem+md+pe", "mem+md+pe+ie",
             "md", "md+pe", "md+pe+ie"]


def parse_combo_name(name: str):
    """'endovis18_point_mem+md' -> (dataset, prompt, set)."""
    m = re.match(r"(\w+?)_(point|box|mask)_(.+)", name or "")
    if not m:
        return None
    return m.group(1), m.group(2), m.group(3)


def collect(results_dirs):
    cells = defaultdict(dict)  # (dataset, prompt) -> {set: scores}
    for root in results_dirs:
        for mpath in Path(root).glob("**/metrics.json"):
            try:
                m = json.loads(mpath.read_text())
            except json.JSONDecodeError:
                continue
            name = m.get("name") or m.get("combo", "")
            parsed = parse_combo_name(str(name).replace("/", "_"))
            if parsed is None:
                continue
            ds, prompt, mset = parsed
            avg = m.get("avg_scores", {})
            cells[(ds, prompt)][mset] = avg
    return cells


def fmt(scores):
    if not scores:
        return "—"
    return (f"{scores.get('dice', float('nan')):.3f} / "
            f"{scores.get('iou', float('nan')):.3f} / "
            f"{scores.get('mae', float('nan')):.2f}")


def build_table(cells) -> str:
    lines = ["# Performance table (Dice / mIoU / MAE)", ""]
    header = "| trained modules | " + " | ".join(
        f"{ds} · {p}" for ds in DATASETS for p in PROMPTS) + " |"
    sep = "|" + "---|" * (1 + len(DATASETS) * len(PROMPTS))
    lines += [header, sep]
    for row in ROW_ORDER:
        vals = []
        for ds in DATASETS:
            for p in PROMPTS:
                vals.append(fmt(cells.get((ds, p), {}).get(row)))
        lines.append(f"| {row} | " + " | ".join(vals) + " |")
    return "\n".join(lines) + "\n"


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--results", nargs="*",
                    default=["baseline_results", "outputs"])
    ap.add_argument("--out", default="performance_table_report.md")
    args = ap.parse_args()
    cells = collect(args.results)
    md = build_table(cells)
    Path(args.out).write_text(md)
    print(md)


if __name__ == "__main__":
    main()
