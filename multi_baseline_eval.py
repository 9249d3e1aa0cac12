"""Parallel eval driver: run baseline_eval.py over combo shards in parallel
subprocesses, one per device/slice.

Parity spec: /root/reference/multi_baseline_eval.py (:6-19) — the reference
pins CUDA_VISIBLE_DEVICES per thread; on TPU each worker process claims its
chip(s) (single-chip here; on a pod slice, pin via TPU_VISIBLE_CHIPS)."""

from __future__ import annotations

import argparse
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path


def run_shard(shard_idx: int, combo_file: Path, out_dir: str, env_extra: dict):
    import os
    env = dict(os.environ)
    env.update(env_extra)
    cmd = [sys.executable, "baseline_eval.py", "--combo-file",
           str(combo_file), "--out-dir", out_dir]
    return subprocess.run(cmd, env=env).returncode


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--out-dir", default="baseline_results")
    ap.add_argument("--combos", nargs="*", default=None)
    args = ap.parse_args()

    from baseline_eval import discover_combos
    combos = args.combos or discover_combos()
    shards = [combos[i::args.workers] for i in range(args.workers)]
    tmp = Path(".combo_shards")
    tmp.mkdir(exist_ok=True)
    files = []
    for i, shard in enumerate(shards):
        p = tmp / f"shard{i}.txt"
        p.write_text("\n".join(shard))
        files.append(p)

    with ThreadPoolExecutor(max_workers=args.workers) as pool:
        futs = [pool.submit(run_shard, i, f, args.out_dir, {})
                for i, f in enumerate(files)]
        rc = max(f.result() for f in futs)
    sys.exit(rc)


if __name__ == "__main__":
    main()
