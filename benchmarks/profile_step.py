"""Profile the headline training step (VERDICT r2 item 1: settle the
HBM-roofline question with a measured trace, not counted bytes).

Captures a ``jax.profiler`` trace of N compiled steps, then parses the
XPlane/trace-event JSON to aggregate device op time by fusion/op name, and
cross-references ``compiled.cost_analysis()`` (bytes accessed / flops) to
report achieved HBM bandwidth and MXU utilization per phase.

Usage:
    python benchmarks/profile_step.py [--trainable all|mem] [--steps 5]
          [--outdir /tmp/sam2_trace]

Prints a JSON summary + a top-op table to stderr.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict


def _aggregate_trace(outdir: str):
    """Parse trace.json.gz files under outdir and aggregate device-side op
    durations by event name. Returns (total_device_us, [(name, us, count)])."""
    paths = sorted(glob.glob(os.path.join(
        outdir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        return 0.0, []
    agg = defaultdict(lambda: [0.0, 0])
    # pick the newest trace file
    path = paths[-1]
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # identify device PIDs: process_name metadata containing "TPU" / "Device"
    device_pids = set()
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            if ("TPU" in name or "/device:" in name.lower()
                    or "device" in name.lower()):
                device_pids.add(ev.get("pid"))
    for ev in events:
        if ev.get("ph") != "X":
            continue
        if device_pids and ev.get("pid") not in device_pids:
            continue
        dur = ev.get("dur", 0)  # microseconds
        name = ev.get("name", "?")
        agg[name][0] += dur
        agg[name][1] += 1
    rows = sorted(((k, v[0], v[1]) for k, v in agg.items()),
                  key=lambda r: -r[1])
    total = sum(r[1] for r in rows)
    return total, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trainable", default="mem", choices=["mem", "all"])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--outdir", default="/tmp/sam2_trace")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import pathlib

    import jax

    cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    from bench import _build_step

    trainable = (["memory_attention", "memory_encoder"]
                 if args.trainable == "mem" else
                 ["memory_attention", "memory_encoder", "mask_decoder",
                  "prompt_encoder", "image_encoder"])
    step, state, batch = _build_step(args.batch, "none", trainable)
    compiled = step.lower(state, batch).compile()

    # cost analysis on the compiled program (works on axon, CLAUDE.md)
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else (ca or {})
    bytes_accessed = float(ca.get("bytes accessed", 0.0))
    flops = float(ca.get("flops", 0.0))

    # memory analysis if available
    try:
        mem = compiled.memory_analysis()
        mem_info = {
            "argument_size": getattr(mem, "argument_size_in_bytes", None),
            "output_size": getattr(mem, "output_size_in_bytes", None),
            "temp_size": getattr(mem, "temp_size_in_bytes", None),
            "peak_bytes": getattr(
                mem, "peak_memory_in_bytes",
                getattr(mem, "total_size_in_bytes", None)),
        }
    except Exception:
        mem_info = {}

    # warmup
    state, metrics = compiled(state, batch)
    print(f"warmup loss={float(jax.device_get(metrics['total_loss'])):.4f}",
          file=sys.stderr)

    # timed, untraced baseline
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = compiled(state, batch)
    float(jax.device_get(metrics["total_loss"]))
    wall_untraced = (time.perf_counter() - t0) / args.steps

    os.makedirs(args.outdir, exist_ok=True)
    with jax.profiler.trace(args.outdir):
        for _ in range(args.steps):
            state, metrics = compiled(state, batch)
        float(jax.device_get(metrics["total_loss"]))

    total_us, rows = _aggregate_trace(args.outdir)
    per_step_device_ms = total_us / 1000.0 / args.steps

    print(f"\n=== step summary (trainable={args.trainable}) ===",
          file=sys.stderr)
    print(f"wall/step (untraced): {wall_untraced*1e3:.2f} ms", file=sys.stderr)
    print(f"device-op time/step (trace): {per_step_device_ms:.2f} ms",
          file=sys.stderr)
    print(f"cost_analysis: flops={flops/1e12:.3f} T, "
          f"bytes={bytes_accessed/1e9:.2f} GB", file=sys.stderr)
    if wall_untraced > 0:
        print(f"counted-bytes BW (bytes/wall): "
              f"{bytes_accessed/wall_untraced/1e9:.1f} GB/s", file=sys.stderr)
    print(f"memory_analysis: {mem_info}", file=sys.stderr)

    print(f"\n=== top {args.top} device ops by total time ===",
          file=sys.stderr)
    for name, us, count in rows[:args.top]:
        print(f"{us/1000.0/args.steps:9.3f} ms/step  x{count:5d}  {name}",
              file=sys.stderr)

    print(json.dumps({
        "trainable": args.trainable,
        "wall_ms_per_step": round(wall_untraced * 1e3, 3),
        "device_ms_per_step": round(per_step_device_ms, 3),
        "flops": flops,
        "bytes_accessed": bytes_accessed,
        "counted_bw_gb_s": round(bytes_accessed / wall_untraced / 1e9, 1)
        if wall_untraced else None,
        "mem": mem_info,
    }))


if __name__ == "__main__":
    main()
