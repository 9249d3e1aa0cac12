"""Per-source-file device-time attribution for the headline training step.

Extends profile_step.py: captures a jax.profiler trace, then maps every
device op (fusion.N, custom-call, copy, ...) to the Python source file(s)
recorded in the compiled HLO's op metadata, and aggregates device time per
source file / module band. This is the tool that sizes "the decoder band" /
"the memattn band" etc. so kernel work is spent where the time is
(VERDICT r4 item 1 asks for the mask-decoder/FPN band specifically).

Usage:
    python benchmarks/source_profile.py [--trainable mem|all] [--batch 2]
        [--steps 5]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict


def _device_events(outdir: str):
    """[(name, total_us, count)] of device-lane X events, umbrella spans
    (jit_*, named regions '0'..'9') excluded."""
    paths = sorted(glob.glob(os.path.join(
        outdir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        return []
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    device_pids = set()
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            if ("TPU" in name or "/device:" in name.lower()
                    or "device" in name.lower()):
                device_pids.add(ev.get("pid"))
    agg = defaultdict(lambda: [0.0, 0])
    for ev in events:
        if ev.get("ph") != "X":
            continue
        if device_pids and ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "?")
        if name.startswith("jit_") or re.fullmatch(r"\d+", name):
            continue  # umbrella spans double-count their children
        agg[name][0] += ev.get("dur", 0)
        agg[name][1] += 1
    return [(k, v[0], v[1]) for k, v in agg.items()]


_SRC_RE = re.compile(r'source_file="([^"]+)"')
_CALLS_RE = re.compile(r'calls=%?([\w\.\-]+)')
_INSTR_RE = re.compile(r'^\s+(?:ROOT\s+)?%?([\w\.\-]+)\s*=')
_COMP_RE = re.compile(r'^(?:ENTRY\s+)?%?([\w\.\-]+)\s*\(.*->.*\{')


def _hlo_source_map(hlo_text: str):
    """Trace-event name (= HLO instruction name) -> set of source files.

    Two passes: (1) collect source_file occurrences per computation body;
    (2) map each fusion/call instruction to its called computation's files
    (plus its own metadata), and every other instruction to its own."""
    comp_files: dict[str, set] = defaultdict(set)
    instr_comp: dict[str, str] = {}
    instr_files: dict[str, set] = defaultdict(set)
    current = None
    for line in hlo_text.splitlines():
        mc = _COMP_RE.match(line)
        if mc:
            current = mc.group(1)
            continue
        mi = _INSTR_RE.match(line)
        name = mi.group(1) if mi else None
        files = set(_SRC_RE.findall(line))
        if current and files:
            comp_files[current].update(files)
        if name:
            if files:
                instr_files[name].update(files)
            mcall = _CALLS_RE.search(line)
            if mcall:
                instr_comp[name] = mcall.group(1)
    out: dict[str, set] = {}
    for name, files in instr_files.items():
        out.setdefault(name, set()).update(files)
    for name, comp in instr_comp.items():
        out.setdefault(name, set()).update(comp_files.get(comp, ()))
    return out, comp_files


def _band(path: str) -> str:
    """Source file -> band label."""
    for key, label in (
        ("mask_decoder", "mask_decoder"),
        ("prompt_encoder", "prompt_encoder"),
        ("memory_attention", "memory_attention"),
        ("memattn_layer_kernel", "memattn_kernels"),
        ("flash_attention", "flash_kernels"),
        ("memory_encoder_kernel", "memenc_kernel"),
        ("memory_encoder", "memory_encoder"),
        ("hiera_block", "hiera_kernels"),
        ("hiera", "hiera_xla"),
        ("image_encoder", "fpn_neck"),
        ("position_encoding", "pos_encoding"),
        ("resize", "resize"),
        ("sam2.py", "sam2_glue"),
        ("video_model", "video_glue"),
        ("losses", "losses"),
        ("merging", "merging"),
        ("optimizer", "optimizer"),
        ("optax", "optimizer"),
        ("loop.py", "train_glue"),
    ):
        if key in path:
            return label
    return "other:" + os.path.basename(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trainable", default="mem", choices=["mem", "all"])
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--outdir", default="/tmp/sam2_srctrace")
    ap.add_argument("--top-files", type=int, default=24)
    args = ap.parse_args()

    import pathlib
    import time

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
    hlo = compiled.as_text()
    instr_files, _ = _hlo_source_map(hlo)

    state, metrics = compiled(state, batch)  # warmup
    float(jax.device_get(metrics["total_loss"]))
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = compiled(state, batch)
    float(jax.device_get(metrics["total_loss"]))
    wall = (time.perf_counter() - t0) / args.steps

    os.makedirs(args.outdir, exist_ok=True)
    with jax.profiler.trace(args.outdir):
        for _ in range(args.steps):
            state, metrics = compiled(state, batch)
        float(jax.device_get(metrics["total_loss"]))

    rows = _device_events(args.outdir)
    per_file = defaultdict(float)
    per_band = defaultdict(float)
    unattributed = 0.0
    total_us = 0.0
    for name, us, _count in rows:
        total_us += us
        base = name.split("(")[0]
        files = instr_files.get(base) or set()
        if not files:
            unattributed += us
            per_file["<unattributed>" + base[:32]] += us
            per_band["<unattributed>"] += us
            continue
        # priority attribution: a fusion mixing a model/kernel file with
        # shared primitives (ops/common.py, ops/attention.py, resize) is
        # the model band's — attribute the full time to the most specific
        # file instead of diluting across the set
        def _prio(f):
            if "/ops/common" in f or "/ops/attention" in f \
                    or "/ops/resize" in f or "/ops/position_enc" in f \
                    or "site-packages" in f:
                return 0
            if "/models/" in f or "/training/" in f or "/utils/" in f:
                return 2
            return 3  # pallas kernel files and everything else win
        best = max(_prio(f) for f in files)
        chosen = [f for f in files if _prio(f) == best]
        share = us / len(chosen)
        for f in chosen:
            per_file[f] += share
            per_band[_band(f)] += share

    steps = args.steps
    print(f"\nwall/step: {wall*1e3:.2f} ms   "
          f"device-op total/step: {total_us/1e3/steps:.2f} ms",
          file=sys.stderr)
    print("\n=== device time by band (ms/step) ===", file=sys.stderr)
    for k, v in sorted(per_band.items(), key=lambda kv: -kv[1]):
        print(f"  {v/1e3/steps:8.3f}  {k}", file=sys.stderr)
    print(f"\n=== top {args.top_files} source files (ms/step) ===",
          file=sys.stderr)
    for k, v in sorted(per_file.items(),
                       key=lambda kv: -kv[1])[:args.top_files]:
        print(f"  {v/1e3/steps:8.3f}  {k}", file=sys.stderr)
    print(json.dumps({
        "trainable": args.trainable, "batch": args.batch,
        "wall_ms_per_step": round(wall * 1e3, 3),
        "device_ms_per_step": round(total_us / 1e3 / steps, 3),
        "bands_ms_per_step": {k: round(v / 1e3 / steps, 3)
                              for k, v in sorted(per_band.items(),
                                                 key=lambda kv: -kv[1])},
    }))


if __name__ == "__main__":
    main()
