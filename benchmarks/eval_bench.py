"""Scripted eval-throughput protocol (VERDICT r2 item 6): N>=5 timed runs
per configuration, reported as median + IQR in ONE JSON artifact — replaces
the prose "12.8-14.9 fps across runs" ranges with a reproducible number.
Tunnel/1-core-host variance is +-20-30% run-to-run (CLAUDE.md), which is
exactly why medians are mandated.

Configs: sequential 384px, grouped 384px G=4, grouped 512px G=4 — the
settings PARITY.md quotes.

    python benchmarks/eval_bench.py [--runs 5] [--out EVALBENCH.json]
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import argparse
import json
import pathlib
import statistics
import time

import jax

cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from sam2_video_tpu.data.synthetic import make_synthetic_dataset  # noqa: E402
from sam2_video_tpu.eval.inference import inference               # noqa: E402
from sam2_video_tpu.models import sam2 as sam2_mod                # noqa: E402
from sam2_video_tpu.models.sam2 import SAM2Config                 # noqa: E402

NUM_VIDEOS, FRAMES_PER_VIDEO = 8, 16
CONFIGS = [
    ("seq384", 384, 1),
    ("grouped384_g4", 384, 4),
    ("grouped512_g4", 512, 4),
]


def run_config(name, image_size, group, runs):
    cfg = SAM2Config(backbone="tiny", image_size=image_size,
                     compute_dtype="bfloat16",
                     use_activation_checkpoint=False)
    params = sam2_mod.init(jax.random.PRNGKey(0), cfg)
    ds = make_synthetic_dataset(f"/tmp/evalbench_ds_{image_size}",
                                num_videos=NUM_VIDEOS,
                                frames_per_video=FRAMES_PER_VIDEO,
                                image_hw=(480, 854), num_categories=3)
    warm = make_synthetic_dataset(f"/tmp/evalbench_warm_{image_size}",
                                  num_videos=max(group, 1),
                                  frames_per_video=8,
                                  image_hw=(480, 854), num_categories=3)
    kw = dict(prompt_type="points", clip_length=8, max_objects=8,
              batch_videos=group)
    t0 = time.perf_counter()
    inference(params, cfg, warm, f"/tmp/evalbench_w_{name}", **kw)
    warm_s = time.perf_counter() - t0

    frames = NUM_VIDEOS * FRAMES_PER_VIDEO
    fps = []
    for i in range(runs):
        t0 = time.perf_counter()
        inference(params, cfg, ds, f"/tmp/evalbench_r_{name}_{i}", **kw)
        dt = time.perf_counter() - t0
        fps.append(frames / dt)
        print(json.dumps({"config": name, "run": i,
                          "frames_per_sec": round(fps[-1], 2)}), flush=True)
    q = statistics.quantiles(fps, n=4)
    return {
        "image_size": image_size, "group": group, "frames": frames,
        "runs": runs, "warmup_s": round(warm_s, 1),
        "fps_runs": [round(f, 2) for f in fps],
        "fps_median": round(statistics.median(fps), 2),
        "fps_iqr": [round(q[0], 2), round(q[2], 2)],
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--out", default=str(
        _pl.Path(__file__).resolve().parent.parent / "EVALBENCH.json"))
    args = ap.parse_args(argv)
    out = {"protocol": "median of N timed inference() runs per config; "
                       "synthetic 480x854 source videos; one shared warmup "
                       "per config (compile excluded)",
           "configs": {}}
    for name, size, group in CONFIGS:
        out["configs"][name] = run_config(name, size, group, args.runs)
    line = json.dumps(out)
    pathlib.Path(args.out).write_text(line + "\n")
    print(line, flush=True)


if __name__ == "__main__":
    main()
