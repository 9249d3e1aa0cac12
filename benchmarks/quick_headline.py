"""Quick headline-step timing for A/B comparisons: builds the bench headline
config (B=2, trainable=mem, 384px/T=10) and prints per-rep clips/s plus the
median. No loader, no MFU subprocess — medians across reps are the point
(CLAUDE.md: tunnel host variance demands medians, not single runs)."""
import json
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

cache = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from bench import _build_step

trainable = (["memory_attention", "memory_encoder", "mask_decoder",
              "prompt_encoder", "image_encoder"]
             if "--all" in sys.argv else
             ["memory_attention", "memory_encoder"])
B = 2
step, state, batch = _build_step(B, "none", trainable,
                                 stacked_grads="--stacked" in sys.argv)
compiled = step.lower(state, batch).compile()
state, metrics = compiled(state, batch)
float(jax.device_get(metrics["total_loss"]))
reps, n_steps = 5, 20
vals = []
for _ in range(reps):
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = compiled(state, batch)
    float(jax.device_get(metrics["total_loss"]))
    vals.append(B * n_steps / (time.perf_counter() - t0))
print(json.dumps({"reps": [round(v, 3) for v in vals],
                  "median_clips_per_sec": round(statistics.median(vals), 3)}))
