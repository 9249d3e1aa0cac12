import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import json
import pathlib
import time
import traceback

import jax

cache = pathlib.Path("/root/repo/.jax_cache")
jax.config.update("jax_compilation_cache_dir", str(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from sam2_video_tpu.models import VideoModelConfig
from sam2_video_tpu.models import sam2 as sam2_mod
from sam2_video_tpu.models.sam2 import SAM2Config
from sam2_video_tpu.training.loop import TrainState, make_train_step
from sam2_video_tpu.training.losses import LossConfig
from sam2_video_tpu.training.optimizer import make_optimizer
from __graft_entry__ import _example_clip

T, O, C, S = 10, 8, 7, 384
TRAIN = ["memory_attention", "memory_encoder"]

CONFIGS = [
    ("rope+flash+u9", True, 9),
    ("rope+xla+u9", False, 9),
    ("rope+flash+u1", True, 1),
    ("rope+xla+u1", False, 1),





]


def run_one(name, flash, unroll):
    cfg = SAM2Config(backbone="tiny", image_size=S, compute_dtype="bfloat16",
                     use_activation_checkpoint=False,
                     use_flash_attention=flash, scan_unroll=unroll)
    mcfg = VideoModelConfig(sam2=cfg, prompt_type="point")
    params = sam2_mod.init(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(params, {"lr": 1e-4, "type": "AdamW"},
                        {"enabled": False}, total_steps=1000,
                        trainable_modules=TRAIN)
    state = TrainState.create(params, tx)
    step = make_train_step(mcfg, LossConfig(), tx, trainable_modules=TRAIN)
    batch = _example_clip(S, T=T, O=O, C=C, B=1)
    t_c0 = time.perf_counter()
    state, metrics = step(state, batch)
    loss = float(jax.device_get(metrics["total_loss"]))
    compile_s = time.perf_counter() - t_c0
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = step(state, batch)
    float(jax.device_get(metrics["total_loss"]))
    dt = time.perf_counter() - t0
    print(json.dumps({"name": name, "clips_per_sec": round(n / dt, 3),
                      "step_ms": round(dt / n * 1e3, 1),
                      "compile_s": round(compile_s, 1),
                      "loss": round(loss, 3)}), flush=True)


for cfg_row in CONFIGS:
    try:
        run_one(*cfg_row)
    except Exception:
        print(json.dumps({"name": cfg_row[0],
                          "error": traceback.format_exc()[-400:]}),
              flush=True)
print("SWEEP DONE", flush=True)
