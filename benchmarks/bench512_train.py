import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import json, pathlib, time
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

# reference README CholecSeg8k setting: 512px, 8-frame clips.
# Round-4 re-sweep (VERDICT r3 item 6): B in {1,2} with the fused Hiera
# trunk + fused memattn layer kernels now in the step.
S, T = 512, 8
cfg = SAM2Config(backbone="tiny", image_size=S, compute_dtype="bfloat16",
                 use_activation_checkpoint=False)
mcfg = VideoModelConfig(sam2=cfg, prompt_type="point")
params = sam2_mod.init(jax.random.PRNGKey(0), cfg)
tx = make_optimizer(params, {"lr": 1e-4, "type": "AdamW"}, {"enabled": False},
                    total_steps=1000,
                    trainable_modules=["memory_attention", "memory_encoder"])
state = TrainState.create(params, tx)
step = make_train_step(mcfg, LossConfig(), tx,
                       trainable_modules=["memory_attention",
                                          "memory_encoder"])
for B in (1, 2):
    batch = _example_clip(S, T=T, O=8, C=7, B=B)
    t0 = time.perf_counter()
    state, m = step(state, batch)
    float(jax.device_get(m["total_loss"]))
    compile_s = time.perf_counter() - t0
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, batch)
    float(jax.device_get(m["total_loss"]))
    dt = time.perf_counter() - t0
    print(json.dumps({"name": f"512px-T8-B{B}-none",
                      "clips_per_sec": round(n * B / dt, 3),
                      "step_ms": round(dt / n * 1e3, 1),
                      "compile_s": round(compile_s, 1)}), flush=True)
