"""Grouped-eval throughput at the CholecSeg8k-style setting (512px model,
large source frames), with a jax.profiler trace for host-stall analysis."""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import json, pathlib, time
import jax
cache = pathlib.Path("/root/repo/.jax_cache")
jax.config.update("jax_compilation_cache_dir", str(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from sam2_video_tpu.data.synthetic import make_synthetic_dataset
from sam2_video_tpu.eval.inference import inference
from sam2_video_tpu.models import sam2 as sam2_mod
from sam2_video_tpu.models.sam2 import SAM2Config

json_path = make_synthetic_dataset("/tmp/ds512", num_videos=8,
                                   frames_per_video=16, image_hw=(480, 854),
                                   num_categories=3)
cfg = SAM2Config(backbone="tiny", image_size=512, compute_dtype="bfloat16",
                 use_activation_checkpoint=False)
params = sam2_mod.init(jax.random.PRNGKey(0), cfg)

# warmup (compile both jitted programs) on a small same-shape dataset
warm_json = make_synthetic_dataset("/tmp/ds512_warm", num_videos=4,
                                   frames_per_video=8, image_hw=(480, 854),
                                   num_categories=3)
t0 = time.perf_counter()
inference(params, cfg, warm_json, "/tmp/run512_warm", prompt_type="points",
          clip_length=8, max_objects=8, batch_videos=4)
print(json.dumps({"warmup_s": round(time.perf_counter() - t0, 1)}),
      flush=True)

# jax.profiler.start_trace("/tmp/eval512_trace")
t0 = time.perf_counter()
predict_path, _ = inference(params, cfg, json_path, "/tmp/run512",
                            prompt_type="points", clip_length=8,
                            max_objects=8, batch_videos=4)
dt = time.perf_counter() - t0
# jax.profiler.stop_trace()
frames = 8 * 16
print(json.dumps({"name": "eval-512px-grouped4", "frames": frames,
                  "seconds": round(dt, 1),
                  "frames_per_sec": round(frames / dt, 2)}), flush=True)
