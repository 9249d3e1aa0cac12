"""Cost-analysis + finer-grained timing of the train step on the chip.
Order matters: the donating train step runs LAST (it deletes params)."""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import json, pathlib, time

import jax
import jax.numpy as jnp

cache = pathlib.Path("/root/repo/.jax_cache")
jax.config.update("jax_compilation_cache_dir", str(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from sam2_video_tpu.models import VideoModelConfig
from sam2_video_tpu.models import sam2 as sam2_mod
from sam2_video_tpu.models.sam2 import SAM2Config
from sam2_video_tpu.models.video_model import forward_train
from sam2_video_tpu.data.types import VideoClip
from sam2_video_tpu.training.loop import (TrainState, make_train_step,
                                          batched_loss_fn)
from sam2_video_tpu.training.losses import LossConfig, compute_loss
from sam2_video_tpu.training.optimizer import make_optimizer
from __graft_entry__ import _example_clip

S, T, O, C, B = 384, 10, 8, 7, 1
cfg = SAM2Config(backbone="tiny", image_size=S, compute_dtype="bfloat16",
                 use_activation_checkpoint=False)
mcfg = VideoModelConfig(sam2=cfg, prompt_type="point")
params = jax.device_put(sam2_mod.init(jax.random.PRNGKey(0), cfg))
batch = jax.device_put(_example_clip(S, T=T, O=O, C=C, B=B))


def report(name, compiled, step_ms=None):
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    out = {"name": name}
    if ca is not None:  # the axon backend may return None
        flops = float(ca.get("flops", 0.0))
        nbytes = float(ca.get("bytes accessed", 0.0))
        out.update(gflops=round(flops / 1e9, 1),
                   gbytes=round(nbytes / 1e9, 2))
        if step_ms:
            out["achieved_gbps"] = round(nbytes / 1e9 / (step_ms / 1e3), 1)
            out["achieved_tflops"] = round(flops / 1e12 / (step_ms / 1e3), 2)
    if step_ms:
        out["ms"] = round(step_ms, 2)
    print(json.dumps(out), flush=True)


def timeit(compiled, args, n=20, fetch=lambda o: jax.tree.leaves(o)[0]):
    out = compiled(*args)
    jax.device_get(fetch(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = compiled(*args)
    jax.device_get(fetch(out))
    return (time.perf_counter() - t0) / n * 1e3


# B. forward loss only (scalar fetch)
loss_fn = jax.jit(lambda p, b: batched_loss_fn(mcfg, LossConfig())(p, b)[0])
closs = loss_fn.lower(params, batch).compile()
ms = timeit(closs, (params, batch))
report("forward_loss", closs, ms)


# C. forward_train only (model fwd, no loss) — fetch tiny slice
def fwd_only(p, b):
    clip = VideoClip(images=b.images[0], cat_masks=b.cat_masks[0],
                     obj_masks=b.obj_masks[0], obj_to_cat=b.obj_to_cat[0],
                     point_coords=b.point_coords[0],
                     point_labels=b.point_labels[0])
    _, per_cat = forward_train(p, mcfg, clip, training=True)
    return jax.tree.map(lambda x: x.reshape(-1)[0].astype(jnp.float32),
                        per_cat)


cfwd = jax.jit(fwd_only).lower(params, batch).compile()
ms = timeit(cfwd, (params, batch))
report("forward_train_noloss", cfwd, ms)

# D. encoder only, scalar fetch (no big output transfer)
from sam2_video_tpu.models import image_encoder as ie_mod


def enc_only(p, b):
    out = ie_mod.apply(p["image_encoder"], b.images[0].astype(jnp.bfloat16),
                       cfg.image_encoder_config)
    return jax.tree.map(lambda x: x.reshape(-1)[0].astype(jnp.float32), out)


cenc = jax.jit(enc_only).lower(params, batch).compile()
ms = timeit(cenc, (params, batch))
report("encoder_fwd_10f", cenc, ms)

# A. full train step (bench config) — LAST, it donates/deletes params
tx = make_optimizer(params, {"lr": 1e-4, "type": "AdamW"},
                    {"enabled": False}, total_steps=1000,
                    trainable_modules=["memory_attention", "memory_encoder"])
step = make_train_step(mcfg, LossConfig(), tx,
                       trainable_modules=["memory_attention",
                                          "memory_encoder"])
state = TrainState.create(params, tx)
cstep = step.lower(state, batch).compile()
st, m = cstep(state, batch)
float(jax.device_get(m["total_loss"]))

# profiler trace around a few steps (may or may not capture device ops on
# the axon tunnel backend — best effort)
try:
    jax.profiler.start_trace("/tmp/jax_trace")
    for _ in range(3):
        st, m = cstep(st, batch)
    float(jax.device_get(m["total_loss"]))
    jax.profiler.stop_trace()
    print(json.dumps({"name": "trace", "ok": True}), flush=True)
except Exception as e:
    print(json.dumps({"name": "trace", "error": repr(e)[:200]}), flush=True)

t0 = time.perf_counter(); n = 20
for _ in range(n):
    st, m = cstep(st, batch)
float(jax.device_get(m["total_loss"]))
report("train_step_mem", cstep, (time.perf_counter() - t0) / n * 1e3)
print("COST DONE", flush=True)
