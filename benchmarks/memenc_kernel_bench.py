"""Micro-benchmark of the fused memory-encoder kernel at the training shape
(16 objects = B2 x O8, 384px masks), plus a numerics check vs the XLA path.
Medians of 5 reps x 50 calls."""
import json
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

cache = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(cache))

from sam2_video_tpu.models import memory_encoder as me
from sam2_video_tpu.ops import common as nn
from sam2_video_tpu.ops.memory_encoder_kernel import fused_memory_encoder

cfg = me.MemoryEncoderConfig()
p = me.init(jax.random.PRNGKey(3), cfg)
leaves, treedef = jax.tree.flatten(p)
keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
p = jax.tree.unflatten(treedef, [
    a + 0.05 * jax.random.normal(k, a.shape, a.dtype)
    for a, k in zip(leaves, keys)])

rng = np.random.default_rng(0)
N, S = 16, 384
dt = jnp.bfloat16
pb = jax.tree.map(lambda a: a.astype(dt), p)
pix = jnp.asarray(rng.standard_normal((N, S // 16, S // 16, 256)), dt)
masks = jnp.asarray(
    20.0 / (1.0 + np.exp(-rng.standard_normal((N, S, S, 1)))) - 10.0, dt)

pix_proj = nn.conv2d(pb["pix_feat_proj"], pix)
run = jax.jit(lambda pp, px, ms: fused_memory_encoder(pp, cfg, px, ms))
out = run(pb, pix_proj, masks)
out.block_until_ready()
_ = jax.device_get(out)

# numerics vs XLA path (bf16)
want, _ = me.apply(pb, cfg, pix, masks, allow_fused=False)
d = np.abs(np.asarray(jax.device_get(out), np.float32)
           - np.asarray(jax.device_get(want), np.float32))
scale = np.abs(np.asarray(jax.device_get(want), np.float32)).mean()
print(f"numerics: max abs diff {d.max():.3e}, mean {d.mean():.3e}, "
      f"ref mean abs {scale:.3e}", file=sys.stderr)

reps, calls = 5, 50
vals = []
for _ in range(reps):
    t0 = time.perf_counter()
    for _ in range(calls):
        out = run(pb, pix_proj, masks)
    float(jax.device_get(out[0, 0, 0, 0]))
    vals.append((time.perf_counter() - t0) / calls * 1e3)
print(json.dumps({"ms_per_call_reps": [round(v, 4) for v in vals],
                  "median_ms": round(statistics.median(vals), 4)}))
