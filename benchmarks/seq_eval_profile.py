"""Sequential-eval per-frame breakdown (VERDICT r3 item 5).

Buckets the real ``propagate_in_video`` loop's wall time per frame into:

- ``dispatch_ms``   — host work per frame: `_assemble_memory` slot selection
  + the four async jit dispatches (`frame_feats`, `track_step`, and their
  Python-dispatch fallback overhead on the experimental backend). Dispatch
  never synchronizes, so this is pure host/launch cost.
- ``fetch_wait_ms`` — time blocked in ``np.asarray(packed)``: device compute
  backlog + the D2H low-res payload transfer for frames popping out of the
  depth-3 software pipeline.
- ``xfer_floor_ms`` — a pure-transfer probe: fetching an already-computed
  device array of the exact packed payload shape ([n_obj, 1, S/4, S/4] f16
  + [n_obj] f32 score). fetch_wait - xfer_floor ~ device-compute share.
- ``device_step_ms`` — dispatch N track steps back-to-back with ONE scalar
  sync at the end: the device-side rate with transfers out of the picture
  (scalar fetch, per CLAUDE.md timing rules).

    python benchmarks/seq_eval_profile.py [--frames 64] [--size 384]
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import argparse
import json
import pathlib
import time
from collections import deque

import jax
import numpy as np

cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from sam2_video_tpu.models import sam2 as sam2_mod            # noqa: E402
from sam2_video_tpu.models.sam2 import SAM2Config             # noqa: E402
from sam2_video_tpu.eval.predictor import VideoPredictor      # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--size", type=int, default=384)
    ap.add_argument("--objects", type=int, default=8)
    args = ap.parse_args(argv)
    S, T = args.size, args.frames

    cfg = SAM2Config(backbone="tiny", image_size=S, compute_dtype="bfloat16",
                     use_activation_checkpoint=False)
    params = sam2_mod.init(jax.random.PRNGKey(0), cfg)
    pred = VideoPredictor(params, cfg, max_objects=args.objects)

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (T, 480, 854, 3), np.uint8)
    state = pred.init_state(frames)
    for o in range(args.objects):
        pred.add_new_points_or_box(
            state, 0, o, points=[[100.0 + 40 * o, 200.0]], labels=[1])

    # warmup pass compiles everything and fills the const caches
    for _ in pred.propagate_in_video(state):
        pass
    state.mem_bank.clear()

    # ---- instrumented copy of the propagate loop (same structure,
    # depth-3 pipeline) with per-bucket timers -------------------------------
    pred._ensure_cond_outputs(state)
    n_obj = len(state.obj_order)
    mem_bank, cond_outputs = state.mem_bank, state.cond_outputs
    f0 = min(cond_outputs)
    order = list(range(f0, T))

    def dispatch(t):
        co = cond_outputs.get(t)
        if co is not None:
            return pred._lowres_pack(co.lowres, state.orig_hw, n_obj)
        slots, sv, tpos, ptrs, pv, pt, tdm = pred._assemble_memory(
            state, mem_bank, cond_outputs, t, False)
        s0, s1, s16 = pred._frame_feats(state.feats, np.int32(t))
        obj_ptr, new_mem, lowres, oscore, packed, score = pred._track_step(
            pred.params, s0, s1, s16, slots, sv, tpos, ptrs, pv, pt,
            pred._dev_const(np.float32(tdm)), state.orig_hw, n_obj,
            pred._mem_pos_flat)
        from sam2_video_tpu.eval.predictor import TrackedOutput
        mem_bank[t] = TrackedOutput(mem=new_mem, ptr=obj_ptr,
                                    lowres=lowres, score=oscore)
        return packed, score

    t_dispatch = t_fetch = 0.0
    pending = deque()
    results = []
    t_all0 = time.perf_counter()
    for t in order:
        d0 = time.perf_counter()
        pending.append((t, dispatch(t)))
        t_dispatch += time.perf_counter() - d0
        if len(pending) > 3:
            _, (pk, sc) = pending.popleft()
            f0_ = time.perf_counter()
            results.append((np.asarray(pk), np.asarray(sc)))
            t_fetch += time.perf_counter() - f0_
    while pending:
        _, (pk, sc) = pending.popleft()
        f0_ = time.perf_counter()
        results.append((np.asarray(pk), np.asarray(sc)))
        t_fetch += time.perf_counter() - f0_
    wall = time.perf_counter() - t_all0
    nf = len(order)

    # ---- pure-transfer floor: re-fetch computed arrays of the same shape --
    probe = jax.device_put(
        np.zeros((n_obj, 1, S // 4, S // 4), np.float16))
    probe_s = jax.device_put(np.zeros((n_obj,), np.float32))
    np.asarray(probe), np.asarray(probe_s)  # warm route
    xfers = []
    for _ in range(10):
        a = probe + 0  # fresh array, no cached host copy
        b = probe_s + 0
        jax.device_get(b)
        x0 = time.perf_counter()
        np.asarray(a), np.asarray(b)
        xfers.append(time.perf_counter() - x0)
    xfer_floor = float(np.median(xfers))

    # ---- device-only step rate: N re-dispatches, one scalar sync ----------
    state.mem_bank.clear()
    ndev = 32
    d0 = time.perf_counter()
    last = None
    for t in order[1:ndev + 1]:
        last = dispatch(t)
    float(jax.device_get(last[1][0]))
    dev_ms = (time.perf_counter() - d0) / ndev * 1e3

    out = {
        "config": f"seq{S} T={T} n_obj={n_obj} (tunnel-attached single chip)",
        "fps": round(nf / wall, 2),
        "per_frame_ms": round(wall / nf * 1e3, 2),
        "dispatch_ms": round(t_dispatch / nf * 1e3, 2),
        "fetch_wait_ms": round(t_fetch / nf * 1e3, 2),
        "xfer_floor_ms": round(xfer_floor * 1e3, 2),
        "device_step_ms": round(dev_ms, 2),
        "note": "fetch_wait - xfer_floor ~ device backlog at pop time; "
                "device_step_ms is dispatch+compute with scalar-only sync",
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
