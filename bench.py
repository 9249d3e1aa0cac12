"""Throughput benchmark: EndoVis18-style fine-tuning step (10-frame 384px
clips, SAM2-hiera-tiny) on one chip.

Prints ONE JSON line with the headline metric plus honesty fields:
- ``value``/``unit``: clips/sec/chip for the default fine-tune combo
  (trainable = memory modules, the reference's ``mem`` config) at the
  measured-optimal batch/remat setting.
- ``all_trainable_clips_per_sec``: the ``mem+md+pe+ie`` combo (every module
  trainable -> full backward incl. the Hiera encoder).
- ``mfu``: achieved FLOP/s / assumed peak. The FLOP numerator comes from
  XLA's cost analysis of the use_flash_attention=False variant of the same
  step (lowered HLO, no extra device compile): cost analysis does NOT count
  custom-call (Pallas) FLOPs, so analysing the executed flash program would
  undercount the memory cross-attention — the model's single largest FLOP
  block (~1.5 TFLOP/step of the measured 3.27 TFLOP total under
  the static-prefix loop; see docs/DESIGN.md §3a).
  ``peak_flops_assumed``
  names the denominator: 197e12 (TPU v5e bf16) unless TPU_PEAK_FLOPS is
  set — the tunnel backend does not expose the chip model.
- ``vs_baseline``: the reference publishes NO throughput numbers anywhere
  (SURVEY.md §6). The denominator is therefore a DERIVED estimate of the
  PyTorch stack on one A100, stated here so the ratio is auditable:
  the reference tracks T=10 frames sequentially in Python (sam2model.py:
  forward_tracking), forcing torch.cuda.synchronize + empty_cache every
  forward (trainer.py:186-187); at the commonly observed 30-60 ms/frame
  launch+sync floor for this model size that is 0.3-0.6 s/clip forward,
  ~2-3x with backward+optimizer -> ~0.5-1 s/clip, i.e. 1-2 clips/s. We use
  the favorable end (2.0 clips/s) so vs_baseline is a LOWER bound on the
  speedup. Treat ``value`` as the ground truth, vs_baseline as context.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

A100_BASELINE_CLIPS_PER_SEC = 2.0  # derived estimate — see module docstring
PEAK_FLOPS = float(os.environ.get("TPU_PEAK_FLOPS", 197e12))  # v5e bf16


def _build_step(B, remat, trainable, S=384, T=10, O=8, C=7,
                use_flash=True, stacked_grads=False):
    import jax

    from sam2_video_tpu.models import VideoModelConfig
    from sam2_video_tpu.models import sam2 as sam2_mod
    from sam2_video_tpu.models.sam2 import SAM2Config
    from sam2_video_tpu.training.loop import TrainState, make_train_step
    from sam2_video_tpu.training.losses import LossConfig
    from sam2_video_tpu.training.optimizer import make_optimizer
    from __graft_entry__ import _example_clip

    cfg = SAM2Config(backbone="tiny", image_size=S, compute_dtype="bfloat16",
                     use_activation_checkpoint=(remat != "none"),
                     remat_mode=remat, use_flash_attention=use_flash,
                     stacked_frame_grads=stacked_grads)
    mcfg = VideoModelConfig(sam2=cfg, prompt_type="point")
    params = sam2_mod.init(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(params, {"lr": 1e-4, "type": "AdamW"},
                        {"enabled": False}, total_steps=1000,
                        trainable_modules=trainable)
    state = TrainState.create(params, tx)
    step = make_train_step(mcfg, LossConfig(), tx,
                           trainable_modules=trainable)
    batch = _example_clip(S, T=T, O=O, C=C, B=B)
    return step, state, batch


def _flops_for(trainable):
    """FLOP count for MFU: lower (never compile) the XLA-sdpa variant of
    the identical step and read XLA cost analysis — Pallas custom-call FLOPs
    are invisible to cost analysis, and the plain-sdpa program contains the
    same math as countable dots. Must run on the CPU backend (see
    _flops_via_cpu_subprocess): the axon remote backend's cost_analysis()
    returns None."""
    step, state, batch = _build_step(1, "none", trainable, use_flash=False)
    ca = step.lower(state, batch).cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return float(ca.get("flops", 0.0)) or None


def _flops_via_cpu_subprocess():
    """Run ``bench.py --flops-only`` in a CPU subprocess and return
    {"mem": flops, "all": flops} ({} on failure). The subprocess forces the
    CPU platform before first jax use, which cannot be done in this process
    once the axon backend is initialized."""
    import subprocess
    import sys
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--flops-only"],
            capture_output=True, text=True, timeout=900,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        return json.loads(out.stdout.strip().splitlines()[-1])
    except Exception as e:
        print(f"bench: CPU flops subprocess failed ({type(e).__name__}: "
              f"{e}); mfu will be null", file=sys.stderr)
        return {}


def _flops_only_main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    print(json.dumps({
        "mem": _flops_for(["memory_attention", "memory_encoder"]),
        "all": _flops_for(["memory_attention", "memory_encoder",
                           "mask_decoder", "prompt_encoder",
                           "image_encoder"]),
    }))


def _measure(step, state, batch, B, flops_per_step=None, n_steps=20):
    import jax

    compiled = step.lower(state, batch).compile()
    # warmup (device_get forces completion; block_until_ready returns early
    # on the tunnel backend)
    state, metrics = compiled(state, batch)
    float(jax.device_get(metrics["total_loss"]))
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = compiled(state, batch)
    float(jax.device_get(metrics["total_loss"]))
    dt = time.perf_counter() - t0
    step_s = dt / n_steps
    cps = B / step_s
    mfu = (flops_per_step / step_s / PEAK_FLOPS
           if flops_per_step else None)
    return cps, step_s, flops_per_step, mfu


def _loader_dataset(S=384, T=10, C=7):
    """Disk-backed synthetic COCO dataset (real PNGs + RLE annotations) for
    the loader-in-the-loop measurement; cached across bench runs."""
    import pathlib

    from sam2_video_tpu.data.synthetic import make_synthetic_dataset
    root = pathlib.Path(__file__).resolve().parent / ".bench_data" / \
        f"loader_s{S}_t{T}_c{C}"
    json_path = root / "annotations.json"
    if not json_path.exists():
        make_synthetic_dataset(root, num_videos=8, frames_per_video=4 * T,
                               image_hw=(S, S + 128), num_categories=C,
                               seed=0)
    return json_path


def _bench_loader(S=384, T=10, O=8, C=7, n_steps=24):
    """VERDICT r2 item 4: the host input pipeline IN the training loop —
    real PNG decode + RLE decode + connected components + point sampling
    through ClipLoader feeding the jitted step — vs the pre-staged headline.

    CAVEAT: this environment's host has ONE CPU core (shared with the
    device-dispatch thread), unlike a real TPU-VM host (dozens of cores);
    the loader_only numbers here are a LOWER bound on a production host and
    worker scaling cannot show gains at nproc=1."""
    import time

    import jax

    from sam2_video_tpu.data.coco import COCOIndex
    from sam2_video_tpu.data.pipeline import (ClipDataset, ClipDatasetConfig,
                                              ClipLoader)

    json_path = _loader_dataset(S, T, C)
    index = COCOIndex(json_path, S, C)
    ds = ClipDataset(index, ClipDatasetConfig(
        clip_length=T, stride=T, max_objects=O, prompt_type="point"))

    def loader(workers, dataset=None):
        return ClipLoader(dataset or ds, batch_size=1, shuffle=True, seed=0,
                          num_workers=workers, prefetch=2, drop_last=True)

    # pure host loader throughput (no device work), worker scaling
    loader_only = {}
    for workers in (1, 2):
        it = iter(loader(workers))
        next(it)                      # warm the cache/threads
        t0 = time.perf_counter()
        n = 0
        for _ in range(10):
            next(it)   # raise on exhaustion rather than time empty iters
            n += 1
        loader_only[workers] = round(n / (time.perf_counter() - t0), 3)

    # VERDICT r3 item 4: cache-warm epoch-2 steady state. frame_cache_mb
    # keeps post-resize uint8 frames so epoch >= 2 skips PNG decode; mask
    # cache warms the same way (both caches are unbounded-hit after one
    # epoch on this 8-video/32-clip synthetic set). next(it) raises on
    # exhaustion so a shrunk dataset fails loudly instead of silently
    # inflating the cached-loader number.
    idx_c = COCOIndex(json_path, S, C, frame_cache_mb=256)
    ds_c = ClipDataset(idx_c, ClipDatasetConfig(
        clip_length=T, stride=T, max_objects=O, prompt_type="point"))
    for _ in iter(loader(1, ds_c)):  # epoch 1: fill both caches
        pass
    it = iter(loader(1, ds_c))
    next(it)
    t0 = time.perf_counter()
    n = 0
    for _ in range(10):
        next(it)
        n += 1
    loader_cached = round(n / (time.perf_counter() - t0), 3)

    # the real fit-style loop: jitted step consuming loader batches
    step, state, _ = _build_step(1, "none",
                                 ["memory_attention", "memory_encoder"],
                                 S=S, T=T, O=O, C=C)

    def in_loop(dataset, state):
        # async dispatch exactly like the fit loop: sync only at the warmup
        # boundary and the end, so loader work overlaps device compute
        warmup, done, t0 = 4, 0, None
        while done < n_steps:
            for batch in loader(2, dataset):
                if done >= n_steps:
                    break
                state, metrics = step(state, batch)
                done += 1
                if done == warmup:
                    float(jax.device_get(metrics["total_loss"]))
                    t0 = time.perf_counter()
        float(jax.device_get(metrics["total_loss"]))
        return state, round((n_steps - warmup) / (time.perf_counter() - t0),
                            3)

    state, loader_cold = in_loop(ds, state)
    # VERDICT r4 item 6: the warm steady state through the REAL fit loop
    # (not pure-loader) — ds_c's frame+mask caches were filled above, so
    # this is the epoch>=2 regime with device work in the loop.
    state, loader_warm = in_loop(ds_c, state)
    return {
        "loader_clips_per_sec": loader_cold,
        "loader_clips_per_sec_warm": loader_warm,
        "loader_only_clips_per_sec": loader_only,
        "loader_cached_clips_per_sec": loader_cached,
        "loader_note": "in-loop steady state over synthetic disk-backed "
                       "PNGs+RLE at 384px. On THIS environment the in-loop "
                       "number is bound by per-step batch upload (~33 MB) "
                       "through the remote-TPU tunnel plus the 1-core host "
                       "— not by the loader itself (see loader_only_* for "
                       "pure host pipeline throughput and its worker "
                       "scaling); production TPU-VM hosts have local PCIe "
                       "and dozens of loader cores",
    }


def main():
    import pathlib

    import jax
    cache = pathlib.Path(__file__).resolve().parent / ".jax_cache"
    cache.mkdir(exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    flops_map = _flops_via_cpu_subprocess()

    # headline: the default fine-tune combo at the measured optimum
    # (docs/DESIGN.md §3 sweeps: B=2, no remat, flash kernel, full unroll —
    # B=2 overtook B=1 once the static-prefix loop landed, §3a; FLOPs scale
    # exactly linearly in B (vmap over clips), so the B=1 cost analysis
    # times B is the correct MFU numerator)
    B, remat = 2, "none"
    step, state, batch = _build_step(
        B, remat, ["memory_attention", "memory_encoder"])
    fl = flops_map.get("mem")
    cps, step_s, flops, mfu = _measure(step, state, batch, B,
                                       fl * B if fl else None)
    del step, state, batch

    # all-modules-trainable combo (mem+md+pe+ie): full backward incl. Hiera
    B_all = 2
    step, state, batch = _build_step(
        B_all, "none", ["memory_attention", "memory_encoder", "mask_decoder",
                        "prompt_encoder", "image_encoder"])
    fl_all = flops_map.get("all")
    cps_all, step_all_s, flops_all, mfu_all = _measure(
        step, state, batch, B_all, fl_all * B_all if fl_all else None,
        n_steps=10)
    del step, state, batch

    # 512px/T=8 CholecSeg8k-style setting (reference README's second
    # headline config). B=2 is the measured 512px optimum since the
    # round-5 eligibility break (DESIGN.md §3 "Round-5 512px").
    step, state, batch = _build_step(
        2, "none", ["memory_attention", "memory_encoder"], S=512, T=8)
    cps_512, _, _, _ = _measure(step, state, batch, 2, None, n_steps=10)
    del step, state, batch

    try:
        loader_fields = _bench_loader()
    except Exception as e:
        import sys as _sys
        print(f"bench: loader-in-loop measurement failed "
              f"({type(e).__name__}: {e})", file=_sys.stderr)
        loader_fields = {"loader_clips_per_sec": None}

    print(json.dumps({
        "metric": "clips/sec/chip (10-frame 384px EndoVis18-style "
                  "fine-tune step, SAM2-tiny, trainable=mem, B=2, bf16)",
        "value": round(cps, 3),
        "unit": "clips/sec/chip",
        "vs_baseline": round(cps / A100_BASELINE_CLIPS_PER_SEC, 3),
        "baseline_note": "denominator is a DERIVED 2.0 clips/s A100 estimate "
                         "(reference publishes no throughput; see bench.py "
                         "docstring for the derivation)",
        "all_trainable_clips_per_sec": round(cps_all, 3),
        "px512_t8_clips_per_sec": round(cps_512, 3),
        "flops_per_step": flops,
        "mfu": round(mfu, 4) if mfu is not None else None,
        "all_trainable_mfu": round(mfu_all, 4) if mfu_all is not None
        else None,
        "peak_flops_assumed": PEAK_FLOPS,
        **loader_fields,
    }))


if __name__ == "__main__":
    import sys
    if "--flops-only" in sys.argv:
        _flops_only_main()
    else:
        main()
