"""BatchedVideoPredictor equivalence: tracking G clips in lockstep must
reproduce the sequential VideoPredictor's outputs row-for-row (same compiled
math, vmapped over the group). Object rows are independent through the heads
and memory attention (O is a batch dim), so each video's real rows match its
sequential run exactly; rows past a video's object count are padding."""

import numpy as np
import pytest

import jax

from sam2_video_tpu.eval.batched_predictor import BatchedVideoPredictor
from sam2_video_tpu.eval.predictor import VideoPredictor
from sam2_video_tpu.models import sam2 as sam2_mod
from sam2_video_tpu.models.sam2 import SAM2Config


@pytest.fixture(scope="module")
def setup():
    cfg = SAM2Config(image_size=128, compute_dtype="float32",
                     use_activation_checkpoint=False)
    params = sam2_mod.init(jax.random.PRNGKey(0), cfg)
    seq = VideoPredictor(params, cfg, max_objects=2)
    bat = BatchedVideoPredictor(params, cfg, max_objects=2, group_size=2)
    return cfg, params, seq, bat


def _run_sequential(seq, frames_g, prompts):
    """prompts: per video list of (kind, obj_id, payload...)"""
    outs = []
    for g, frames in enumerate(frames_g):
        state = seq.init_state(frames)
        for kind, obj_id, f, payload in prompts[g]:
            if kind == "points":
                seq.add_new_points_or_box(state, f, obj_id,
                                          points=payload[0], labels=payload[1])
            else:
                seq.add_new_mask(state, f, obj_id, payload)
        got = {}
        for fi, ids, lg, sc in seq.propagate_in_video(state, reverse=True):
            got[fi] = (lg, sc)
        for fi, ids, lg, sc in seq.propagate_in_video(state):
            got[fi] = (lg, sc)
        outs.append(got)
    return outs


def _run_batched(bat, frames_g, prompts):
    state = bat.init_group(np.stack(frames_g))
    for g in range(len(frames_g)):
        for kind, obj_id, f, payload in prompts[g]:
            if kind == "points":
                bat.add_new_points_or_box(state, g, f, obj_id,
                                          points=payload[0],
                                          labels=payload[1])
            else:
                bat.add_new_mask(state, g, f, obj_id, payload)
    got = {}
    for fi, ids, lg, sc in bat.propagate_in_group(state, reverse=True):
        got[fi] = (lg, sc, ids)
    for fi, ids, lg, sc in bat.propagate_in_group(state):
        got[fi] = (lg, sc, ids)
    return got


def test_batched_matches_sequential_points(setup, rng):
    cfg, params, seq, bat = setup
    G, T, H, W = 2, 5, 64, 64
    frames_g = [(rng.random((T, H, W, 3)) * 255).astype(np.uint8)
                for _ in range(G)]
    # video 0: two objects; video 1: one object (exercises padding rows);
    # every object gets ONE point so the padded point counts match the
    # sequential runs exactly
    prompts = [
        [("points", 11, 2, ([[20, 20]], [1])),
         ("points", 12, 2, ([[45, 40]], [1]))],
        [("points", 21, 2, ([[30, 25]], [1]))],
    ]
    seq_out = _run_sequential(seq, frames_g, prompts)
    bat_out = _run_batched(bat, frames_g, prompts)
    assert sorted(bat_out) == list(range(T))
    for fi in range(T):
        lg, sc, ids = bat_out[fi]
        assert lg.shape[0] == G and lg.dtype == np.float16
        for g in range(G):
            n = len(ids[g])
            want_lg, want_sc = seq_out[g][fi]
            np.testing.assert_allclose(
                np.asarray(lg[g, :n], np.float32),
                np.asarray(want_lg, np.float32), atol=2e-2, rtol=2e-2,
                err_msg=f"frame {fi} video {g}")
            np.testing.assert_allclose(sc[g, :n], want_sc, atol=1e-3,
                                       err_msg=f"frame {fi} video {g}")


def test_batched_matches_sequential_mixed_kinds(setup, rng):
    """Mask prompts in one video, point prompts in the other: the batched
    conditioning step runs both passes and merges rows per object."""
    cfg, params, seq, bat = setup
    G, T, H, W = 2, 4, 64, 64
    frames_g = [(rng.random((T, H, W, 3)) * 255).astype(np.uint8)
                for _ in range(G)]
    mask = np.zeros((H, W), np.uint8)
    mask[20:44, 16:40] = 1
    prompts = [
        [("mask", 1, 0, mask)],
        [("points", 2, 0, ([[30, 30]], [1]))],
    ]
    seq_out = _run_sequential(seq, frames_g, prompts)
    bat_out = _run_batched(bat, frames_g, prompts)
    for fi in range(T):
        lg, sc, ids = bat_out[fi]
        for g in range(G):
            n = len(ids[g])
            want_lg, _ = seq_out[g][fi]
            np.testing.assert_allclose(
                np.asarray(lg[g, :n], np.float32),
                np.asarray(want_lg, np.float32), atol=2e-2, rtol=2e-2,
                err_msg=f"frame {fi} video {g}")


def test_batched_guards(setup, rng):
    cfg, params, seq, bat = setup
    frames = (rng.random((3, 4, 32, 32, 3)) * 255).astype(np.uint8)
    with pytest.raises(ValueError, match="group_size"):
        bat.init_group(frames)
    state = bat.init_group(frames[:2])
    bat.add_new_points_or_box(state, 0, 1, "a", points=[[5, 5]], labels=[1])
    with pytest.raises(ValueError, match="ONE prompt frame"):
        bat.add_new_points_or_box(state, 1, 2, "b", points=[[5, 5]],
                                  labels=[1])


def test_batched_track_step_no_retrace_bf16(rng):
    """The fused group track step compiles once per config under bfloat16
    compute (the TPU setting): slot pads share the bank's compute dtype,
    pointer pads are f32 like every real pointer row, and frame features
    are sliced by the separate frame_feats jit — so neither the slot-fill
    pattern nor the clip length retraces the big jit."""
    cfg = SAM2Config(image_size=128, compute_dtype="bfloat16",
                     use_activation_checkpoint=False)
    params = sam2_mod.init(jax.random.PRNGKey(0), cfg)
    bat = BatchedVideoPredictor(params, cfg, max_objects=2, group_size=2)
    frames = rng.integers(0, 255, (2, 5, 64, 80, 3), dtype=np.uint8)
    state = bat.init_group(frames)
    for g in range(2):
        bat.add_new_points_or_box(state, g, 0, 1, points=[[40, 32]],
                                  labels=[1])
    for _ in bat.propagate_in_group(state):
        pass
    assert bat._track_step._cache_size() == 1
