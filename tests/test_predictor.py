"""VideoPredictor unit tests: eval-time memory-slot selection parity with the
reference's r-stride rules (sam2_base.py:549-675), pointer past-only
selection, and a small end-to-end propagate on synthetic frames."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sam2_video_tpu.eval.predictor import InferenceState, VideoPredictor
from sam2_video_tpu.models import sam2 as sam2_mod
from sam2_video_tpu.models.sam2 import SAM2Config


@pytest.fixture(scope="module")
def pred():
    cfg = SAM2Config(image_size=128, compute_dtype="float32",
                     use_activation_checkpoint=False)
    params = sam2_mod.init(jax.random.PRNGKey(0), cfg)
    return VideoPredictor(params, cfg, max_objects=2)


def _fake_bank(pred, frames, T):
    """mem_bank whose entries are tagged by frame index for identification."""
    cfg = pred.cfg
    O, HW = pred.max_objects, cfg.num_spatial_tokens
    bank = {}
    for t in frames:
        mem = jnp.full((O, HW, cfg.mem_dim), float(t + 1), jnp.float32)
        ptr = np.full((O, cfg.d_model), float(t + 1), np.float32)
        bank[t] = (mem, ptr)
    return bank


def _slot_frames(pred, state, bank, cond_mem, cond_ptr, frame_idx, cond_f,
                 reverse=False):
    from sam2_video_tpu.eval.predictor import CondOutput
    conds = {cond_f: CondOutput(None, cond_mem, cond_ptr, None)}
    sm, sv, tpos, ptrs, pv, pt, tdm = pred._assemble_memory(
        state, bank, conds, frame_idx, reverse)
    sm = np.asarray(sm)[:, 0, 0, 0]  # tag per slot
    sv = np.asarray(sv)
    return sm, sv, np.asarray(tpos), np.asarray(ptrs)[:, 0, 0], np.asarray(pv), np.asarray(pt), tdm


def test_memory_slot_selection_forward(pred):
    cfg = pred.cfg
    T = 20
    state = InferenceState(num_frames=T, orig_hw=(64, 64), feats=None,
                           prompts={}, obj_order=["a"], cond_frame_idx=0)
    bank = _fake_bank(pred, range(1, 12), T)
    O, HW = pred.max_objects, cfg.num_spatial_tokens
    cond_mem = jnp.full((O, HW, cfg.mem_dim), 100.0)
    cond_ptr = np.full((O, cfg.d_model), 100.0, np.float32)

    sm, sv, tpos, ptag, pv, pt, tdm = _slot_frames(
        pred, state, bank, cond_mem, cond_ptr, frame_idx=11, cond_f=0)
    # slot 0 = cond; slots for t_pos 1..6 (r=1): frames 5,6,7,8,9,10
    assert sm[0] == 100.0 and sv[0]
    np.testing.assert_array_equal(sm[1:], [6, 7, 8, 9, 10, 11])  # tag=t+1
    assert sv.all()
    # tpos embedding indices: cond -> M-1; t_pos k -> M-k-1
    np.testing.assert_array_equal(tpos, [6, 5, 4, 3, 2, 1, 0])
    # pointers: cond (tag 100) + past frames 10,9,...,1 (10 entries)
    assert ptag[0] == 100.0 and pv[0]
    np.testing.assert_array_equal(ptag[1:11], np.arange(10, 0, -1) + 1)
    assert pt[0] == 11.0  # signed distance to cond frame
    np.testing.assert_array_equal(pt[1:11], np.arange(1, 11))
    assert not pv[11:].any()
    assert tdm == min(T, cfg.max_obj_ptrs_in_encoder) - 1


def test_memory_slot_selection_early_frames_invalid(pred):
    cfg = pred.cfg
    state = InferenceState(num_frames=10, orig_hw=(64, 64), feats=None,
                           prompts={}, obj_order=["a"], cond_frame_idx=0)
    bank = _fake_bank(pred, [1], 10)
    O, HW = pred.max_objects, cfg.num_spatial_tokens
    cond_mem = jnp.full((O, HW, cfg.mem_dim), 100.0)
    cond_ptr = np.zeros((O, cfg.d_model), np.float32)
    sm, sv, *_ = _slot_frames(pred, state, bank, cond_mem, cond_ptr,
                              frame_idx=2, cond_f=0)
    # only the last-frame slot (frame 1) is valid among non-cond slots
    assert sv[0] and sv[-1]
    assert not sv[1:-1].any()
    assert sm[-1] == 2.0  # frame 1 tag


def test_memory_slot_selection_reverse(pred):
    cfg = pred.cfg
    state = InferenceState(num_frames=20, orig_hw=(64, 64), feats=None,
                           prompts={}, obj_order=["a"], cond_frame_idx=15)
    bank = _fake_bank(pred, range(6, 20), 20)
    O, HW = pred.max_objects, cfg.num_spatial_tokens
    cond_mem = jnp.full((O, HW, cfg.mem_dim), 100.0)
    cond_ptr = np.full((O, cfg.d_model), 100.0, np.float32)
    sm, sv, tpos, ptag, pv, pt, tdm = _slot_frames(
        pred, state, bank, cond_mem, cond_ptr, frame_idx=8, cond_f=15,
        reverse=True)
    # reverse, slots in t_pos order 1..6: frames 14,13,12,11,10 then the
    # immediately-next frame 9 (t_rel==1 takes frame_idx+1); tags are t+1
    np.testing.assert_array_equal(sm[1:], [15, 14, 13, 12, 11, 10])
    # cond pointer included (cond_f >= frame_idx in reverse)
    assert pv[0] and ptag[0] == 100.0
    assert pt[0] == (8 - 15) * -1.0  # signed with reverse multiplier


def test_end_to_end_propagate_bidirectional(pred, rng):
    T, H, W = 5, 96, 128
    frames = (rng.random((T, H, W, 3)) * 255).astype(np.uint8)
    state = pred.init_state(frames)
    assert state.num_frames == T
    mask = np.zeros((H, W), np.uint8)
    mask[30:60, 40:80] = 1
    pred.add_new_mask(state, 2, obj_id=7, mask=mask)
    pred.add_new_points_or_box(state, 2, obj_id=13,
                               points=[[100, 20]], labels=[1])
    from sam2_video_tpu.eval.predictor import logits_to_orig
    S = pred.cfg.image_size
    seen = {}
    for fi, ids, logits, score in pred.propagate_in_video(state,
                                                          reverse=True):
        assert ids == [7, 13]
        # low-res (S/4) is the external predictor's stored mask resolution;
        # it upsamples directly to video resolution for output
        assert logits.shape == (2, 1, S // 4, S // 4)
        assert logits.dtype == np.float16
        mask, probs = logits_to_orig(logits, state.orig_hw, want_probs=True)
        assert mask.shape == (2, 1, H, W)
        assert probs.dtype == np.float16
        seen[fi] = True
    assert sorted(seen) == [0, 1, 2]
    for fi, ids, logits, score in pred.propagate_in_video(state):
        seen[fi] = True
        assert 0.0 <= score[0] <= 1.0
    assert sorted(seen) == list(range(T))


def test_select_closest_cond_frames():
    from sam2_video_tpu.eval.utils import select_closest_cond_frames
    cond = {0: "a", 5: "b", 10: "c", 20: "d"}
    sel, unsel = select_closest_cond_frames(7, cond, -1)
    assert sel == cond and unsel == {}
    sel, unsel = select_closest_cond_frames(7, cond, 2)
    assert set(sel) == {5, 10}  # nearest before + nearest at/after
    assert set(unsel) == {0, 20}
    sel, _ = select_closest_cond_frames(7, cond, 3)
    assert set(sel) == {5, 10, 0}  # then by absolute distance
    # frame before all cond frames: no "before", two nearest after
    sel, _ = select_closest_cond_frames(-1, cond, 2)
    assert set(sel) == {0, 5}


def test_memory_slot_selection_stride_r2():
    """Eval-time r=2 memory stride (sam2_base.py:565-595): t_rel==1 takes the
    immediately previous frame; t_rel>=2 takes every 2nd frame."""
    cfg2 = SAM2Config(image_size=128, compute_dtype="float32",
                      use_activation_checkpoint=False,
                      memory_temporal_stride_for_eval=2)
    params = sam2_mod.init(jax.random.PRNGKey(0), cfg2)
    pred2 = VideoPredictor(params, cfg2, max_objects=2)
    state = InferenceState(num_frames=40, orig_hw=(64, 64), feats=None,
                           prompts={}, obj_order=["a"], cond_frame_idx=0)
    bank = _fake_bank(pred2, range(1, 21), 40)
    O, HW = pred2.max_objects, cfg2.num_spatial_tokens
    cond_mem = jnp.full((O, HW, cfg2.mem_dim), 100.0)
    cond_ptr = np.zeros((O, cfg2.d_model), np.float32)
    sm, sv, *_ = _slot_frames(pred2, state, bank, cond_mem, cond_ptr,
                              frame_idx=21, cond_f=0)
    # frame 21, r=2: base = ((21-2)//2)*2 = 18; t_pos 1..5 -> 18-(t_rel-2)*2
    # with t_rel = 7-t_pos: frames 10, 12, 14, 16, 18 then t_rel==1 -> 20
    np.testing.assert_array_equal(sm[1:], [11, 13, 15, 17, 19, 21])
    assert sv.all()


def test_forward_pass_sees_reverse_pass_memories(pred, rng):
    """External-predictor parity: both propagate directions share one
    inference state, so the forward pass attends to memories the reverse
    pass produced (reference predict_on_video runs reverse then forward on
    the same state, inference.py:487-515)."""
    T, H, W = 6, 64, 64
    frames = (rng.random((T, H, W, 3)) * 255).astype(np.uint8)
    mask = np.zeros((H, W), np.uint8)
    mask[20:40, 20:40] = 1

    # shared-state run: reverse then forward (cond at frame 3)
    state = pred.init_state(frames)
    pred.add_new_mask(state, 3, obj_id=1, mask=mask)
    rev = {fi: lg for fi, _, lg, _ in
           pred.propagate_in_video(state, reverse=True)}
    assert sorted(rev) == [0, 1, 2, 3]
    # conditioning frame lives in cond_outputs, tracked frames in mem_bank
    assert set(state.mem_bank) == {0, 1, 2}
    assert set(state.cond_outputs) == {3}
    fwd_shared = {fi: lg for fi, _, lg, _ in pred.propagate_in_video(state)}

    # fresh-state forward only (no reverse memories available)
    state2 = pred.init_state(frames)
    pred.add_new_mask(state2, 3, obj_id=1, mask=mask)
    fwd_fresh = {fi: lg for fi, _, lg, _ in pred.propagate_in_video(state2)}

    # frame 4's memory slots include frames 2/1/0 only in the shared run,
    # so its logits must differ; the cond frame itself is identical
    np.testing.assert_array_equal(fwd_shared[3], fwd_fresh[3])
    assert not np.allclose(fwd_shared[4], fwd_fresh[4])
    # re-prompting an EXISTING object invalidates only the prompted frame's
    # conditioning output (external-predictor semantics: other cond frames
    # + tracked outputs are reused; the frame's tracked output is consumed
    # by consolidation at the next propagate)
    pred.add_new_mask(state, 0, obj_id=1, mask=mask)
    assert 0 not in state.cond_outputs
    assert 3 in state.cond_outputs and 1 in state.mem_bank
    # a NEW object invalidates everything (its rows in earlier outputs
    # would be garbage)
    pred.add_new_mask(state, 0, obj_id=2, mask=mask)
    assert state.mem_bank is None and state.cond_outputs is None


def test_track_step_no_retrace_across_lengths_and_patterns(pred, rng):
    """The fused track step must compile exactly once per predictor config:
    its signature must not vary with clip length T (frame features are
    sliced by the separate frame_feats jit) nor with the memory-slot fill
    pattern (zero pads share the real entries' dtype). Re-tracing the
    largest jit per frame/clip silently dominated eval wall-clock before
    this was pinned."""
    base = pred._track_step._cache_size()
    for T in (4, 6):
        frames = rng.integers(0, 255, (T, 64, 80, 3), dtype=np.uint8)
        state = pred.init_state(frames.astype(np.uint8))
        pred.add_new_points_or_box(state, 0, 1, points=[[40, 32]],
                                   labels=[1])
        for _ in pred.propagate_in_video(state):
            pass
    # early frames have mostly-empty slot patterns, later ones full; two
    # clip lengths were run — still exactly one new track_step trace
    assert pred._track_step._cache_size() <= base + 1
    # and the only per-T recompiles happen in the tiny slicer
    assert pred._frame_feats._cache_size() >= 2


def test_track_step_no_retrace_bf16_slot_patterns(rng):
    """Same pin under bfloat16 compute (the TPU setting): memory-bank
    entries are bf16 there, so f32 zero pads would make every slot
    fill/empty pattern a fresh jit signature."""
    cfg = SAM2Config(image_size=128, compute_dtype="bfloat16",
                     use_activation_checkpoint=False)
    params = sam2_mod.init(jax.random.PRNGKey(0), cfg)
    p = VideoPredictor(params, cfg, max_objects=2)
    frames = rng.integers(0, 255, (5, 64, 80, 3), dtype=np.uint8)
    state = p.init_state(frames)
    p.add_new_points_or_box(state, 0, 1, points=[[40, 32]], labels=[1])
    for _ in p.propagate_in_video(state):
        pass
    assert p._track_step._cache_size() == 1
