"""Lockstep batched video propagation: track G same-shape clips at once.

The sequential ``VideoPredictor`` pays one device round trip per frame per
clip; on RTT-bound links (the reference eval loops over hundreds of short
clips, inference.py:657-767) that dominates wall clock. This predictor
tracks a GROUP of G clips in lockstep — one fused jitted step per lockstep
frame index, G videos' logits fetched together — cutting round trips by ~G.

Requirements for a group (exactly what the reference's fixed-``clip_length``
scheduler produces): same frame count, same original resolution, the same
single prompt frame index, and the same propagation direction. Memory-slot
selection (eval r-stride rules, sam2_base.py:565-595) then picks the SAME
frame indices for every video in the group, so the memory bank simply gains
a leading G dimension and the tracking step ``jax.vmap``s over it — no
per-video gathers, no dynamic shapes.

Numerics are identical to the sequential predictor (the equivalence is
pinned by tests/test_batched_predictor.py); clips that don't fit a group
(odd lengths at video boundaries, multi-prompt-frame merges) fall back to
the sequential path in the runner.
"""

from __future__ import annotations

import dataclasses
from collections import deque
from functools import partial
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..data.coco import IMAGENET_MEAN, IMAGENET_STD
from ..models import sam2 as sam2_mod
from ..models.sam2 import SAM2Config
from ..models.video_model import _use_multimask
from ..ops.resize import resize_bilinear
from .predictor import _jit_bundle, _resize_frames_into


@dataclasses.dataclass
class GroupState:
    group_size: int
    num_frames: int
    orig_hw: tuple[int, int]
    feats: tuple            # (s0 [G,T,...], s1, s16) on device
    prompts: list           # per video: {obj_id: payload}
    obj_order: list         # per video: [obj_id, ...]
    cond_frame_idx: int | None = None   # shared prompt frame (relative)
    cond_cache: tuple | None = None
    mem_bank: dict | None = None        # frame -> (mem [G,O,HW,md],
                                        #           ptr [G,O,C])


class BatchedVideoPredictor:
    """Same API shape as ``VideoPredictor`` but over a group of G clips.
    One conditioning frame per group (the reference clip schedulers'
    contract); use the sequential predictor for interactive flows."""

    def __init__(self, params, cfg: SAM2Config, max_objects: int = 8,
                 group_size: int = 4, encode_chunk: int = 8):
        self.params = params
        self.cfg = cfg
        self.max_objects = max_objects
        self.group_size = group_size
        self.encode_chunk = encode_chunk
        self._const_cache: dict = {}
        self._zero_cache: dict = {}
        self._mem_pos_flat = None
        self._build_jitted()

    # -- jitted device functions ---------------------------------------------

    def _build_jitted(self):
        """Fetch (or build) the shared jitted-function bundle — same
        module-level cache pattern as VideoPredictor._build_jitted (params
        are jit arguments, so same-config instances share traces)."""
        bundle = _jit_bundle(
            ("grp", self.cfg, self.max_objects, self.group_size),
            self._make_jitted)
        (self._encode, self._prompt_step, self._mask_prompt_step,
         self._track_step, self._lowres_pack, self._frame_feats,
         self._curr_pos, self._layout) = bundle

    def _make_jitted(self):
        cfg = self.cfg
        G = self.group_size
        O = self.max_objects
        S = cfg.image_size
        HW = cfg.num_spatial_tokens
        F = cfg.feat_size
        C = cfg.d_model

        @jax.jit
        def encode(params, images_u8):
            x = images_u8.astype(jnp.float32) / 255.0
            x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
            out = sam2_mod.forward_image(params, cfg, x, allow_fused=True)
            return tuple(out["backbone_fpn"])

        def _posenc():
            from ..ops.position_encoding import sine_pe_2d
            return sine_pe_2d(F, F, C).reshape(HW, C)

        curr_pos = _posenc()

        def _one_point_prompt(params, s0, s1, s16, coords, labels,
                              multimask):
            feats = jnp.broadcast_to(s16[None], (O,) + s16.shape)
            hr = (jnp.broadcast_to(s0[None], (O,) + s0.shape),
                  jnp.broadcast_to(s1[None], (O,) + s1.shape))
            pix = feats + params["no_mem_embed"].reshape(
                1, 1, 1, C).astype(feats.dtype)
            out = sam2_mod.forward_sam_heads(
                params, cfg, pix, point_coords=coords,
                point_labels=labels, high_res_features=hr,
                multimask_output=multimask, training=False)
            mem, mem_pos = sam2_mod.encode_new_memory(
                params, cfg, feats, out["high_res_masks"],
                out["object_score_logits"], training=False,
                apply_non_overlap=cfg.non_overlap_masks_for_mem_enc)
            return (out["low_res_masks"], out["obj_ptr"],
                    mem.reshape(O, HW, cfg.mem_dim), mem_pos)

        @partial(jax.jit, static_argnums=(6,))
        def prompt_step(params, s0, s1, s16, coords, labels, multimask):
            """coords [G, O, P, 2], labels [G, O, P] -> per-video prompt
            outputs (lowres [G,O,1,S/4,S/4], ptr [G,O,C], mem [G,O,HW,md]).
            params is a jit ARGUMENT (not a closure): restored checkpoints
            arrive as host numpy and must be traced, not captured."""
            fn = partial(_one_point_prompt, params, multimask=multimask)
            return jax.vmap(fn)(s0, s1, s16, coords, labels)

        def _one_mask_prompt(params, s0, s1, s16, masks):
            feats = jnp.broadcast_to(s16[None], (O,) + s16.shape)
            hr = (jnp.broadcast_to(s0[None], (O,) + s0.shape),
                  jnp.broadcast_to(s1[None], (O,) + s1.shape))
            if cfg.use_mask_input_as_output_without_sam:
                out = sam2_mod.use_mask_as_output(
                    params, cfg, feats, hr, masks[..., None],
                    training=False)
            else:
                pix = feats + params["no_mem_embed"].reshape(
                    1, 1, 1, C).astype(feats.dtype)
                out = sam2_mod.forward_sam_heads(
                    params, cfg, pix, mask_inputs=masks[..., None],
                    high_res_features=hr, training=False)
            mem, mem_pos = sam2_mod.encode_new_memory(
                params, cfg, feats, out["high_res_masks"],
                out["object_score_logits"], training=False,
                apply_non_overlap=cfg.non_overlap_masks_for_mem_enc)
            return (out["low_res_masks"], out["obj_ptr"],
                    mem.reshape(O, HW, cfg.mem_dim), mem_pos)

        @jax.jit
        def mask_prompt_step(params, s0, s1, s16, masks):
            """masks [G, O, S, S] -> per-video prompt outputs."""
            return jax.vmap(partial(_one_mask_prompt, params))(
                s0, s1, s16, masks)

        M = cfg.num_maskmem
        P = cfg.max_obj_ptrs_in_encoder if cfg.use_obj_ptrs_in_encoder else 0
        layout = sam2_mod.MemoryLayout(
            num_maskmem=M, tokens_per_slot=HW, num_ptrs=P,
            tokens_per_ptr=cfg.ptr_tokens_per_obj)

        def _one_track(params, s0, s1, s16, spatial_mem, obj_ptrs,
                       spatial_valid, tpos_index, ptr_valid, ptr_tpos,
                       t_diff_max, mem_pos):
            curr = jnp.broadcast_to(s16.reshape(1, HW, C), (O, HW, C))
            fused = sam2_mod.fuse_memory(
                params, cfg, layout, curr, curr_pos, spatial_mem,
                spatial_valid, mem_pos, tpos_index, obj_ptrs, ptr_valid,
                ptr_tpos, training=False, t_diff_max=t_diff_max)
            fused = fused.reshape(O, F, F, C)
            hr = (jnp.broadcast_to(s0[None], (O,) + s0.shape),
                  jnp.broadcast_to(s1[None], (O,) + s1.shape))
            out = sam2_mod.forward_sam_heads(
                params, cfg, fused, high_res_features=hr,
                multimask_output=False, training=False)
            feats = jnp.broadcast_to(s16[None], (O,) + s16.shape)
            mem, _ = sam2_mod.encode_new_memory(
                params, cfg, feats, out["high_res_masks"],
                out["object_score_logits"], training=False,
                apply_non_overlap=cfg.non_overlap_masks_for_mem_enc)
            return (out["low_res_masks"], out["obj_ptr"],
                    mem.reshape(O, HW, cfg.mem_dim))

        @jax.jit
        def frame_feats(feats, t):
            """Slice lockstep frame t's features from the full [G, T, ...]
            arrays in one device call. Separate from track_step so the big
            fused step's compile signature is independent of clip length T
            (only this tiny slicer recompiles per distinct T)."""
            return tuple(jax.lax.dynamic_index_in_dim(x, t, axis=1,
                                                      keepdims=False)
                         for x in feats)

        @partial(jax.jit, static_argnums=(11, 12))
        def track_step(params, s0, s1, s16, mem_slots, ptr_rows,
                       spatial_valid, tpos_index, ptr_valid, ptr_tpos,
                       t_diff_max, orig_hw, n_obj, mem_pos):
            """mem_slots: M-tuple of [G, O, HW, md]; ptr_rows: P-tuple of
            [G, O, C] — stacked HERE, inside jit, so the per-frame host loop
            issues no eager device ops (each pays a tunnel RTT on the remote
            backend). All slot entries share one dtype (compute dtype, zero
            pads included) so the compile signature does not vary with the
            slot-validity pattern. The validity/tpos vectors are SHARED
            across the group (lockstep schedule => identical slot
            selection)."""
            spatial_mem = jnp.stack(mem_slots, axis=1)
            obj_ptrs = jnp.stack(ptr_rows, axis=1)
            fn = partial(_one_track, params,
                         spatial_valid=spatial_valid,
                         tpos_index=tpos_index, ptr_valid=ptr_valid,
                         ptr_tpos=ptr_tpos, t_diff_max=t_diff_max,
                         mem_pos=mem_pos)
            lowres, ptr, mem = jax.vmap(fn)(s0, s1, s16, spatial_mem,
                                            obj_ptrs)
            packed, score = _pack(lowres, orig_hw, n_obj)
            return ptr, mem, packed, score

        def _pack(lowres, orig_hw, n_obj):
            """[G, O, 1, S/4, S/4] low-res logits -> f16 [G, n_obj, ...] +
            exact-parity score (mean sigmoid over the orig-res upsample),
            fetched for the whole group in one transfer. Low-res is the
            external predictor's stored mask resolution — fetching it keeps
            the group payload 16x smaller than model-res logits, which is
            what makes batching win on bandwidth-bound links."""
            sel = lowres[:, :n_obj].astype(jnp.float32)
            up = resize_bilinear(sel.reshape((-1,) + sel.shape[2:]), orig_hw)
            score = jnp.mean(jax.nn.sigmoid(up), axis=(1, 2, 3))
            return (sel.astype(jnp.float16),
                    score.reshape(lowres.shape[0], n_obj))

        @partial(jax.jit, static_argnums=(1, 2))
        def lowres_pack(lowres, orig_hw, n_obj):
            """Conditioning-frame yield (same packing as tracked frames)."""
            return _pack(lowres, orig_hw, n_obj)

        return (encode, prompt_step, mask_prompt_step, track_step,
                lowres_pack, frame_feats, curr_pos, layout)

    # -- public API -----------------------------------------------------------

    def init_group(self, frames: np.ndarray) -> GroupState:
        """frames: [G, T, H, W, 3] uint8. All clips share one resolution and
        length (group them on the host; see InferenceRunner batching)."""
        G, T, H, W, _ = frames.shape
        if G != self.group_size:
            raise ValueError(f"group has {G} videos, predictor was built "
                             f"for group_size={self.group_size}")
        S = self.cfg.image_size
        flat = frames.reshape(G * T, H, W, 3)
        small = np.empty((G * T, S, S, 3), np.uint8)
        _resize_frames_into(small, flat, S)
        chunks = []
        for i in range(0, G * T, self.encode_chunk):
            chunks.append(self._encode(self.params,
                                       jnp.asarray(small[i:i + self.encode_chunk])))
        feats = tuple(
            jnp.concatenate([c[j] for c in chunks], axis=0).reshape(
                (G, T) + chunks[0][j].shape[1:])
            for j in range(3))
        return GroupState(group_size=G, num_frames=T, orig_hw=(H, W),
                          feats=feats, prompts=[{} for _ in range(G)],
                          obj_order=[[] for _ in range(G)])

    def _zeros_const(self, shape, dtype=jnp.float32):
        """Cached device zeros — memory-slot / pointer padding rows are
        reused every frame, so allocate them once instead of paying an
        eager-dispatch RTT per propagation step."""
        key = (shape, jnp.dtype(dtype).str)
        out = self._zero_cache.get(key)
        if out is None:
            out = jnp.zeros(shape, dtype)
            self._zero_cache[key] = out
        return out

    def _dev_const(self, arr: np.ndarray):
        key = (arr.dtype.str, arr.shape, arr.tobytes())
        out = self._const_cache.get(key)
        if out is None:
            out = jnp.asarray(arr)
            self._const_cache[key] = out
        return out

    def _scale_points(self, points, orig_hw):
        h, w = orig_hw
        s = self.cfg.image_size
        pts = np.asarray(points, np.float32).reshape(-1, 2).copy()
        pts[:, 0] *= s / w
        pts[:, 1] *= s / h
        return pts

    def add_new_points_or_box(self, state: GroupState, video_idx: int,
                              frame_idx: int, obj_id, points=None,
                              labels=None, box=None):
        if box is not None:
            pts = self._scale_points(
                np.asarray(box, np.float32).reshape(2, 2), state.orig_hw)
            lbl = np.asarray([2, 3], np.int32)
        else:
            pts = self._scale_points(points, state.orig_hw)
            lbl = np.asarray(labels, np.int32).reshape(-1)
        self._add(state, video_idx, frame_idx, obj_id, ("points", pts, lbl))

    def add_new_mask(self, state: GroupState, video_idx: int, frame_idx: int,
                     obj_id, mask: np.ndarray):
        s = self.cfg.image_size
        from PIL import Image
        m = Image.fromarray((np.asarray(mask) > 0).astype(np.uint8) * 255)
        m = m.resize((s, s), Image.BILINEAR)
        self._add(state, video_idx, frame_idx, obj_id,
                  ("mask", (np.asarray(m) > 127).astype(np.float32), None))

    def _add(self, state, video_idx, frame_idx, obj_id, payload):
        if state.cond_frame_idx is not None and \
                frame_idx != state.cond_frame_idx:
            raise ValueError(
                "batched groups share ONE prompt frame; got prompts at "
                f"{state.cond_frame_idx} and {frame_idx} — use the "
                "sequential VideoPredictor for multi-frame prompting")
        if obj_id not in state.obj_order[video_idx]:
            if len(state.obj_order[video_idx]) >= self.max_objects:
                raise ValueError(
                    f"more than max_objects={self.max_objects} objects")
            state.obj_order[video_idx].append(obj_id)
        state.prompts[video_idx][obj_id] = payload
        state.cond_frame_idx = frame_idx
        state.cond_cache = None
        state.mem_bank = None

    # -- conditioning ----------------------------------------------------------

    def _run_cond_frame(self, state: GroupState):
        """Prompt step for all videos' prompted objects at the shared cond
        frame. Mask and point prompts may mix ACROSS videos and objects;
        per-object rows are merged like the sequential predictor."""
        cfg = self.cfg
        G, O, S = state.group_size, self.max_objects, cfg.image_size
        f = state.cond_frame_idx
        assert f is not None, "no prompts added"
        s0, s1, s16 = (x[:, f] for x in state.feats)

        has_mask = np.zeros((G, O), bool)
        has_pts = np.zeros((G, O), bool)
        maxp = 1
        for g in range(G):
            for i, o in enumerate(state.obj_order[g]):
                kind = state.prompts[g][o][0]
                if kind == "mask":
                    has_mask[g, i] = True
                else:
                    has_pts[g, i] = True
                    maxp = max(maxp, len(state.prompts[g][o][1]))

        results = []
        if has_mask.any():
            masks = np.zeros((G, O, S, S), np.float32)
            for g in range(G):
                for i, o in enumerate(state.obj_order[g]):
                    if has_mask[g, i]:
                        masks[g, i] = state.prompts[g][o][1]
            results.append((has_mask, self._mask_prompt_step(
                self.params, s0, s1, s16, jnp.asarray(masks))))
        if has_pts.any():
            coords = np.zeros((G, O, maxp, 2), np.float32)
            labels = -np.ones((G, O, maxp), np.int32)
            for g in range(G):
                for i, o in enumerate(state.obj_order[g]):
                    if has_pts[g, i]:
                        _, pts, lbl = state.prompts[g][o]
                        coords[g, i, : len(pts)] = pts
                        labels[g, i, : len(pts)] = lbl
            results.append((has_pts, self._prompt_step(
                self.params, s0, s1, s16, jnp.asarray(coords),
                jnp.asarray(labels), _use_multimask(cfg, True, maxp))))

        if len(results) == 1:
            return results[0][1]
        sel = jnp.asarray(results[0][0])  # True -> mask-pass row

        def merge(a, b):
            s = sel.reshape(sel.shape + (1,) * (a.ndim - 2))
            return jnp.where(s, a, b)

        (_, (h_m, p_m, m_m, pos_m)), (_, (h_p, p_p, m_p, _)) = results
        return merge(h_m, h_p), merge(p_m, p_p), merge(m_m, m_p), pos_m

    # -- propagation ------------------------------------------------------------

    def propagate_in_group(self, state: GroupState, reverse: bool = False
                           ) -> Iterator[tuple]:
        """Yields (frame_idx, obj_ids [G lists], logits
        [G, n_max, 1, S/4, S/4] f16 numpy, score [G, n_max]) — one fused
        device step and ONE low-res fetch per lockstep frame for the whole
        group. Rows past a video's real object count are padding; slice per
        video with len(obj_ids[g]).

        Conditioning outputs and memory bank persist across calls, matching
        the sequential predictor (reverse-then-forward shares memories)."""
        f = state.cond_frame_idx
        T = state.num_frames
        if state.cond_cache is None:
            state.cond_cache = self._run_cond_frame(state)
            state.mem_bank = {}
        lowres, cond_ptr, cond_mem, mem_pos = state.cond_cache
        n_max = max((len(o) for o in state.obj_order), default=0)
        obj_ids = [list(o) for o in state.obj_order]
        mem_bank = state.mem_bank
        mem_pos_flat = mem_pos[0].reshape(-1, self.cfg.mem_dim)

        frame_order = ([f] + list(range(f - 1, -1, -1)) if reverse
                       else [f] + list(range(f + 1, T)))

        def dispatch(t):
            if t == f:
                return self._lowres_pack(lowres, state.orig_hw, n_max)
            slots, ptrs, sv, tpos, pv, pt, tdm = self._assemble_memory(
                state, mem_bank, cond_mem, cond_ptr, t, f, reverse)
            s0, s1, s16 = self._frame_feats(state.feats, np.int32(t))
            new_ptr, new_mem, packed, score = self._track_step(
                self.params, s0, s1, s16, slots, ptrs, sv,
                tpos, pv, pt, self._dev_const(np.float32(tdm)),
                state.orig_hw, n_max, mem_pos_flat)
            mem_bank[t] = (new_mem, new_ptr)
            return packed, score

        # software pipeline, depth 3: several device steps stay in flight
        # while the host fetches/reconstructs earlier frames — the memory
        # bank entries consumed by dispatch are device futures, so queuing
        # ahead never synchronizes (the only syncs are the yields' fetches).
        # D2H copies are scheduled at dispatch time (copy_to_host_async) so
        # transfers ride behind compute instead of blocking the pop.
        def _prefetch(out):
            for a in out:
                try:
                    a.copy_to_host_async()
                except Exception:  # backend without async host copy
                    break
            return out

        pending: deque = deque()
        for t in frame_order:
            pending.append((t, _prefetch(dispatch(t))))
            if len(pending) > 3:
                pt_, (pk, sc) = pending.popleft()
                yield (pt_, obj_ids, np.asarray(pk), np.asarray(sc))
        while pending:
            pt_, (pk, sc) = pending.popleft()
            yield (pt_, obj_ids, np.asarray(pk), np.asarray(sc))

    def _assemble_memory(self, state, mem_bank, cond_mem, cond_ptr,
                         frame_idx, cond_f, reverse):
        """Same eval slot rules as VideoPredictor._assemble_memory
        (sam2_base.py:549-675) — selection is per-frame-index, shared by the
        whole group; only the slot CONTENTS carry the G dimension.
        Equivalence with the sequential predictor is pinned by
        tests/test_batched_predictor.py."""
        cfg = self.cfg
        G, O = state.group_size, self.max_objects
        HW = cfg.num_spatial_tokens
        M = cfg.num_maskmem
        r = max(cfg.memory_temporal_stride_for_eval, 1)

        slots = [cond_mem]
        valid = [True]
        # pads share the real entries' dtype (compute dtype) so the slot
        # tuple's jit signature is one per config, not per fill pattern
        zero = self._zeros_const((G, O, HW, cfg.mem_dim), cfg.dtype())
        for t_pos in range(1, M):
            t_rel = M - t_pos
            if t_rel == 1:
                prev = frame_idx + 1 if reverse else frame_idx - 1
            else:
                if not reverse:
                    prev = ((frame_idx - 2) // r) * r - (t_rel - 2) * r
                else:
                    prev = -(-(frame_idx + 2) // r) * r + (t_rel - 2) * r
            entry = mem_bank.get(prev) if prev != cond_f else None
            if entry is None:
                slots.append(zero)
                valid.append(False)
            else:
                slots.append(entry[0])
                valid.append(True)
        tpos_index = [M - 1] + [M - t_pos - 1 for t_pos in range(1, M)]
        spatial_valid = self._dev_const(np.asarray(valid))
        tpos_idx = self._dev_const(np.asarray(tpos_index, np.int32))

        P = self._layout.num_ptrs
        # pointer rows are ALWAYS f32 (forward_sam_heads casts obj_ptr to
        # f32, sam2.py:370) — pads must match or the fill pattern would
        # change the jit signature
        zero_ptr = self._zeros_const((G, O, cfg.d_model))
        ptr_rows = [zero_ptr] * P
        pvalid = np.zeros((P,), bool)
        ptpos = np.zeros((P,), np.float32)
        if P > 0:
            max_ptrs = min(state.num_frames, cfg.max_obj_ptrs_in_encoder)
            sign = -1.0 if reverse else 1.0
            idx = 0
            include_cond = (cond_f >= frame_idx if reverse
                            else cond_f <= frame_idx) or \
                not cfg.only_obj_ptrs_in_the_past_for_eval
            if include_cond:
                ptr_rows[idx] = cond_ptr
                pvalid[idx] = True
                ptpos[idx] = ((frame_idx - cond_f) * sign
                              if cfg.use_signed_tpos_enc_to_obj_ptrs
                              else abs(frame_idx - cond_f))
                idx += 1
            for t_diff in range(1, max_ptrs):
                t = frame_idx + t_diff if reverse else frame_idx - t_diff
                if t < 0 or t >= state.num_frames:
                    break
                entry = mem_bank.get(t)
                if entry is not None and t != cond_f and idx < P:
                    ptr_rows[idx] = entry[1]
                    pvalid[idx] = True
                    ptpos[idx] = t_diff
                    idx += 1
            t_diff_max = max(max_ptrs - 1, 1)
        else:
            t_diff_max = 1
        return (tuple(slots), tuple(ptr_rows), spatial_valid, tpos_idx,
                self._dev_const(pvalid), self._dev_const(ptpos), t_diff_max)
