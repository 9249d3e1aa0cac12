"""Streaming video predictor: init_state / add_new_points_or_box /
add_new_mask / propagate_in_video (bidirectional, multi-conditioning-frame).

This replaces the external ``sam2.build_sam2_video_predictor`` capability the
reference relies on (SURVEY.md §3.2 note): the same SAM2 core drives it, with
a TPU-friendly split — a handful of jitted fixed-shape device functions
(batch image encode, prompted conditioning step, memory-conditioned tracking
step, cross-object memory consolidation) reused across every clip/video,
while the *host* owns the fiddly dynamic logic: which frames occupy which
memory slot (eval-time r-stride sampling, sam2_base.py:565-595),
closest-conditioning-frame selection (sam2_base.py:555-560), past-only
object-pointer selection (sam2_base.py:618-647), reverse tracking, and
original-resolution mask resizing.

Eval frame preprocessing matches the external predictor: squash-resize to
image_size x image_size (NO aspect-preserving crop — unlike training) and
ImageNet-normalize; output logits are upsampled back to the original video
resolution on the host.

Multi-conditioning frames: prompts may target several frames. Each prompted
frame becomes a conditioning frame; during tracking, the ``max_cond_frames``
temporally closest conditioning memories attend at temporal position 0
(sam2_base.py:555-561), unselected ones fill r-stride slots / pointer rows
like non-conditioning frames (sam2_base.py:592-595, 643-647). When objects
are prompted on different frames, each conditioning frame's memory is
consolidated across all objects the way the external predictor's preflight
does: unprompted objects take their previously tracked masks if the frame was
tracked, else a NO_OBJ placeholder mask (logits -1024), a dummy object score
of +10, and an "empty mask" pointer obtained by running the SAM heads on an
all-zero mask prompt. ``max_cond_frames`` is a compile-time slot budget
(default 1 keeps the single-conditioning compiled shapes); construct the
predictor with ``max_cond_frames=N`` to attend to several.

One deliberate divergence, shared with our training path: when ALL objects
are prompted on a conditioning frame, its memory is encoded from the SAM
head's native image-resolution mask logits (exactly like training,
sam2_base.py:715-769) instead of the external predictor's
upsample-of-low-res round trip; the two are bit-identical for point/box
prompts and differ only sub-pixel for mask prompts.
"""

from __future__ import annotations

import dataclasses
from collections import deque
from functools import partial
from typing import Iterator, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.coco import IMAGENET_MEAN, IMAGENET_STD
from ..models import sam2 as sam2_mod
from ..models.sam2 import NO_OBJ_SCORE, SAM2Config
from ..ops.resize import resize_bilinear
from .utils import select_closest_cond_frames


try:
    import cv2 as _cv2
except Exception:  # pragma: no cover
    _cv2 = None

# jitted-function bundles shared across predictor instances (sequential AND
# batched — see _build_jitted in each). Grows by one entry per distinct
# config a process actually uses; entries hold traces/executables/constants
# deliberately for the process lifetime.
_JIT_BUNDLES: dict = {}


def _jit_bundle(key, make):
    bundle = _JIT_BUNDLES.get(key)
    if bundle is None:
        bundle = make()
        _JIT_BUNDLES[key] = bundle
    return bundle


_HOST_POOL = None


def host_pool():
    """Shared 8-thread pool for GIL-releasing host work (image decode,
    frame resize) — one process-wide pool instead of per-call or
    per-runner executors (which leak threads across repeated
    ``inference()`` calls)."""
    global _HOST_POOL
    if _HOST_POOL is None:
        from concurrent.futures import ThreadPoolExecutor
        _HOST_POOL = ThreadPoolExecutor(max_workers=8)
    return _HOST_POOL


def _resize_frame(frame: np.ndarray, size: int) -> np.ndarray:
    """Squash-resize one RGB uint8 frame to size x size (bilinear)."""
    if _cv2 is not None:
        return _cv2.resize(frame, (size, size),
                           interpolation=_cv2.INTER_LINEAR)
    from PIL import Image
    return np.asarray(Image.fromarray(frame).resize((size, size),
                                                    Image.BILINEAR))


def _resize_frames_into(out: np.ndarray, frames, size: int) -> None:
    """Resize a batch of frames into ``out`` with a thread pool (cv2.resize
    releases the GIL; at 1024x1280 sources the sequential loop is a real
    chunk of eval wall clock)."""
    n = len(frames)
    if n <= 2:
        for i in range(n):
            out[i] = _resize_frame(frames[i], size)
        return

    def work(i):
        out[i] = _resize_frame(frames[i], size)

    list(host_pool().map(work, range(n)))


def logits_to_orig(logits: np.ndarray, orig_hw, want_probs: bool = False):
    """Host-side original-resolution reconstruction from model-resolution
    logits [n, 1, h', w'] (any model resolution — the predictor yields S/4
    low-res): bilinear upsample then threshold at 0 (the external
    predictor's semantics). Returns (mask bool [n, 1, h, w], probs f16 or
    None)."""
    h, w = orig_hw
    n = logits.shape[0]
    masks = np.empty((n, 1, h, w), bool)
    probs = np.empty((n, 1, h, w), np.float16) if want_probs else None
    for i in range(n):
        lg = np.asarray(logits[i, 0], np.float32)
        if _cv2 is not None:
            up = _cv2.resize(lg, (w, h), interpolation=_cv2.INTER_LINEAR)
        else:
            from PIL import Image
            up = np.asarray(Image.fromarray(lg).resize((w, h),
                                                       Image.BILINEAR))
        masks[i, 0] = up > 0.0
        if want_probs:
            probs[i, 0] = (1.0 / (1.0 + np.exp(-up))).astype(np.float16)
    return masks, probs


class CondOutput(NamedTuple):
    """Consolidated conditioning-frame output (all device arrays)."""
    lowres: object          # [O, 1, S/4, S/4] f32 mask logits
    mem: object             # [O, HW, mem_dim] encoded memory
    ptr: object             # [O, C] object pointers
    score: object           # [O, 1] object score logits
    was_tracked: bool = False   # frame had a tracked output before it was
                                # prompted (reference obj_frames_tracked):
                                # further clicks keep refining it


class TrackedOutput(NamedTuple):
    """Per-tracked-frame outputs kept on device for memory assembly and for
    consolidating later-prompted conditioning frames."""
    mem: object             # [O, HW, mem_dim]
    ptr: object             # [O, C]
    lowres: object = None   # [O, 1, S/4, S/4] f16 mask logits
    score: object = None    # [O, 1] object score logits


@dataclasses.dataclass
class InferenceState:
    num_frames: int
    orig_hw: tuple[int, int]
    feats: tuple            # (s0 [T,...], s1 [T,...], s16 [T,...]) on device
    prompts: dict           # frame_idx -> {obj_id: payload}
    obj_order: list         # obj_ids in insertion order
    cond_frame_idx: int | None = None      # most recently prompted frame
    cond_outputs: dict | None = None       # frame -> CondOutput, persists
    mem_bank: dict | None = None           # frame -> TrackedOutput, persists
                                           # across propagate calls


class VideoPredictor:
    def __init__(self, params, cfg: SAM2Config, max_objects: int = 8,
                 encode_chunk: int = 8, max_cond_frames: int = 1):
        self.params = params
        self.cfg = cfg
        self.max_objects = max_objects
        self.encode_chunk = encode_chunk
        if max_cond_frames < 1:
            raise ValueError("max_cond_frames must be >= 1")
        self.max_cond_frames = max_cond_frames
        self._const_cache: dict = {}
        self._zero_cache: dict = {}
        self._mem_pos_flat = None
        self._build_jitted()

    # -- jitted device functions (compiled once, reused across videos) ------

    def _build_jitted(self):
        """Fetch (or build) the jitted-function bundle for this predictor's
        configuration. Bundles are cached at module level keyed by the
        (hashable) config — params are jit ARGUMENTS, not closures, so
        instances with the same architecture share traces and compiled
        executables. This makes repeated ``inference()`` calls (e.g.
        baseline_eval's 21 combos, threshold sweeps) skip ~a minute of
        re-tracing each."""
        bundle = _jit_bundle(
            ("seq", self.cfg, self.max_objects, self.max_cond_frames),
            self._make_jitted)
        (self._encode, self._prompt_step, self._mask_prompt_step,
         self._track_step, self._correction_step, self._consolidate_mem,
         self._lowres_pack, self._frame_feats, self._curr_pos,
         self._layout) = bundle

    def _make_jitted(self):
        cfg = self.cfg
        O = self.max_objects
        S = cfg.image_size
        HW = cfg.num_spatial_tokens
        F = cfg.feat_size
        C = cfg.d_model

        @jax.jit
        def encode(params, images_u8):
            """images_u8: [B, S, S, 3] uint8 (host pre-resized — uploading
            original-res frames through the TPU tunnel dominated eval time)
            -> normalized backbone features."""
            x = images_u8.astype(jnp.float32) / 255.0
            x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
            out = sam2_mod.forward_image(params, cfg, x, allow_fused=True)
            return tuple(out["backbone_fpn"])

        def _posenc():
            from ..ops.position_encoding import sine_pe_2d
            return sine_pe_2d(F, F, C).reshape(HW, C)

        curr_pos = _posenc()

        @partial(jax.jit, static_argnums=(7,))
        def prompt_step(params, s0, s1, s16, point_coords, point_labels,
                        obj_valid, multimask):
            """Conditioning-frame step with point/box prompts.
            s*: single-frame features; coords [O, P, 2] in model pixels."""
            feats = jnp.broadcast_to(s16[None], (O,) + s16.shape)
            hr = (jnp.broadcast_to(s0[None], (O,) + s0.shape),
                  jnp.broadcast_to(s1[None], (O,) + s1.shape))
            pix = feats + params["no_mem_embed"].reshape(1, 1, 1, C).astype(
                feats.dtype)
            out = sam2_mod.forward_sam_heads(
                params, cfg, pix, point_coords=point_coords,
                point_labels=point_labels, high_res_features=hr,
                multimask_output=multimask, training=False)
            mem, mem_pos = sam2_mod.encode_new_memory(
                params, cfg, feats, out["high_res_masks"],
                out["object_score_logits"], training=False,
                apply_non_overlap=cfg.non_overlap_masks_for_mem_enc)
            return out, mem.reshape(O, HW, cfg.mem_dim), mem_pos

        @jax.jit
        def mask_prompt_step(params, s0, s1, s16, mask_inputs, obj_valid):
            """Conditioning step with mask prompts: mask-as-output bypass
            (sam2_base.py:799-809 always applies at eval)."""
            feats = jnp.broadcast_to(s16[None], (O,) + s16.shape)
            hr = (jnp.broadcast_to(s0[None], (O,) + s0.shape),
                  jnp.broadcast_to(s1[None], (O,) + s1.shape))
            if cfg.use_mask_input_as_output_without_sam:
                out = sam2_mod.use_mask_as_output(
                    params, cfg, feats, hr, mask_inputs[..., None],
                    training=False)
            else:
                pix = feats + params["no_mem_embed"].reshape(1, 1, 1, C
                                                             ).astype(feats.dtype)
                out = sam2_mod.forward_sam_heads(
                    params, cfg, pix, mask_inputs=mask_inputs[..., None],
                    high_res_features=hr, training=False)
            mem, mem_pos = sam2_mod.encode_new_memory(
                params, cfg, feats, out["high_res_masks"],
                out["object_score_logits"], training=False,
                apply_non_overlap=cfg.non_overlap_masks_for_mem_enc)
            return out, mem.reshape(O, HW, cfg.mem_dim), mem_pos

        M = cfg.num_maskmem
        # extra conditioning slots beyond the first enlarge both the spatial
        # memory and the pointer budget; max_cond_frames=1 keeps the exact
        # single-conditioning compiled shapes
        n_cond = self.max_cond_frames
        P = ((cfg.max_obj_ptrs_in_encoder + n_cond - 1)
             if cfg.use_obj_ptrs_in_encoder else 0)
        layout = sam2_mod.MemoryLayout(
            num_maskmem=M + n_cond - 1, tokens_per_slot=HW,
            num_ptrs=P, tokens_per_ptr=cfg.ptr_tokens_per_obj)

        @jax.jit
        def frame_feats(feats, t):
            """Slice frame t's features from the full [T, ...] arrays in one
            device call (vs three eager slices paying a tunnel RTT each).
            Kept SEPARATE from track_step so the big fused step's compile
            signature stays independent of clip length T — only this tiny
            3-slice program recompiles per distinct T."""
            return tuple(jax.lax.dynamic_index_in_dim(x, t, axis=0,
                                                      keepdims=False)
                         for x in feats)

        @partial(jax.jit, static_argnums=(11, 12))
        def track_step(params, s0, s1, s16, mem_slots, spatial_valid,
                       tpos_index, ptr_rows, ptr_valid, ptr_tpos, t_diff_max,
                       orig_hw, n_obj, mem_pos):
            """One fused device call per tracked frame: memory fusion ->
            SAM heads -> memory encode -> f16 logit packing + exact-parity
            score (per-call RTT through the TPU tunnel is significant).

            ``mem_slots`` / ``ptr_rows`` are tuples of per-slot arrays,
            stacked INSIDE jit so the per-frame host loop issues no eager
            device ops. All slot entries share one dtype (cfg compute dtype
            — zero pads included, see _zeros_const callers) so the compile
            signature does not vary with the slot-validity pattern."""
            spatial_mem = jnp.stack(
                [s.astype(jnp.float32) for s in mem_slots], axis=0)
            obj_ptrs = (jnp.stack([r.astype(jnp.float32) for r in ptr_rows],
                                  axis=0) if ptr_rows
                        else jnp.zeros((0, O, C), jnp.float32))
            curr = jnp.broadcast_to(
                s16.reshape(1, HW, C), (O, HW, C))
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
            packed, score = _pack(out["low_res_masks"], orig_hw, n_obj)
            return (out["obj_ptr"], mem.reshape(O, HW, cfg.mem_dim),
                    out["low_res_masks"].astype(jnp.float16),
                    out["object_score_logits"], packed, score)

        @partial(jax.jit, static_argnums=(13,))
        def correction_step(params, s0, s1, s16, mem_slots, spatial_valid,
                            tpos_index, ptr_rows, ptr_valid, ptr_tpos,
                            t_diff_max, point_coords, point_labels, multimask,
                            prev_logits, mem_pos):
            """Correction clicks on an already-tracked frame (the external
            predictor's is_init_cond_frame=False path, sam2_base.py:810-837):
            memory-conditioned features + the new clicks + the frame's
            previous low-res mask logits as a dense prompt. Slot/pointer
            tuples are stacked inside jit (same as track_step)."""
            spatial_mem = jnp.stack(
                [s.astype(jnp.float32) for s in mem_slots], axis=0)
            obj_ptrs = (jnp.stack([r.astype(jnp.float32) for r in ptr_rows],
                                  axis=0) if ptr_rows
                        else jnp.zeros((0, O, C), jnp.float32))
            curr = jnp.broadcast_to(s16.reshape(1, HW, C), (O, HW, C))
            fused = sam2_mod.fuse_memory(
                params, cfg, layout, curr, curr_pos, spatial_mem,
                spatial_valid, mem_pos, tpos_index, obj_ptrs, ptr_valid,
                ptr_tpos, training=False, t_diff_max=t_diff_max)
            fused = fused.reshape(O, F, F, C)
            hr = (jnp.broadcast_to(s0[None], (O,) + s0.shape),
                  jnp.broadcast_to(s1[None], (O,) + s1.shape))
            out = sam2_mod.forward_sam_heads(
                params, cfg, fused, point_coords=point_coords,
                point_labels=point_labels, mask_inputs=prev_logits,
                high_res_features=hr, multimask_output=multimask,
                training=False)
            feats = jnp.broadcast_to(s16[None], (O,) + s16.shape)
            mem, mem_pos_out = sam2_mod.encode_new_memory(
                params, cfg, feats, out["high_res_masks"],
                out["object_score_logits"], training=False,
                apply_non_overlap=cfg.non_overlap_masks_for_mem_enc)
            return out, mem.reshape(O, HW, cfg.mem_dim), mem_pos_out

        @jax.jit
        def consolidate_mem(params, s16, lowres, score_logits):
            """Re-encode one conditioning frame's memory from cross-object
            consolidated low-res mask logits (external predictor preflight:
            consolidated masks are upsampled to image resolution, then fed to
            the memory encoder)."""
            hr_masks = resize_bilinear(lowres.astype(jnp.float32), (S, S))
            feats = jnp.broadcast_to(s16[None], (O,) + s16.shape)
            mem, _ = sam2_mod.encode_new_memory(
                params, cfg, feats, hr_masks, score_logits, training=False,
                apply_non_overlap=cfg.non_overlap_masks_for_mem_enc)
            return mem.reshape(O, HW, cfg.mem_dim)

        def _pack(lowres, orig_hw, n_obj):
            """[O, 1, S/4, S/4] low-res mask logits -> (f16 logits sliced to
            the real objects for the device->host fetch, exact-parity score
            = mean sigmoid over the original-resolution upsample).

            The fetch payload is the external predictor's stored resolution
            (S/4): it upsamples low-res masks DIRECTLY to the video
            resolution for output, and at 384px+ the 16x-smaller transfer is
            what keeps tunnel-attached propagation fast."""
            sel = lowres[:n_obj].astype(jnp.float32)
            up = resize_bilinear(sel, orig_hw)
            score = jnp.mean(jax.nn.sigmoid(up), axis=(1, 2, 3))
            return sel.astype(jnp.float16), score

        @partial(jax.jit, static_argnums=(1, 2))
        def lowres_pack(lowres, orig_hw, n_obj):
            """Conditioning-frame output path (same packing as tracked
            frames — the external predictor stores low-res logits for every
            frame kind)."""
            return _pack(lowres, orig_hw, n_obj)

        return (encode, prompt_step, mask_prompt_step, track_step,
                correction_step, consolidate_mem, lowres_pack, frame_feats,
                curr_pos, layout)

    # -- public API ---------------------------------------------------------

    def init_state(self, frames: np.ndarray) -> InferenceState:
        """frames: [T, H, W, 3] uint8 at original video resolution. Frames
        are squash-resized to the model size on host (cv2/PIL) so only
        T x S x S x 3 bytes cross the host->device link."""
        T, H, W, _ = frames.shape
        S = self.cfg.image_size
        small = np.empty((T, S, S, 3), np.uint8)
        _resize_frames_into(small, frames, S)
        chunks = []
        for i in range(0, T, self.encode_chunk):
            chunk = small[i: i + self.encode_chunk]
            chunks.append(self._encode(self.params, jnp.asarray(chunk)))
        feats = tuple(jnp.concatenate([c[j] for c in chunks], axis=0)
                      for j in range(3))
        return InferenceState(num_frames=T, orig_hw=(H, W), feats=feats,
                              prompts={}, obj_order=[])

    def _zeros_const(self, shape, dtype=jnp.float32):
        """Cached device zeros — slot/pointer padding rows recur every frame,
        so allocate once instead of paying an eager-dispatch RTT per step."""
        key = (shape, jnp.dtype(dtype).str)
        out = self._zero_cache.get(key)
        if out is None:
            out = jnp.zeros(shape, dtype)
            self._zero_cache[key] = out
        return out

    def _dev_const(self, arr: np.ndarray):
        """Device-cache small constant arrays (validity masks, tpos vectors)
        by value — each fresh upload costs a full tunnel round trip and the
        same patterns repeat every frame after warmup."""
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

    def add_new_points_or_box(self, state: InferenceState, frame_idx: int,
                              obj_id, points=None, labels=None, box=None):
        if box is not None:
            pts = self._scale_points(
                np.asarray(box, np.float32).reshape(2, 2), state.orig_hw)
            lbl = np.asarray([2, 3], np.int32)
        else:
            pts = self._scale_points(points, state.orig_hw)
            lbl = np.asarray(labels, np.int32).reshape(-1)
        self._add(state, frame_idx, obj_id, ("points", pts, lbl))

    def add_new_mask(self, state: InferenceState, frame_idx: int, obj_id,
                     mask: np.ndarray):
        s = self.cfg.image_size
        from PIL import Image
        m = Image.fromarray((np.asarray(mask) > 0).astype(np.uint8) * 255)
        m = m.resize((s, s), Image.BILINEAR)
        self._add(state, frame_idx, obj_id,
                  ("mask", (np.asarray(m) > 127).astype(np.float32), None))

    def _add(self, state, frame_idx, obj_id, payload):
        if obj_id not in state.obj_order:
            if len(state.obj_order) >= self.max_objects:
                raise ValueError(
                    f"more than max_objects={self.max_objects} objects; "
                    "raise model.max_objects")
            state.obj_order.append(obj_id)
            # a new object invalidates everything: earlier consolidations and
            # tracked outputs hold garbage in its row
            state.cond_outputs = None
            state.mem_bank = None
        else:
            # re-prompting an existing object only invalidates the prompted
            # frame's conditioning output (external-predictor semantics:
            # other conditioning frames and tracked outputs are reused — a
            # tracked output at this frame is consumed by consolidation).
            # A once-tracked frame stays "tracked" across repeated clicks
            # (reference obj_frames_tracked): restash the popped output so
            # the next click refines it instead of re-initializing
            if state.cond_outputs is not None:
                popped = state.cond_outputs.pop(frame_idx, None)
                if popped is not None and popped.was_tracked and \
                        frame_idx not in state.mem_bank:
                    state.mem_bank[frame_idx] = TrackedOutput(
                        mem=popped.mem, ptr=popped.ptr,
                        lowres=popped.lowres, score=popped.score)
        state.prompts.setdefault(frame_idx, {})[obj_id] = payload
        state.cond_frame_idx = frame_idx

    # -- conditioning steps --------------------------------------------------

    def _run_cond_frame(self, state: InferenceState, f: int,
                        tracked: TrackedOutput | None = None):
        """Run the prompt step(s) for the objects prompted at frame ``f``.
        Rows of objects without a prompt at ``f`` contain padding-prompt
        outputs and are overridden by consolidation.

        ``tracked`` is the frame's previous tracked output, if any: point
        prompts then run the is_init_cond_frame=False correction path
        (memory-conditioned + previous logits as dense prompt) instead of
        prompting from scratch; mask prompts use the mask-as-output bypass
        either way (sam2_base.py:799-809 applies before memory
        conditioning)."""
        cfg = self.cfg
        O = self.max_objects
        s0, s1, s16 = (x[f] for x in state.feats)
        obj_valid = np.zeros((O,), bool)
        obj_valid[: len(state.obj_order)] = True
        at_f = state.prompts[f]
        mask_objs = [i for i, o in enumerate(state.obj_order)
                     if o in at_f and at_f[o][0] == "mask"]
        point_objs = [i for i, o in enumerate(state.obj_order)
                      if o in at_f and at_f[o][0] == "points"]

        results = []
        if mask_objs:
            S = cfg.image_size
            masks = np.zeros((O, S, S), np.float32)
            for i in mask_objs:
                masks[i] = at_f[state.obj_order[i]][1]
            results.append((mask_objs, self._mask_prompt_step(
                self.params, s0, s1, s16, jnp.asarray(masks),
                jnp.asarray(obj_valid))))
        if point_objs:
            maxp = max(len(at_f[state.obj_order[i]][1]) for i in point_objs)
            coords = np.zeros((O, maxp, 2), np.float32)
            labels = -np.ones((O, maxp), np.int32)
            for i in point_objs:
                _, pts, lbl = at_f[state.obj_order[i]]
                coords[i, : len(pts)] = pts
                labels[i, : len(pts)] = lbl
            # multimask gating parity (sam2_base.py:932-940); the flag is
            # per-step (objects share it — the runner prompts equal counts)
            from ..models.video_model import _use_multimask
            if tracked is not None and tracked.lowres is not None:
                # correction click on a tracked frame: memory-conditioned
                # features, clicks, and the frame's previous low-res logits
                # (clamped like the reference's prev_sam_mask_logits)
                sm, sv, tpos, ptrs, pv, pt, tdm = self._assemble_memory(
                    state, state.mem_bank, state.cond_outputs, f,
                    reverse=False)
                prev = jnp.clip(tracked.lowres.astype(jnp.float32),
                                -32.0, 32.0)
                results.append((point_objs, self._correction_step(
                    self.params, s0, s1, s16, sm, sv, tpos, ptrs, pv, pt,
                    self._dev_const(np.float32(tdm)), jnp.asarray(coords),
                    jnp.asarray(labels), _use_multimask(cfg, False, maxp),
                    jnp.moveaxis(prev, 1, -1), self._mem_pos_flat)))
            else:
                results.append((point_objs, self._prompt_step(
                    self.params, s0, s1, s16, jnp.asarray(coords),
                    jnp.asarray(labels), jnp.asarray(obj_valid),
                    _use_multimask(cfg, True, maxp))))

        if len(results) == 1:
            return results[0][1]
        # mixed prompt kinds: merge per-object rows from both passes
        sel = np.zeros((O,), bool)
        sel[mask_objs] = True  # True -> take the mask-pass row

        def merge(a, b):
            s = jnp.asarray(sel).reshape((O,) + (1,) * (a.ndim - 1))
            return jnp.where(s, a, b)

        (_, (out_m, mem_m, pos_m)), (_, (out_p, mem_p, _)) = results
        out = {k: merge(out_m[k], out_p[k]) for k in out_m}
        return out, merge(mem_m, mem_p), pos_m

    def _empty_mask_ptr(self, state: InferenceState, f: int):
        """Object pointer for "no prompt, no tracked output" rows of a
        consolidated conditioning frame: run the mask step on an all-zero
        mask (the external predictor's _get_empty_mask_ptr). Returns
        [O, C] (all rows identical)."""
        s0, s1, s16 = (x[f] for x in state.feats)
        S = self.cfg.image_size
        out, _, _ = self._mask_prompt_step(
            self.params, s0, s1, s16,
            self._dev_const(np.zeros((self.max_objects, S, S), np.float32)),
            self._dev_const(np.ones((self.max_objects,), bool)))
        return out["obj_ptr"]

    def _ensure_cond_outputs(self, state: InferenceState):
        """Compute + consolidate outputs for every prompted frame that does
        not have one yet (external predictor propagate_in_video_preflight)."""
        if not state.prompts:
            raise ValueError("no prompts added")
        if len(state.prompts) > 1 and self.max_cond_frames == 1:
            raise ValueError(
                f"{len(state.prompts)} conditioning frames prompted but the "
                "predictor was built with max_cond_frames=1; construct "
                "VideoPredictor(..., max_cond_frames=N) to attend to several")
        if state.cond_outputs is None:
            state.cond_outputs = {}
        if state.mem_bank is None:
            state.mem_bank = {}
        O = self.max_objects
        n_obj = len(state.obj_order)
        for f in sorted(state.prompts):
            if f in state.cond_outputs:
                continue
            # the frame moves from non-cond to cond; its tracked output (if
            # any) feeds the correction path and unprompted rows below
            tracked = state.mem_bank.pop(f, None)
            out, mem, mem_pos = self._run_cond_frame(state, f, tracked)
            if self._mem_pos_flat is None:
                self._mem_pos_flat = mem_pos.reshape(-1, self.cfg.mem_dim)
            prompted = np.zeros((O,), bool)
            for i, o in enumerate(state.obj_order):
                prompted[i] = o in state.prompts[f]
            if prompted[:n_obj].all():
                # every object prompted here: the step outputs ARE the
                # consolidated outputs (memory from native high-res masks,
                # matching the training path)
                state.cond_outputs[f] = CondOutput(
                    lowres=out["low_res_masks"], mem=mem,
                    ptr=out["obj_ptr"], score=out["object_score_logits"],
                    was_tracked=tracked is not None)
                continue
            # partial coverage: fill unprompted rows from tracked outputs if
            # this frame was tracked before, else NO_OBJ placeholders
            sel = self._dev_const(prompted)
            if tracked is not None and tracked.lowres is not None:
                alt_low = tracked.lowres.astype(jnp.float32)
                alt_ptr, alt_score = tracked.ptr, tracked.score
            else:
                alt_low = jnp.full_like(out["low_res_masks"], NO_OBJ_SCORE)
                alt_ptr = self._empty_mask_ptr(state, f)
                # dummy +10 score: "object present" for the no-obj spatial
                # embed gate, like the external predictor's consolidation
                alt_score = jnp.full_like(out["object_score_logits"], 10.0)
            lowres = jnp.where(sel[:, None, None, None],
                               out["low_res_masks"], alt_low)
            ptr = jnp.where(sel[:, None], out["obj_ptr"], alt_ptr)
            score = jnp.where(sel[:, None], out["object_score_logits"],
                              alt_score)
            s16 = state.feats[2][f]
            cmem = self._consolidate_mem(self.params, s16, lowres, score)
            state.cond_outputs[f] = CondOutput(
                lowres=lowres, mem=cmem, ptr=ptr, score=score,
                was_tracked=tracked is not None)

    # -- propagation --------------------------------------------------------

    def propagate_in_video(self, state: InferenceState,
                           reverse: bool = False,
                           start_frame_idx: int | None = None
                           ) -> Iterator[tuple]:
        """Yields (frame_idx, obj_ids, logits [n_obj, 1, S/4, S/4] f16
        numpy, score [n_obj]). Only the external predictor's STORED mask
        resolution (low-res, S/4) crosses the device->host link — it
        upsamples low-res logits directly to video resolution for output,
        and the 16x-smaller payload is what keeps tunnel-attached
        propagation transfer-light; use ``logits_to_orig`` to get
        original-resolution masks/probs on host.

        Conditioning outputs and the memory bank PERSIST across propagate
        calls (external-predictor parity: the forward pass attends to
        memories produced by a preceding reverse pass on the same state,
        since the reference shares one inference_state across both,
        inference.py:487-515). Starts at the earliest conditioning frame in
        both directions unless ``start_frame_idx`` is given."""
        self._ensure_cond_outputs(state)
        T = state.num_frames
        n_obj = len(state.obj_order)
        obj_ids = list(state.obj_order)
        mem_bank = state.mem_bank
        cond_outputs = state.cond_outputs

        f0 = (start_frame_idx if start_frame_idx is not None
              else min(cond_outputs))
        frame_order = (list(range(f0, -1, -1)) if reverse
                       else list(range(f0, T)))
        mem_pos_flat = self._mem_pos_flat

        def dispatch(t):
            """Launch frame t's fused device step; returns device futures."""
            co = cond_outputs.get(t)
            if co is not None:
                return self._lowres_pack(co.lowres, state.orig_hw, n_obj)
            slots, sv, tpos, ptrs, pv, pt, tdm = self._assemble_memory(
                state, mem_bank, cond_outputs, t, reverse)
            s0, s1, s16 = self._frame_feats(state.feats, np.int32(t))
            obj_ptr, new_mem, lowres, oscore, packed, score = \
                self._track_step(
                    self.params, s0, s1, s16, slots, sv, tpos,
                    ptrs, pv, pt, self._dev_const(np.float32(tdm)),
                    state.orig_hw, n_obj, mem_pos_flat)
            mem_bank[t] = TrackedOutput(mem=new_mem, ptr=obj_ptr,
                                        lowres=lowres, score=oscore)
            return packed, score

        # software pipeline, depth 3: several device steps stay in flight
        # while the host converts/fetches earlier frames (per-call tunnel
        # RTT dominates otherwise); dispatch consumes memory-bank entries
        # as device futures, so queuing ahead never synchronizes. The D2H
        # copy of each frame's packed payload is scheduled at dispatch time
        # (copy_to_host_async) so the transfer rides behind the compute
        # instead of blocking the pop-side np.asarray.
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

    def _assemble_memory(self, state, mem_bank, cond_outputs, frame_idx,
                         reverse):
        """Host-side memory-slot selection (sam2_base.py:549-675 eval rules):
        the first ``max_cond_frames`` slots hold the temporally closest
        conditioning frames (all at temporal position 0); the remaining M-1
        slots hold non-cond frames chosen by the r-stride rule (falling back
        to unselected conditioning frames); pointer slots = selected-cond
        pointers (past-only at eval) + past non-cond/unselected frames."""
        cfg = self.cfg
        O = self.max_objects
        HW = cfg.num_spatial_tokens
        M = cfg.num_maskmem
        n_cond = self.max_cond_frames
        r = max(cfg.memory_temporal_stride_for_eval, 1)

        budget = n_cond
        if cfg.max_cond_frames_in_attn > 0:
            budget = min(budget, cfg.max_cond_frames_in_attn)
        if budget == 1 and len(cond_outputs) > 1:
            # reference select_closest_cond_frames requires >= 2 when
            # limiting; with a single slot take the nearest one ourselves
            # (before preferred, like the reference's selection order)
            t = max((t for t in cond_outputs if t < frame_idx), default=None)
            if t is None:
                t = min(t for t in cond_outputs if t >= frame_idx)
            selected = {t: cond_outputs[t]}
            unselected = {k: v for k, v in cond_outputs.items() if k != t}
        else:
            selected, unselected = select_closest_cond_frames(
                frame_idx, cond_outputs,
                budget if len(cond_outputs) > 1 else -1)

        def _zero():
            # pads share the real entries' dtype (compute dtype) so the slot
            # tuple's jit signature is one per config, not per fill pattern
            return self._zeros_const((O, HW, cfg.mem_dim), cfg.dtype())

        slots, valid = [], []
        sel_frames = list(selected)
        for i in range(n_cond):
            if i < len(sel_frames):
                slots.append(selected[sel_frames[i]][1])  # CondOutput.mem
                valid.append(True)
            else:
                slots.append(_zero())
                valid.append(False)
        for t_pos in range(1, M):
            t_rel = M - t_pos
            if t_rel == 1:
                prev = frame_idx + 1 if reverse else frame_idx - 1
            else:
                if not reverse:
                    prev = ((frame_idx - 2) // r) * r - (t_rel - 2) * r
                else:
                    prev = -(-(frame_idx + 2) // r) * r + (t_rel - 2) * r
            if prev in selected:
                entry = None          # already attended as a cond slot
            elif prev in unselected:
                entry = unselected[prev][1]   # CondOutput.mem
            else:
                e = mem_bank.get(prev)
                entry = e[0] if e is not None else None
            if entry is None:
                slots.append(_zero())
                valid.append(False)
            else:
                slots.append(entry)
                valid.append(True)
        # tpos embedding index parity: reference adds
        # maskmem_tpos_enc[M - t_pos - 1] (sam2_base.py:608-610); all cond
        # slots have t_pos=0 -> index M-1 (sam2_base.py:555-561)
        tpos_index = [M - 1] * n_cond + \
            [M - t_pos - 1 for t_pos in range(1, M)]

        spatial_valid = self._dev_const(np.asarray(valid))
        tpos_idx = self._dev_const(np.asarray(tpos_index, np.int32))

        P = self._layout.num_ptrs
        # pointer slots stay DEVICE arrays (never synced to host; stacked
        # inside the jitted step — keeps the dispatch pipeline fully
        # asynchronous with zero eager device ops per frame)
        # pointer rows are ALWAYS f32 (forward_sam_heads casts obj_ptr to
        # f32, sam2.py:370) — pads must match or the fill pattern would
        # change the jit signature
        zero_ptr = self._zeros_const((O, cfg.d_model))
        ptr_rows = [zero_ptr] * P
        pvalid = np.zeros((P,), bool)
        ptpos = np.zeros((P,), np.float32)
        if P > 0:
            max_ptrs = min(state.num_frames, cfg.max_obj_ptrs_in_encoder)
            sign = -1.0 if reverse else 1.0
            idx = 0
            for t, co in selected.items():
                # conditioning pointers: only those in the past (eval rule,
                # sam2_base.py:623-631)
                include = (t >= frame_idx if reverse else t <= frame_idx) or \
                    not cfg.only_obj_ptrs_in_the_past_for_eval
                if include and idx < P:
                    ptr_rows[idx] = co[2]  # .ptr (cast to f32 inside jit)
                    pvalid[idx] = True
                    ptpos[idx] = ((frame_idx - t) * sign
                                  if cfg.use_signed_tpos_enc_to_obj_ptrs
                                  else abs(frame_idx - t))
                    idx += 1
            for t_diff in range(1, max_ptrs):
                t = frame_idx + t_diff if reverse else frame_idx - t_diff
                if t < 0 or t >= state.num_frames:
                    break
                if t in selected:
                    continue
                if t in unselected:
                    row = unselected[t][2]    # CondOutput.ptr
                else:
                    e = mem_bank.get(t)
                    row = e[1] if e is not None else None
                if row is not None and idx < P:
                    ptr_rows[idx] = row
                    pvalid[idx] = True
                    ptpos[idx] = t_diff
                    idx += 1
            t_diff_max = max(max_ptrs - 1, 1)
        else:
            t_diff_max = 1
        return (tuple(slots), spatial_valid, tpos_idx, tuple(ptr_rows),
                self._dev_const(pvalid), self._dev_const(ptpos), t_diff_max)
