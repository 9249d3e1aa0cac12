"""Video training forward: prompt frame 0, track frames 1..T-1 through the
fixed-shape memory bank under ``jax.lax.scan``.

Parity spec: /root/reference/sam2_video/model/sam2model.py (forward:154-179,
prepare_prompt_inputs:181-236, forward_tracking:266-401, track_step:403-498).
The host-side parts of prompt preparation (connected components, random point
sampling) live in the data pipeline (utils/prompts.py, data/pipeline.py); this
module is fully jittable with static shapes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..data.types import VideoClip
from ..utils.merging import merge_objects_to_categories
from . import sam2 as sam2_mod
from .sam2 import SAM2Config


@dataclasses.dataclass(frozen=True)
class VideoModelConfig:
    sam2: SAM2Config = dataclasses.field(default_factory=SAM2Config)
    prompt_type: str = "point"  # {point, box, mask} (sam2model.py:69-71)


def _use_multimask(cfg: SAM2Config, is_init: bool, num_pts: int) -> bool:
    """sam2_base.py:932-940, static."""
    return bool(
        cfg.multimask_output_in_sam
        and (is_init or cfg.multimask_output_for_tracking)
        and (cfg.multimask_min_pt_num <= num_pts <= cfg.multimask_max_pt_num))


def _broadcast_obj(x: jnp.ndarray, num_objects: int) -> jnp.ndarray:
    """[H, W, C] or [...] single-frame tensor -> leading object axis."""
    return jnp.broadcast_to(x[None], (num_objects,) + x.shape)


def forward_train(params, mcfg: VideoModelConfig, clip: VideoClip,
                  training: bool = True):
    """Run the full tracking forward on one clip.

    Returns (per_object_outs, per_category_outs):
      per_object_outs: dict of [T, O, ...]:
        high_res_multimasks [T, O, M, H, W], ious [T, O, M],
        object_score_logits [T, O, 1], high_res_masks [T, O, 1, H, W]
      per_category_outs: same merged over obj_to_cat to [T, C, ...].
    """
    cfg = mcfg.sam2
    T = clip.num_frames
    O = clip.num_objects
    HW = cfg.num_spatial_tokens
    F = cfg.feat_size
    C = cfg.d_model

    # hoist the memory-attention weight permutation above the frame scan:
    # one gather (fwd) / scatter (bwd) per projection per step instead of
    # one per frame under the unrolled scan (memory_attention.prepare)
    from . import memory_attention as memory_attention_mod
    params = {**params, "memory_attention": memory_attention_mod.prepare(
        params["memory_attention"], cfg.memory_attention_config)}

    # ---- 1. image encoder on all frames (the FLOPs-heavy batched part) ----
    # fused-kernel trunk is forward-only: legal under a frozen encoder
    # (cfg.fused_backbone, set by make_train_step) and always in eval mode;
    # encoder-trainable training uses the differentiable fused kernel
    # instead (cfg.fused_backbone_vjp, custom-VJP Pallas backward)
    backbone = sam2_mod.forward_image(
        params, cfg, clip.images,
        allow_fused=cfg.fused_backbone or not training,
        fused_vjp=cfg.fused_backbone_vjp and training)
    s0, s1, s16 = backbone["backbone_fpn"]          # [T,4F,4F,C/8] [T,2F,2F,C/4] [T,F,F,C]
    pos16 = backbone["vision_pos_enc"][2]           # [F, F, C]
    curr_pos = pos16.reshape(HW, C)

    # ---- 2. frame 0: prompted conditioning frame ----
    feats0 = _broadcast_obj(s16[0], O)              # [O, F, F, C]
    hr0 = (_broadcast_obj(s0[0], O), _broadcast_obj(s1[0], O))
    mask_inputs0 = clip.obj_masks[..., None]        # [O, H, W, 1]

    if mcfg.prompt_type == "mask":
        if cfg.use_mask_input_as_output_without_sam and T > 1:
            out0 = sam2_mod.use_mask_as_output(
                params, cfg, feats0, hr0, mask_inputs0, training=training)
        else:
            pix0 = feats0 + params["no_mem_embed"].reshape(1, 1, 1, C).astype(
                feats0.dtype)
            out0 = sam2_mod.forward_sam_heads(
                params, cfg, pix0, mask_inputs=mask_inputs0,
                high_res_features=hr0,
                multimask_output=_use_multimask(cfg, True, 0),
                training=training)
    else:
        num_pts = clip.point_labels.shape[-1]
        pix0 = feats0 + params["no_mem_embed"].reshape(1, 1, 1, C).astype(
            feats0.dtype)
        out0 = sam2_mod.forward_sam_heads(
            params, cfg, pix0,
            point_coords=clip.point_coords, point_labels=clip.point_labels,
            high_res_features=hr0,
            multimask_output=_use_multimask(cfg, True, num_pts),
            training=training)

    cond_mem, mem_pos_grid = sam2_mod.encode_new_memory(
        params, cfg, feats0, out0["high_res_masks"],
        out0["object_score_logits"], training=training,
        apply_non_overlap=cfg.non_overlap_masks_for_mem_enc)
    detach = (jax.lax.stop_gradient if cfg.detach_memory_bank
              else (lambda x: x))
    bank_dt = cfg.bank_dtype()
    cond_mem = detach(cond_mem.reshape(O, HW, cfg.mem_dim).astype(bank_dt))
    mem_pos = mem_pos_grid.reshape(HW, cfg.mem_dim)
    cond_ptr = detach(out0["obj_ptr"].astype(bank_dt))  # [O, C]

    if T == 1:
        per_obj = jax.tree.map(lambda x: x[None], _loss_outputs(out0))
        return _finalize(per_obj, clip, cfg)

    # ---- 3. frames 1..T-1 under lax.scan with ring-buffer memory ----
    layout = sam2_mod.memory_layout(cfg, T)
    R = cfg.num_maskmem - 1                       # non-cond spatial slots
    Pn = max(layout.num_ptrs - 1, 0)              # non-cond pointer slots
    mm_track = _use_multimask(cfg, False, 0)
    # remat strategy: "body" wraps the whole scan body (below) and disables
    # the inner per-module checkpoints (nesting would recompute forwards
    # twice in backward); "body_dots" is "body" with the
    # dots_with_no_batch_dims_saveable policy — every matmul/conv output is
    # SAVED and only cheap elementwise/reshape work is recomputed, trading a
    # little memory for almost no recompute FLOPs (the MXU work dominates);
    # "modules" keeps the reference-granularity inner checkpoints; "none"
    # stores everything (fastest when HBM allows)
    remat_mode = cfg.resolved_remat_mode() if training else "none"
    body_cfg = (dataclasses.replace(cfg, use_activation_checkpoint=False,
                                    remat_mode="none")
                if remat_mode in ("body", "body_dots") else cfg)

    tpos_index_full = jnp.concatenate([
        jnp.asarray([cfg.num_maskmem - 1]), jnp.arange(R)])  # [M]
    # the pointer tpos normalizer must stay the FULL clip's pointer budget
    # even when a frame attends a shorter static prefix (parity with the
    # fixed-shape path / reference sam2_base.py:655-666)
    t_diff_max = max(layout.num_ptrs - 1, 1)

    def _frame_step(frame_params, layout_t, s16_t, s0_t, s1_t, spatial_mem,
                    spatial_valid, tpos_index, obj_ptrs, ptr_valid, ptr_tpos):
        """One tracked frame: fuse memory, SAM heads, encode new memory.
        Shared by the lax.scan body and the static-prefix unrolled loop.
        ``frame_params`` is normally just ``params``; under
        ``cfg.stacked_frame_grads`` the unrolled loop passes a per-frame
        view of the shared head params (see below)."""
        curr = _broadcast_obj(s16_t.reshape(HW, C), O)
        fused = sam2_mod.fuse_memory(
            frame_params, body_cfg, layout_t, curr, curr_pos, spatial_mem,
            spatial_valid, mem_pos, tpos_index, obj_ptrs, ptr_valid,
            ptr_tpos, training=training, t_diff_max=t_diff_max)
        fused = fused.reshape(O, F, F, C)

        hr = (_broadcast_obj(s0_t, O), _broadcast_obj(s1_t, O))
        out_t = sam2_mod.forward_sam_heads(
            frame_params, body_cfg, fused, high_res_features=hr,
            multimask_output=mm_track, training=training)

        pix_raw = _broadcast_obj(s16_t, O)
        new_mem, _ = sam2_mod.encode_new_memory(
            frame_params, body_cfg, pix_raw, out_t["high_res_masks"],
            out_t["object_score_logits"], training=training,
            apply_non_overlap=cfg.non_overlap_masks_for_mem_enc)
        new_mem = new_mem.reshape(O, HW, cfg.mem_dim).astype(bank_dt)
        new_ptr = out_t["obj_ptr"].astype(bank_dt)
        return new_mem, new_ptr, _loss_outputs(out_t)

    if remat_mode in ("none", "modules") and cfg.scan_unroll == 0:
        # ---- static-prefix unrolled loop (the default/fastest path) ----
        # With the loop unrolled in Python, the frame index is static, so
        # each frame attends over exactly its VALID memory prefix instead of
        # the full ring with -1e9-biased invalid slots: frames 1..6 of a
        # 10-frame clip shrink from 7 to 1..6 spatial slots (42/63 of the
        # cross-attention key work clip-wide). Bit-equivalent to the masked
        # fixed-shape path up to f32 reassociation — masked keys contribute
        # exactly zero probability. The ring buffers become Python lists
        # (newest first), so slot j still holds the frame (j+1) steps back
        # and the tpos index stays the slot index.
        if training and cfg.stacked_frame_grads:
            # per-frame views of every non-trunk param: forward values are
            # identical (XLA folds slice-of-broadcast away), but each
            # frame's weight cotangent lands in its own slice of ONE
            # [T-1, ...] buffer whose leading-axis sum is the broadcast's
            # transpose — one big reduction per weight instead of a chain
            # of T-1 small adds per weight tensor
            heads_p = {k: v for k, v in params.items()
                       if k != "image_encoder"}
            stacked = jax.tree.map(
                lambda a: jnp.broadcast_to(a[None], (T - 1,) + a.shape),
                heads_p)

            def _params_for(t):
                view = jax.tree.map(lambda a: a[t - 1], stacked)
                return {**params, **view}
        else:
            def _params_for(t):
                return params

        mem_list: list = []
        ptr_list: list = []
        outs = []
        for t in range(1, T):
            n_slots = min(t - 1, R)
            spatial_mem = jnp.concatenate(
                [cond_mem[None]] + [m[None] for m in mem_list[:n_slots]],
                axis=0)
            tpos_index = jnp.concatenate([
                jnp.asarray([cfg.num_maskmem - 1]), jnp.arange(n_slots)])
            if Pn > 0:
                n_ptr = min(t - 1, Pn)
                obj_ptrs = jnp.concatenate(
                    [cond_ptr[None]] + [q[None] for q in ptr_list[:n_ptr]],
                    axis=0)
                ptr_tpos = jnp.asarray(
                    [float(t)] + [float(i + 1) for i in range(n_ptr)],
                    jnp.float32)
                lay_ptrs = 1 + n_ptr
            else:
                obj_ptrs = jnp.zeros((0, O, C), jnp.float32)
                ptr_tpos = jnp.zeros((0,), jnp.float32)
                lay_ptrs = 0
            layout_t = sam2_mod.MemoryLayout(
                num_maskmem=1 + n_slots, tokens_per_slot=HW,
                num_ptrs=lay_ptrs, tokens_per_ptr=layout.tokens_per_ptr)
            new_mem, new_ptr, outs_t = _frame_step(
                _params_for(t), layout_t, s16[t], s0[t], s1[t], spatial_mem,
                None, tpos_index, obj_ptrs, None, ptr_tpos)
            mem_list = [detach(new_mem)] + mem_list[:R - 1]
            if Pn > 0:
                ptr_list = [detach(new_ptr)] + ptr_list[:Pn - 1]
            outs.append(outs_t)
        ys = jax.tree.map(lambda *a: jnp.stack(a), *outs)
    else:
        # ---- fixed-shape lax.scan path (remat / bounded-unroll modes) ----
        def body(carry, xs):
            noncond_mem, noncond_ptr = carry
            t, s16_t, s0_t, s1_t = xs
            tf = t.astype(jnp.float32)

            spatial_mem = jnp.concatenate([cond_mem[None], noncond_mem],
                                          axis=0)
            ring_idx = jnp.arange(R)
            spatial_valid = jnp.concatenate(
                [jnp.asarray([True]), ring_idx <= t - 2])
            if Pn > 0:
                obj_ptrs = jnp.concatenate([cond_ptr[None], noncond_ptr],
                                           axis=0)
                pidx = jnp.arange(Pn)
                ptr_valid = jnp.concatenate(
                    [jnp.asarray([True]), pidx <= t - 2])
                ptr_tpos = jnp.concatenate(
                    [tf[None], (pidx + 1).astype(jnp.float32)])
            else:
                obj_ptrs = jnp.zeros((0, O, C), jnp.float32)
                ptr_valid = jnp.zeros((0,), bool)
                ptr_tpos = jnp.zeros((0,), jnp.float32)

            new_mem, new_ptr, outs_t = _frame_step(
                params, layout, s16_t, s0_t, s1_t, spatial_mem,
                spatial_valid, tpos_index_full, obj_ptrs, ptr_valid,
                ptr_tpos)

            # push into the ring buffers; stop_gradient == reference
            # .detach()
            noncond_mem = detach(
                jnp.concatenate([new_mem[None], noncond_mem[:-1]], axis=0))
            if Pn > 0:
                noncond_ptr = detach(jnp.concatenate(
                    [new_ptr[None], noncond_ptr[:-1]], axis=0))
            return (noncond_mem, noncond_ptr), outs_t

        carry0 = (jnp.zeros((R, O, HW, cfg.mem_dim), bank_dt),
                  jnp.zeros((Pn, O, C), bank_dt))
        xs = (jnp.arange(1, T), s16[1:], s0[1:], s1[1:])
        if remat_mode == "body":
            body = jax.checkpoint(body)
        elif remat_mode == "body_dots":
            body = jax.checkpoint(
                body,
                policy=jax.checkpoint_policies
                .dots_with_no_batch_dims_saveable)
        _, ys = jax.lax.scan(body, carry0, xs,
                             unroll=(cfg.scan_unroll if cfg.scan_unroll > 0
                                     else True))

    per_obj = jax.tree.map(
        lambda a, b: jnp.concatenate([a[None], b], axis=0),
        _loss_outputs(out0), ys)
    return _finalize(per_obj, clip, cfg)


def _loss_outputs(out: dict) -> dict:
    """Keep the per-frame keys the loss/eval consume (f32)."""
    return {
        "high_res_multimasks": out["high_res_multimasks"],
        "ious": out["ious"],
        "object_score_logits": out["object_score_logits"],
        "high_res_masks": out["high_res_masks"],
    }


def _finalize(per_obj: dict, clip: VideoClip, cfg: SAM2Config):
    num_categories = clip.cat_masks.shape[1]
    per_cat = merge_objects_to_categories(per_obj, clip.obj_to_cat,
                                          num_categories)
    return per_obj, per_cat
