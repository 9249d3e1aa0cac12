"""SAM2 core: assembles trunk/neck/prompt-encoder/mask-decoder/memory modules
and implements the video-tracking recurrence TPU-first.

Parity spec: /root/reference/sam2_video/model/modeling/sam2_base.py (SAM2Base)
and /root/reference/sam2_video/model/sam2model.py (the simplified training
forward). Key TPU re-design decisions (cf. SURVEY.md §5.7, §7):

- The reference's memory bank is a Python dict of variable size with
  data-dependent pruning (sam2model.py:360-377) and a variable-length object-
  pointer list (sam2_base.py:613-675). Here both become **fixed-shape ring
  buffers carried through ``jax.lax.scan``** with validity masks turned into
  additive attention biases: slot j holds the frame (j+1) steps back, so the
  temporal-position embedding index *is* the slot index, and pruning is a
  static roll.
- ``.detach()`` of memory entries (sam2model.py:345-358) becomes
  ``jax.lax.stop_gradient`` on the carry updates: BPTT is truncated at frame
  boundaries through the memory path while mask-loss gradients still flow into
  memory_attention/memory_encoder within each frame.
- Variable object counts (connected components of the frame-0 GT) are padded
  to a static ``num_objects``; invalid objects are masked in the loss and the
  category merge (utils/merging.py).
- The image encoder runs **once, batched over all T frames** outside the scan
  (the reference does the same for training, sam2model.py:164-169) so the
  FLOPs-dominant convs/attention hit the MXU at full batch.
- Activation rematerialization: ``jax.checkpoint`` around the SAM head and
  memory modules replaces torch.utils.checkpoint (sam2_base.py:362-371,
  694-709, 749-755).

Parameter tree paths mirror the torch checkpoint exactly (``image_encoder.*``,
``memory_attention.*``, ``memory_encoder.*``, ``sam_prompt_encoder.*``,
``sam_mask_decoder.*``, ``obj_ptr_proj.*``, ``obj_ptr_tpos_proj.*``,
``maskmem_tpos_enc`` etc.) so the converter is a path rename.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..ops import common as nn
from ..ops.position_encoding import sine_pe_1d
from ..ops.resize import resize_bilinear
from . import image_encoder as image_encoder_mod
from . import mask_decoder as mask_decoder_mod
from . import memory_attention as memory_attention_mod
from . import memory_encoder as memory_encoder_mod
from . import prompt_encoder as prompt_encoder_mod
from .hiera import HIERA_PRESETS, HieraConfig

NO_OBJ_SCORE = -1024.0


@dataclasses.dataclass(frozen=True)
class SAM2Config:
    """All SAM2Base knobs (sam2_base.py:25-100) + module configs, with the
    SAM2.1 defaults from configs/sam2/sam2.1_hiera_t.yaml."""

    # module configs
    backbone: str = "tiny"  # key into HIERA_PRESETS
    image_size: int = 384
    backbone_stride: int = 16
    d_model: int = 256
    mem_dim: int = 64

    # memory
    num_maskmem: int = 7
    sigmoid_scale_for_mem_enc: float = 20.0
    sigmoid_bias_for_mem_enc: float = -10.0
    binarize_mask_from_pts_for_mem_enc: bool = False
    use_mask_input_as_output_without_sam: bool = True
    max_cond_frames_in_attn: int = -1
    directly_add_no_mem_embed: bool = True
    memory_temporal_stride_for_eval: int = 1
    non_overlap_masks_for_mem_enc: bool = False

    # obj ptrs
    use_obj_ptrs_in_encoder: bool = True
    max_obj_ptrs_in_encoder: int = 16
    add_tpos_enc_to_obj_ptrs: bool = True
    proj_tpos_enc_in_obj_ptrs: bool = True
    use_signed_tpos_enc_to_obj_ptrs: bool = True
    only_obj_ptrs_in_the_past_for_eval: bool = True

    # SAM heads
    use_high_res_features_in_sam: bool = True
    multimask_output_in_sam: bool = False
    multimask_min_pt_num: int = 0
    multimask_max_pt_num: int = 1
    multimask_output_for_tracking: bool = False
    use_multimask_token_for_obj_ptr: bool = False
    iou_prediction_use_sigmoid: bool = True
    pred_obj_scores: bool = True
    pred_obj_scores_mlp: bool = True
    fixed_no_obj_ptr: bool = True
    soft_no_obj_ptr: bool = False
    use_mlp_for_obj_ptr_proj: bool = True
    no_obj_embed_spatial: bool = True
    # eval-time fallback to the best multimask token on unstable single-mask
    # outputs (mask_decoder extra arg; SAM2.1 enables it — note the multimask
    # tokens are only meaningful with pretrained weights)
    dynamic_multimask_via_stability: bool = True

    # training — rematerialization strategy:
    #   "none":      store all activations (fastest; B=1 at 384px fits HBM)
    #   "body":      remat the whole scan body (lowest memory; enables B>=4)
    #   "body_dots": scan-body remat with the XLA dots-saveable policy —
    #                matmul/conv outputs are stored, only elementwise work is
    #                recomputed (near-"none" speed at much lower memory)
    #   "modules":   remat decoder/memattn/memenc individually (the
    #                reference's torch.utils.checkpoint granularity,
    #                sam2_base.py:362-371)
    # use_activation_checkpoint=True maps to "body" unless remat_mode is set.
    use_activation_checkpoint: bool = True
    remat_mode: str = ""  # "", "none", "body", "body_dots", "modules"
    compute_dtype: str = "bfloat16"  # activations dtype for encoder/attention

    def resolved_remat_mode(self) -> str:
        if self.remat_mode:
            return self.remat_mode
        return "body" if self.use_activation_checkpoint else "none"
    use_flash_attention: bool = True  # Pallas kernel for memory cross-attn
    # lax.scan unroll factor for the frame recurrence (video_model.py).
    # 0 = fully unroll (the default): XLA schedules across iteration
    # boundaries, which measured ~20% faster at T=10 (DESIGN.md §3) at the
    # cost of program size / compile time — set an explicit small factor
    # for very long training clips if compiles get slow.
    scan_unroll: int = 0
    # Restructure the unrolled loop's weight-grad accumulation: give each
    # tracked frame its own broadcast view of the shared per-frame-module
    # params so the backward writes per-frame cotangent slices into ONE
    # stacked buffer and reduces once per weight, instead of chaining
    # per-frame adds over hundreds of small grad tensors (the diagnosed
    # all-trainable tail — DESIGN.md §3 "remaining gap").
    stacked_frame_grads: bool = False
    # dtype of the ring-buffer memory bank carried through the scan. The
    # reference effectively stores memories in fp16 under autocast; bf16
    # halves carry bandwidth with the same exponent range.
    memory_bank_dtype: str = "float32"

    def bank_dtype(self):
        return (jnp.bfloat16 if self.memory_bank_dtype == "bfloat16"
                else jnp.float32)
    # Reference parity: the simplified trainer detaches every memory-bank
    # entry (sam2model.py:345-358), truncating BPTT at frame boundaries —
    # which also means the memory *encoder* receives no gradient there.
    # Set False to backpropagate through the scan carry (full BPTT over the
    # clip; jax.checkpoint keeps the memory footprint linear in T).
    detach_memory_bank: bool = True
    # Route the Hiera trunk forward through the fused block kernel
    # (ops/hiera_block_kernel.py) DURING TRAINING. Forward-only kernel —
    # legal exactly when the image encoder is frozen; make_train_step sets
    # this automatically from trainable_modules. Eval paths fuse whenever
    # the backend supports it regardless of this flag.
    fused_backbone: bool = False
    # Route the trunk through the DIFFERENTIABLE fused block kernel
    # (custom-VJP Pallas backward, ops/hiera_block_bwd.py) during training —
    # for encoder-trainable combos. make_train_step sets this automatically
    # when image_encoder is in trainable_modules. Mutually exclusive with
    # fused_backbone.
    fused_backbone_vjp: bool = False

    @property
    def trunk_config(self) -> HieraConfig:
        return HIERA_PRESETS[self.backbone]

    @property
    def image_encoder_config(self) -> image_encoder_mod.ImageEncoderConfig:
        return image_encoder_mod.ImageEncoderConfig(
            trunk=self.trunk_config, d_model=self.d_model, scalp=1,
            fpn_top_down_levels=(2, 3), num_pos_feats=self.d_model)

    @property
    def feat_size(self) -> int:
        return self.image_size // self.backbone_stride

    @property
    def num_spatial_tokens(self) -> int:
        return self.feat_size * self.feat_size

    @property
    def prompt_encoder_config(self) -> prompt_encoder_mod.PromptEncoderConfig:
        return prompt_encoder_mod.PromptEncoderConfig(
            embed_dim=self.d_model,
            image_embedding_size=(self.feat_size, self.feat_size),
            input_image_size=(self.image_size, self.image_size),
            mask_in_chans=16)

    @property
    def mask_decoder_config(self) -> mask_decoder_mod.MaskDecoderConfig:
        return mask_decoder_mod.MaskDecoderConfig(
            transformer_dim=self.d_model,
            use_high_res_features=self.use_high_res_features_in_sam,
            iou_prediction_use_sigmoid=self.iou_prediction_use_sigmoid,
            pred_obj_scores=self.pred_obj_scores,
            pred_obj_scores_mlp=self.pred_obj_scores_mlp,
            use_multimask_token_for_obj_ptr=self.use_multimask_token_for_obj_ptr,
            dynamic_multimask_via_stability=self.dynamic_multimask_via_stability)

    @property
    def memory_attention_config(self) -> memory_attention_mod.MemoryAttentionConfig:
        return memory_attention_mod.MemoryAttentionConfig(
            d_model=self.d_model, kv_in_dim=self.mem_dim,
            use_flash=self.use_flash_attention)

    @property
    def memory_encoder_config(self) -> memory_encoder_mod.MemoryEncoderConfig:
        return memory_encoder_mod.MemoryEncoderConfig(
            out_dim=self.mem_dim, in_dim=self.d_model)

    @property
    def ptr_tokens_per_obj(self) -> int:
        return self.d_model // self.mem_dim  # pointer splits into these many

    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


# Named sub-modules for freezing / fine-tuning combos (sam2model.py:550-565).
MODULE_MAPPING = {
    "image_encoder": ("image_encoder",),
    "memory_attention": ("memory_attention",),
    "memory_encoder": ("memory_encoder",),
    "prompt_encoder": ("sam_prompt_encoder",),
    "mask_decoder": ("sam_mask_decoder",),
    "obj_ptr_proj": ("obj_ptr_proj",),
    "obj_ptr_tpos_proj": ("obj_ptr_tpos_proj",),
}


def init(key, cfg: SAM2Config):
    ks = jax.random.split(key, 12)
    p: dict[str, Any] = {
        "image_encoder": image_encoder_mod.init(ks[0], cfg.image_encoder_config),
        "memory_attention": memory_attention_mod.init(
            ks[1], cfg.memory_attention_config),
        "memory_encoder": memory_encoder_mod.init(
            ks[2], cfg.memory_encoder_config),
        "sam_prompt_encoder": prompt_encoder_mod.init(
            ks[3], cfg.prompt_encoder_config),
        "sam_mask_decoder": mask_decoder_mod.init(ks[4], cfg.mask_decoder_config),
        "maskmem_tpos_enc": nn.trunc_normal(
            ks[5], (cfg.num_maskmem, 1, 1, cfg.mem_dim)),
        "no_mem_embed": nn.trunc_normal(ks[6], (1, 1, cfg.d_model)),
        "no_mem_pos_enc": nn.trunc_normal(ks[7], (1, 1, cfg.d_model)),
    }
    if cfg.use_obj_ptrs_in_encoder:
        p["mask_downsample"] = nn.conv2d_init(ks[8], 1, 1, 4)
        if cfg.use_mlp_for_obj_ptr_proj:
            p["obj_ptr_proj"] = nn.mlp_init(ks[9], cfg.d_model, cfg.d_model,
                                            cfg.d_model, 3)
        else:
            p["obj_ptr_proj"] = nn.linear_init(ks[9], cfg.d_model, cfg.d_model)
    if cfg.pred_obj_scores and cfg.use_obj_ptrs_in_encoder:
        p["no_obj_ptr"] = nn.trunc_normal(ks[10], (1, cfg.d_model))
    if cfg.proj_tpos_enc_in_obj_ptrs:
        p["obj_ptr_tpos_proj"] = nn.linear_init(ks[11], cfg.d_model, cfg.mem_dim)
    if cfg.no_obj_embed_spatial:
        p["no_obj_embed_spatial"] = nn.trunc_normal(
            jax.random.fold_in(key, 99), (1, cfg.mem_dim))
    return p


# ---------------------------------------------------------------------------
# Image encoding
# ---------------------------------------------------------------------------


def forward_image(p, cfg: SAM2Config, images: jnp.ndarray,
                  allow_fused: bool | None = None,
                  fused_vjp: bool = False):
    """images: [B, H, W, 3] f32 ImageNet-normalized, or raw uint8 (the
    compact H2D contract — normalized here on device with the exact host
    arithmetic, data/coco.py:26-27). -> dict with the three FPN levels
    (strides 4, 8, 16) where levels 0/1 are already projected by the mask
    decoder's conv_s0/conv_s1 (sam2_base.py:497-506), plus the sine PEs.

    ``allow_fused`` gates the forward-only fused Hiera block kernel; None
    defers to ``cfg.fused_backbone`` (training callers) — eval callers pass
    True explicitly."""
    if allow_fused is None:
        allow_fused = cfg.fused_backbone
    if images.dtype == jnp.uint8:
        from ..data.coco import IMAGENET_MEAN, IMAGENET_STD
        images = (images.astype(jnp.float32) / 255.0
                  - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    images = images.astype(cfg.dtype())
    out = image_encoder_mod.apply(p["image_encoder"], images,
                                  cfg.image_encoder_config,
                                  allow_fused=allow_fused,
                                  fused_vjp=fused_vjp and not allow_fused)
    fpn = out["backbone_fpn"]
    if cfg.use_high_res_features_in_sam:
        fpn = list(fpn)
        fpn[0] = nn.conv2d(p["sam_mask_decoder"]["conv_s0"], fpn[0])
        fpn[1] = nn.conv2d(p["sam_mask_decoder"]["conv_s1"], fpn[1])
    return {"backbone_fpn": fpn, "vision_pos_enc": out["vision_pos_enc"]}


# ---------------------------------------------------------------------------
# SAM heads
# ---------------------------------------------------------------------------


def forward_sam_heads(p, cfg: SAM2Config, backbone_features,
                      point_coords=None, point_labels=None, mask_inputs=None,
                      high_res_features=None, multimask_output=False,
                      training=True):
    """SAM prompt-encode + mask-decode (sam2_base.py:262-434).

    backbone_features: [B, H16, W16, C] NHWC (memory-conditioned)
    point_coords/labels: [B, P, 2]/[B, P] or None (None -> 1 padding point)
    mask_inputs: [B, H, W, 1] at image or mask-input resolution, or None
    high_res_features: (s0 [B, 4H, 4W, C/8], s1 [B, 2H, 2W, C/4]) projected
    Returns dict with low/high-res multimasks and best masks, ious, obj_ptr,
    object_score_logits.
    """
    pe_cfg = cfg.prompt_encoder_config
    md_cfg = cfg.mask_decoder_config
    B = backbone_features.shape[0]

    if point_coords is None:
        point_coords = jnp.zeros((B, 1, 2), jnp.float32)
        point_labels = -jnp.ones((B, 1), jnp.int32)

    if mask_inputs is not None:
        target_hw = (4 * cfg.feat_size, 4 * cfg.feat_size)
        if mask_inputs.shape[1:3] != target_hw:
            m = jnp.moveaxis(mask_inputs.astype(jnp.float32), -1, 1)
            m = resize_bilinear(m, target_hw)
            sam_mask_prompt = jnp.moveaxis(m, 1, -1)
        else:
            sam_mask_prompt = mask_inputs.astype(jnp.float32)
        dense = prompt_encoder_mod.embed_masks(
            p["sam_prompt_encoder"], sam_mask_prompt.astype(cfg.dtype()))
    else:
        dense = prompt_encoder_mod.no_mask_dense(
            p["sam_prompt_encoder"], pe_cfg, B).astype(cfg.dtype())

    sparse = prompt_encoder_mod.embed_points(
        p["sam_prompt_encoder"], pe_cfg, point_coords, point_labels,
        pad=True).astype(cfg.dtype())

    image_pe = prompt_encoder_mod.get_dense_pe(p["sam_prompt_encoder"], pe_cfg)

    def _decode(feats, sparse_e, dense_e, hr0, hr1):
        hrf = (hr0, hr1) if cfg.use_high_res_features_in_sam else None
        return mask_decoder_mod.apply(
            p["sam_mask_decoder"], md_cfg, feats, image_pe, sparse_e, dense_e,
            multimask_output=multimask_output, high_res_features=hrf,
            training=training)

    hr0 = high_res_features[0] if high_res_features is not None else None
    hr1 = high_res_features[1] if high_res_features is not None else None
    if cfg.resolved_remat_mode() != "none" and training:
        _decode = jax.checkpoint(_decode)
    low_res_multimasks, ious, sam_output_tokens, object_score_logits = _decode(
        backbone_features.astype(cfg.dtype()), sparse, dense, hr0, hr1)

    if cfg.pred_obj_scores:
        is_obj_appearing = object_score_logits > 0  # [B, 1]
        low_res_multimasks = jnp.where(
            is_obj_appearing[..., None, None],  # [B, 1, 1, 1]
            low_res_multimasks, NO_OBJ_SCORE)

    low_res_multimasks = low_res_multimasks.astype(jnp.float32)
    high_res_multimasks = resize_bilinear(
        low_res_multimasks, (cfg.image_size, cfg.image_size))

    sam_output_token = sam_output_tokens[:, 0]
    if multimask_output:
        best = jnp.argmax(ious, axis=-1)
        bi = jnp.arange(B)
        low_res_masks = low_res_multimasks[bi, best][:, None]
        high_res_masks = high_res_multimasks[bi, best][:, None]
        if sam_output_tokens.shape[1] > 1:
            sam_output_token = sam_output_tokens[bi, best]
    else:
        low_res_masks, high_res_masks = low_res_multimasks, high_res_multimasks

    if cfg.use_obj_ptrs_in_encoder:
        if cfg.use_mlp_for_obj_ptr_proj:
            obj_ptr = nn.mlp(p["obj_ptr_proj"], sam_output_token,
                             activation="relu")
        else:
            obj_ptr = nn.linear(p["obj_ptr_proj"], sam_output_token)
    else:
        obj_ptr = sam_output_token
    if cfg.pred_obj_scores:
        lam = (jax.nn.sigmoid(object_score_logits)
               if cfg.soft_no_obj_ptr
               else is_obj_appearing.astype(obj_ptr.dtype))
        if cfg.fixed_no_obj_ptr:
            obj_ptr = lam * obj_ptr
        obj_ptr = obj_ptr + (1.0 - lam) * p["no_obj_ptr"].astype(obj_ptr.dtype)

    return {
        "low_res_multimasks": low_res_multimasks,
        "high_res_multimasks": high_res_multimasks,
        "ious": ious.astype(jnp.float32),
        "low_res_masks": low_res_masks,
        "high_res_masks": high_res_masks,
        "obj_ptr": obj_ptr.astype(jnp.float32),
        "object_score_logits": object_score_logits.astype(jnp.float32),
    }


def use_mask_as_output(p, cfg: SAM2Config, backbone_features,
                       high_res_features, mask_inputs, training=True):
    """Directly turn binary mask inputs into output logits, bypassing the SAM
    head (sam2_base.py:436-486). mask_inputs: [B, H, W, 1] at image res."""
    out_scale, out_bias = 20.0, -10.0
    mask_f = mask_inputs.astype(jnp.float32)
    # [B, 1, H, W] logits layout for parity with head outputs
    high_res_masks = jnp.moveaxis(mask_f, -1, 1) * out_scale + out_bias
    low_res_masks = resize_bilinear(
        high_res_masks,
        (high_res_masks.shape[-2] // 4, high_res_masks.shape[-1] // 4))
    B = mask_inputs.shape[0]
    ious = jnp.ones((B, 1), jnp.float32)
    if not cfg.use_obj_ptrs_in_encoder:
        obj_ptr = jnp.zeros((B, cfg.d_model), jnp.float32)
    else:
        ds_mask = nn.conv2d(p["mask_downsample"], mask_f.astype(cfg.dtype()),
                            stride=4)
        head_out = forward_sam_heads(
            p, cfg, backbone_features, mask_inputs=ds_mask,
            high_res_features=high_res_features, training=training)
        obj_ptr = head_out["obj_ptr"]
    is_obj_appearing = jnp.any(
        mask_f.reshape(B, -1) > 0.0, axis=1)[..., None].astype(jnp.float32)
    object_score_logits = out_scale * is_obj_appearing + out_bias
    if cfg.pred_obj_scores:
        if cfg.fixed_no_obj_ptr:
            obj_ptr = is_obj_appearing * obj_ptr
        obj_ptr = obj_ptr + (1.0 - is_obj_appearing) * p["no_obj_ptr"]
    return {
        "low_res_multimasks": low_res_masks,
        "high_res_multimasks": high_res_masks,
        "ious": ious,
        "low_res_masks": low_res_masks,
        "high_res_masks": high_res_masks,
        "obj_ptr": obj_ptr.astype(jnp.float32),
        "object_score_logits": object_score_logits,
    }


# ---------------------------------------------------------------------------
# Memory encoding
# ---------------------------------------------------------------------------


def encode_new_memory(p, cfg: SAM2Config, pix_feat, high_res_masks,
                      object_score_logits, training=True,
                      apply_non_overlap=False):
    """pix_feat: [B, H16, W16, C] (raw backbone, not memory-conditioned);
    high_res_masks: [B, 1, H, W] logits. Returns (mem [B, H16, W16, mem_dim],
    pos [H16, W16, mem_dim]). (sam2_base.py:715-769)"""
    if apply_non_overlap and not training:
        high_res_masks = apply_non_overlapping_constraints(high_res_masks)
    mask_for_mem = jax.nn.sigmoid(high_res_masks)
    mask_for_mem = (mask_for_mem * cfg.sigmoid_scale_for_mem_enc
                    + cfg.sigmoid_bias_for_mem_enc)
    mask_nhwc = jnp.moveaxis(mask_for_mem, 1, -1).astype(cfg.dtype())

    # The fused Pallas memory encoder has no VJP: it is safe exactly when no
    # cotangent can reach its output — always at eval, and in training when
    # the bank entries are detached (the reference's semantics,
    # sam2model.py:345-358: the output's ONLY consumer is the detached bank,
    # so the encoder's backward does not exist in the compiled program).
    allow_fused = (not training) or cfg.detach_memory_bank

    def _enc(pf, m):
        return memory_encoder_mod.apply(
            p["memory_encoder"], cfg.memory_encoder_config, pf, m,
            allow_fused=allow_fused)

    if cfg.resolved_remat_mode() != "none" and training:
        _enc = jax.checkpoint(_enc)
    mem, pos = _enc(pix_feat.astype(cfg.dtype()), mask_nhwc)
    if cfg.no_obj_embed_spatial:
        is_obj = (object_score_logits > 0).astype(mem.dtype)  # [B, 1]
        mem = mem + (1.0 - is_obj[:, :, None, None]) * \
            p["no_obj_embed_spatial"].astype(mem.dtype).reshape(1, 1, 1, -1)
    return mem, pos


def apply_non_overlapping_constraints(pred_masks):
    """Keep only the highest-scoring object per pixel (sam2_base.py:942-960).
    pred_masks: [B_obj, 1, H, W]."""
    batch_size = pred_masks.shape[0]
    if batch_size == 1:
        return pred_masks
    max_obj = jnp.argmax(pred_masks, axis=0, keepdims=True)
    keep = max_obj == jnp.arange(batch_size)[:, None, None, None]
    return jnp.where(keep, pred_masks, jnp.clip(pred_masks, max=-10.0))


# ---------------------------------------------------------------------------
# Memory-conditioned features (fixed-shape memory bank)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MemoryLayout:
    """Static geometry of the fused memory sequence."""
    num_maskmem: int          # spatial slots incl. conditioning slot
    tokens_per_slot: int      # H16*W16
    num_ptrs: int             # pointer slots incl. conditioning pointer
    tokens_per_ptr: int       # d_model // mem_dim

    @property
    def num_spatial_tokens(self) -> int:
        return self.num_maskmem * self.tokens_per_slot

    @property
    def total_tokens(self) -> int:
        return self.num_spatial_tokens + self.num_ptrs * self.tokens_per_ptr


def memory_layout(cfg: SAM2Config, num_frames: int) -> MemoryLayout:
    max_ptrs = min(num_frames, cfg.max_obj_ptrs_in_encoder)
    return MemoryLayout(
        num_maskmem=cfg.num_maskmem,
        tokens_per_slot=cfg.num_spatial_tokens,
        num_ptrs=max_ptrs if cfg.use_obj_ptrs_in_encoder else 0,
        tokens_per_ptr=cfg.ptr_tokens_per_obj)


def fuse_memory(p, cfg: SAM2Config, layout: MemoryLayout,
                curr_feat, curr_pos, spatial_mem, spatial_valid,
                mem_pos_spatial, tpos_index, obj_ptrs, ptr_valid, ptr_tpos,
                training=True, t_diff_max=None):
    """Run memory attention over the fixed-shape memory bank.

    curr_feat:      [O, HW, C]   current-frame stride-16 features
    curr_pos:       [HW, C]      sine PE of the feature grid
    spatial_mem:    [M, O, HW, mem_dim]  slot 0 = conditioning frame,
                                         slot j>=1 = frame (j) steps back
    spatial_valid:  [M] bool, or None when every slot is statically valid
                    (the unrolled static-prefix path slices the bank
                    instead of masking)
    mem_pos_spatial:[HW, mem_dim]  per-slot spatial sine PE (shared)
    tpos_index:     [M] int  index into maskmem_tpos_enc per slot
    obj_ptrs:       [P, O, C]  pointer slots (0 = conditioning pointer)
    ptr_valid:      [P] bool, or None when all statically valid
    ptr_tpos:       [P] float  temporal distances (already signed)
    Returns [O, HW, C].
    """
    M, O, HW, mem_dim = spatial_mem.shape
    C = cfg.d_model
    dt = cfg.dtype()

    tpos = p["maskmem_tpos_enc"][tpos_index][:, 0]  # [M, 1, mem_dim]
    mem_pos = mem_pos_spatial[None] + tpos  # [M, HW, mem_dim]
    mem_pos = jnp.broadcast_to(mem_pos[:, None], (M, O, HW, mem_dim))

    memory = spatial_mem.transpose(1, 0, 2, 3).reshape(O, M * HW, mem_dim)
    memory_pos = mem_pos.transpose(1, 0, 2, 3).reshape(O, M * HW, mem_dim)

    token_valid = (jnp.repeat(spatial_valid, HW)
                   if spatial_valid is not None else None)  # [M*HW]

    if layout.num_ptrs > 0:
        P, tpp = layout.num_ptrs, layout.tokens_per_ptr
        if t_diff_max is None:
            t_diff_max = max(P - 1, 1)
        if cfg.add_tpos_enc_to_obj_ptrs:
            tdim = C if cfg.proj_tpos_enc_in_obj_ptrs else cfg.mem_dim
            pos1d = sine_pe_1d(ptr_tpos / t_diff_max, tdim)  # [P, tdim]
            if cfg.proj_tpos_enc_in_obj_ptrs:
                pos1d = nn.linear(p["obj_ptr_tpos_proj"], pos1d)
        else:
            pos1d = jnp.zeros((P, cfg.mem_dim), jnp.float32)
        # split each pointer into C/mem_dim tokens (ptr-major order)
        ptr_tok = obj_ptrs.transpose(1, 0, 2).reshape(O, P, tpp, mem_dim)
        ptr_tok = ptr_tok.reshape(O, P * tpp, mem_dim)
        ptr_pos = jnp.repeat(pos1d, tpp, axis=0)  # [P*tpp, mem_dim]
        ptr_pos = jnp.broadcast_to(ptr_pos[None], (O, P * tpp, mem_dim))
        memory = jnp.concatenate([memory, ptr_tok], axis=1)
        memory_pos = jnp.concatenate([memory_pos, ptr_pos], axis=1)
        if token_valid is not None or ptr_valid is not None:
            token_valid = jnp.concatenate([
                (token_valid if token_valid is not None
                 else jnp.ones((layout.num_spatial_tokens,), bool)),
                (jnp.repeat(ptr_valid, tpp) if ptr_valid is not None
                 else jnp.ones((P * tpp,), bool))])

    def _attend(cf, mem, mem_p):
        return memory_attention_mod.apply(
            p["memory_attention"], cfg.memory_attention_config,
            cf, mem, curr_pos[None].astype(dt), mem_p,
            feat_hw=(cfg.feat_size, cfg.feat_size),
            num_spatial_k=layout.num_spatial_tokens, key_valid=token_valid)

    if cfg.resolved_remat_mode() != "none" and training:
        _attend = jax.checkpoint(_attend)
    out = _attend(curr_feat.astype(dt), memory.astype(dt),
                  memory_pos.astype(dt))
    return out
