"""Training losses.

Parity spec: /root/reference/sam2_video/model/losses.py —
``multi_step_loss`` == MultiStepMultiMasksAndIous (:79-248) and
``bce_category_loss`` == BCECategoryLoss (:251-372).

The reference filters valid categories with boolean indexing (dynamic shapes)
and renormalizes by the filtered count (:143-174). Here validity is a mask and
the normalizations reproduce the same arithmetic with static shapes:
per frame, ``num_objects`` = (#valid categories) * M after the reference's
flatten of the [C, M] grid (:164-174), so each per-row loss is divided by that
count and summed — identical totals, jit-compatible.

The reference *raises* on frames with no valid mask (:161). Data-pipeline
invariants make that unreachable (empty-mask frames are skipped at load time,
dataset.py:207-211); for safety a degenerate frame contributes zero loss and
is surfaced via the ``frames_without_valid`` diagnostic instead of a crash
(you cannot raise data-dependently under jit).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

CORE_LOSS_KEY = "total_loss"


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Mirrors the reference's ``loss`` config node (configs/config.yaml:57-76)."""
    type: str = "multi_step"                  # {multi_step, bce}
    gt_stride: int = 1
    weight_dict: Any = dataclasses.field(default_factory=lambda: {
        "loss_mask": 20.0, "loss_dice": 1.0, "loss_iou": 1.0,
        "loss_class": 0.0})
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    supervise_all_iou: bool = True
    iou_use_l1_loss: bool = True
    pred_obj_scores: bool = False
    focal_gamma_obj_score: float = 0.0
    focal_alpha_obj_score: float = -1.0
    multistep_logit_temperature: float = 1.0
    bce_logit_temperature: float = 1.0
    bce_pos_weight: Any = None
    bce_reduction: str = "mean"


def _sigmoid_focal(inputs, targets, alpha, gamma):
    """Per-element focal loss (losses.py:37-52), f32."""
    inputs = inputs.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    ce = jnp.maximum(inputs, 0) - inputs * targets + jnp.log1p(
        jnp.exp(-jnp.abs(inputs)))
    prob = jax.nn.sigmoid(inputs)
    p_t = prob * targets + (1 - prob) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss


def _dice_per_row(inputs, targets):
    """inputs/targets: [..., HW] logits/binary -> [...] dice loss."""
    p = jax.nn.sigmoid(inputs.astype(jnp.float32))
    t = targets.astype(jnp.float32)
    num = 2 * jnp.sum(p * t, axis=-1)
    den = jnp.sum(p, axis=-1) + jnp.sum(t, axis=-1)
    return 1 - (num + 1) / (den + 1)


def _actual_iou(inputs, targets):
    pred = inputs > 0
    gt = targets > 0
    inter = jnp.sum(pred & gt, axis=-1).astype(jnp.float32)
    union = jnp.sum(pred | gt, axis=-1).astype(jnp.float32)
    return inter / jnp.maximum(union, 1.0)


def multi_step_loss(cfg: LossConfig, per_cat: dict, targets: jnp.ndarray):
    """per_cat: dict with high_res_multimasks [T, C, M, H, W], ious [T, C, M],
    object_score_logits [T, C, 1]; targets: [T, C, H, W] bool.
    Returns dict of scalar losses incl. CORE_LOSS_KEY.
    """
    src = per_cat["high_res_multimasks"].astype(jnp.float32)
    src = src / cfg.multistep_logit_temperature
    T, C, M, H, W = src.shape
    tgt = jnp.broadcast_to(targets[:, :, None].astype(jnp.float32),
                           src.shape)

    valid = jnp.sum(targets, axis=(-2, -1)) > 0          # [T, C]
    validm = jnp.broadcast_to(valid[:, :, None], (T, C, M))  # [T, C, M]
    # reference num_objects per frame = #valid rows of the flattened [C, M]
    num_obj = jnp.maximum(jnp.sum(validm, axis=(1, 2)), 1).astype(jnp.float32)

    flat_src = src.reshape(T, C, M, H * W)
    flat_tgt = tgt.reshape(T, C, M, H * W)

    focal = jnp.mean(
        _sigmoid_focal(flat_src, flat_tgt, cfg.focal_alpha, cfg.focal_gamma),
        axis=-1)                                          # [T, C, M]
    dice = _dice_per_row(flat_src, flat_tgt)              # [T, C, M]
    ious = per_cat["ious"].astype(jnp.float32)            # [T, C, M]
    actual = _actual_iou(flat_src, flat_tgt)
    iou_err = (jnp.abs(ious - actual) if cfg.iou_use_l1_loss
               else (ious - actual) ** 2)

    vm = validm.astype(jnp.float32)
    loss_mask = jnp.sum(jnp.sum(focal * vm, axis=(1, 2)) / num_obj)
    loss_dice = jnp.sum(jnp.sum(dice * vm, axis=(1, 2)) / num_obj)
    loss_iou = jnp.sum(jnp.sum(iou_err * vm, axis=(1, 2)) / num_obj)

    if cfg.pred_obj_scores:
        osl = per_cat["object_score_logits"].astype(jnp.float32)  # [T, C, 1]
        target_obj = valid[:, :, None].astype(jnp.float32)
        cls = _sigmoid_focal(osl, target_obj, cfg.focal_alpha_obj_score,
                             cfg.focal_gamma_obj_score)[..., 0]   # [T, C]
        loss_class = jnp.sum(
            jnp.sum(cls * valid.astype(jnp.float32), axis=1) / num_obj)
    else:
        loss_class = jnp.zeros(())

    losses = {"loss_mask": loss_mask, "loss_dice": loss_dice,
              "loss_iou": loss_iou, "loss_class": loss_class}
    total = jnp.zeros(())
    for k, w in cfg.weight_dict.items():
        if float(w) != 0.0:
            total = total + float(w) * losses[k]
    losses[CORE_LOSS_KEY] = total
    losses["frames_without_valid"] = jnp.sum(
        (jnp.sum(valid, axis=1) == 0).astype(jnp.float32))
    return losses


def bce_category_loss(cfg: LossConfig, per_cat: dict, targets: jnp.ndarray):
    """BCE-with-logits over valid category channels, averaged over frames
    (losses.py:307-372). per_cat high_res_masks: [T, C, 1, H, W]."""
    logits = per_cat["high_res_masks"].astype(jnp.float32)[:, :, 0]  # [T,C,H,W]
    logits = logits / cfg.bce_logit_temperature
    t = targets.astype(jnp.float32)
    valid = jnp.sum(t, axis=(-2, -1)) > 0                 # [T, C]

    ce = jnp.maximum(logits, 0) - logits * t + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    if cfg.bce_pos_weight is not None:
        pw = jnp.asarray(cfg.bce_pos_weight, jnp.float32).reshape(1, -1, 1, 1)
        # torch pos_weight multiplies only the positive term
        ce = jnp.where(t > 0, pw * ce, ce)

    vm = valid[:, :, None, None].astype(jnp.float32)
    H, W = logits.shape[-2:]
    per_frame_cnt = jnp.maximum(jnp.sum(valid, axis=1), 1).astype(jnp.float32)
    if cfg.bce_reduction == "mean":
        per_frame = jnp.sum(ce * vm, axis=(1, 2, 3)) / (per_frame_cnt * H * W)
    else:  # sum
        per_frame = jnp.sum(ce * vm, axis=(1, 2, 3))
    total = jnp.mean(per_frame)
    return {"loss_bce": total, CORE_LOSS_KEY: total,
            "frames_without_valid": jnp.sum(
                (jnp.sum(valid, axis=1) == 0).astype(jnp.float32))}


def apply_gt_stride(per_cat: dict, targets: jnp.ndarray, gt_stride: int):
    """Subsample frames 0, k, 2k... for the loss (trainer.py:190-203)."""
    if gt_stride <= 1:
        return per_cat, targets
    idx = jnp.arange(0, targets.shape[0], gt_stride)
    return (jax.tree.map(lambda x: x[idx], per_cat), targets[idx])


def compute_loss(cfg: LossConfig, per_cat: dict, targets: jnp.ndarray):
    per_cat, targets = apply_gt_stride(per_cat, targets, cfg.gt_stride)
    if cfg.type in ("bce", "bce_only", "ce_only"):
        return bce_category_loss(cfg, per_cat, targets)
    return multi_step_loss(cfg, per_cat, targets)
