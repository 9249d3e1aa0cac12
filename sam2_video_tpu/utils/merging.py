"""Merge per-object predictions back to per-category predictions.

Parity spec: /root/reference/sam2_video/utils/masks.py:53-213
(merge_object_results_to_category): mask logits merge by pixelwise max within
a category; IoU/score tensors merge by area-weighted average (weights = sum of
sigmoid(mask logits) per object) with mean fallback when weights vanish.

TPU re-design: the reference loops over Python lists of per-category object
indices; here membership is a static one-hot [O, C] matrix (from the padded
``obj_to_cat``) and the merges are einsums/maxima over the object axis —
no host round-trip, works under jit/vmap/scan.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax


def category_onehot(obj_to_cat: jnp.ndarray, num_categories: int) -> jnp.ndarray:
    """[O] int (-1 = invalid) -> [O, C] f32 membership matrix."""
    return (obj_to_cat[:, None] == jnp.arange(num_categories)[None, :]
            ).astype(jnp.float32)


def grouped_max(x: jnp.ndarray, member: jnp.ndarray) -> jnp.ndarray:
    """Pixelwise max across member objects per category.

    x: [O, ...]; member: [O, C]. Returns [C, ...]; empty categories get 0
    (reference `_grouped_max` emits zeros for empty groups)."""
    extra = x.ndim - 1
    m = member.reshape(member.shape + (1,) * extra)  # [O, C, 1...]
    xe = x[:, None]  # [O, 1, ...]
    masked = jnp.where(m > 0, xe, -jnp.inf)
    mx = jnp.max(masked, axis=0)  # [C, ...]
    has_member = (jnp.sum(member, axis=0) > 0).reshape(
        member.shape[1:2] + (1,) * extra)
    return jnp.where(has_member, mx, 0.0)


def grouped_weighted_avg(x: jnp.ndarray, member: jnp.ndarray,
                         weights: jnp.ndarray) -> jnp.ndarray:
    """Weighted average across member objects per category.

    x: [O, ...]; member: [O, C]; weights: [O]. Empty categories -> 0;
    zero-weight categories -> plain mean over members."""
    extra = x.ndim - 1
    m = member.reshape(member.shape + (1,) * extra)
    w = weights.reshape(-1, *([1] * (1 + extra)))
    xe = x[:, None]
    wsum = jnp.sum(m * w, axis=0)                      # [C, ...]
    wx = jnp.sum(m * w * xe, axis=0)
    cnt = jnp.sum(m, axis=0)
    sx = jnp.sum(m * xe, axis=0)
    mean = sx / jnp.maximum(cnt, 1.0)
    avg = jnp.where(wsum > 0, wx / jnp.where(wsum > 0, wsum, 1.0), mean)
    return jnp.where(cnt > 0, avg, 0.0)


def merge_objects_to_categories(outs: dict, obj_to_cat: jnp.ndarray,
                                num_categories: int) -> dict:
    """outs fields are [T, O, ...] per-object arrays:
      - high_res_multimasks [T, O, M, H, W], low_res_multimasks,
        ious [T, O, M], object_score_logits [T, O, 1]
    Returns same keys with O -> C. Weights derive from sigmoid of the
    *per-object best* high-res mask (masks.py:92-100 uses pred_masks_high_res).
    """
    member = category_onehot(obj_to_cat, num_categories)  # [O, C]

    def per_frame(frame):
        weights = jnp.sum(
            jax.nn.sigmoid(frame["high_res_masks"]), axis=(1, 2, 3))  # [O]
        out = {}
        for k in ("low_res_masks", "high_res_masks",
                  "low_res_multimasks", "high_res_multimasks"):
            if k in frame:
                out[k] = grouped_max(frame[k], member)
        for k in ("ious", "object_score_logits"):
            if k in frame:
                out[k] = grouped_weighted_avg(frame[k], member, weights)
        return out

    return jax.vmap(per_frame)(outs)
