"""Category-merge parity: static one-hot segment ops vs a dynamic-loop torch
re-derivation of merge_object_results_to_category (reference
utils/masks.py:53-213)."""

import numpy as np
import torch

import jax.numpy as jnp

from sam2_video_tpu.utils.merging import (category_onehot, grouped_max,
                                          grouped_weighted_avg,
                                          merge_objects_to_categories)


def torch_reference_merge(masks, ious, scores, obj_to_cat, num_categories):
    """Dynamic re-implementation: per-category pixelwise max of mask logits;
    area-weighted (sum of sigmoid) average of ious/scores with mean fallback;
    empty categories -> zeros."""
    masks_t = torch.from_numpy(masks)          # [O, M, H, W]
    weights = torch.sigmoid(masks_t).sum(dim=(1, 2, 3))
    groups = [[] for _ in range(num_categories)]
    for o, c in enumerate(obj_to_cat):
        if c >= 0:
            groups[c].append(o)
    out_masks, out_ious, out_scores = [], [], []
    for idxs in groups:
        if not idxs:
            out_masks.append(torch.zeros_like(masks_t[0]))
            out_ious.append(torch.zeros_like(torch.from_numpy(ious)[0]))
            out_scores.append(torch.zeros_like(torch.from_numpy(scores)[0]))
            continue
        out_masks.append(masks_t[idxs].max(dim=0).values)
        w = weights[idxs]
        denom = w.sum()
        iou_sub = torch.from_numpy(ious)[idxs]
        sc_sub = torch.from_numpy(scores)[idxs]
        if denom == 0:
            out_ious.append(iou_sub.mean(dim=0))
            out_scores.append(sc_sub.mean(dim=0))
        else:
            wv = w.view(-1, 1)
            out_ious.append((iou_sub * wv).sum(dim=0) / denom)
            out_scores.append((sc_sub * wv).sum(dim=0) / denom)
    return (torch.stack(out_masks).numpy(), torch.stack(out_ious).numpy(),
            torch.stack(out_scores).numpy())


def test_merge_matches_reference_math(rng):
    O, C, M, H, W = 5, 3, 1, 16, 16
    masks = (rng.standard_normal((O, M, H, W)) * 2).astype(np.float32)
    ious = rng.random((O, M)).astype(np.float32)
    scores = rng.standard_normal((O, 1)).astype(np.float32)
    obj_to_cat = np.asarray([0, 0, 1, 1, -1], np.int32)  # cat 2 empty + pad

    outs = {
        "high_res_multimasks": jnp.asarray(masks)[None],
        "high_res_masks": jnp.asarray(masks)[None],
        "ious": jnp.asarray(ious)[None],
        "object_score_logits": jnp.asarray(scores)[None],
    }
    merged = merge_objects_to_categories(outs, jnp.asarray(obj_to_cat), C)
    want_m, want_i, want_s = torch_reference_merge(masks, ious, scores,
                                                   obj_to_cat, C)
    np.testing.assert_allclose(np.asarray(merged["high_res_multimasks"][0]),
                               want_m, atol=1e-5)
    np.testing.assert_allclose(np.asarray(merged["ious"][0]), want_i,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(merged["object_score_logits"][0]),
                               want_s, atol=1e-5)
    # empty category -> zeros
    np.testing.assert_array_equal(
        np.asarray(merged["high_res_multimasks"][0, 2]), 0.0)


def test_grouped_max_with_all_negative_logits(rng):
    """The masked max must not leak the -inf fill for valid members."""
    x = -np.abs(rng.standard_normal((3, 4, 4))).astype(np.float32) - 5
    member = category_onehot(jnp.asarray([0, 0, 1], jnp.int32), 2)
    out = np.asarray(grouped_max(jnp.asarray(x), member))
    np.testing.assert_allclose(out[0], np.maximum(x[0], x[1]), atol=1e-6)
    np.testing.assert_allclose(out[1], x[2], atol=1e-6)


def test_grouped_weighted_avg_zero_weight_fallback():
    x = jnp.asarray([[2.0], [4.0]])
    member = category_onehot(jnp.asarray([0, 0], jnp.int32), 1)
    w = jnp.asarray([0.0, 0.0])
    out = np.asarray(grouped_weighted_avg(x, member, w))
    np.testing.assert_allclose(out, [[3.0]])  # mean fallback
