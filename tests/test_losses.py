"""Loss parity tests: static-masked jnp losses vs a dynamic-filtering torch
re-implementation of the reference formulas (losses.py:79-372)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from sam2_video_tpu.training.losses import (CORE_LOSS_KEY, LossConfig,
                                            bce_category_loss, compute_loss,
                                            multi_step_loss)


def torch_reference_multistep(src, tgt, ious, weight_dict, alpha=0.25,
                              gamma=2.0, temperature=1.0, use_l1=True):
    """Dynamic-filtering re-derivation of MultiStepMultiMasksAndIous for M=1."""
    total = {"loss_mask": 0.0, "loss_dice": 0.0, "loss_iou": 0.0}
    T = src.shape[0]
    for t in range(T):
        s = torch.from_numpy(src[t])          # [C, M, H, W]
        g = torch.from_numpy(tgt[t]).float()  # [C, H, W]
        i = torch.from_numpy(ious[t])         # [C, M]
        g = g.unsqueeze(1).expand_as(s)
        valid = g.sum(dim=(2, 3)).bool()      # [C, M]
        s = s[valid].unsqueeze(1) / temperature
        g = g[valid].unsqueeze(1)
        i = i[valid].unsqueeze(1)
        n = float(s.shape[0])
        # focal
        ce = F.binary_cross_entropy_with_logits(s, g, reduction="none")
        p = s.sigmoid()
        pt = p * g + (1 - p) * (1 - g)
        fl = ce * (1 - pt) ** gamma
        fl = (alpha * g + (1 - alpha) * (1 - g)) * fl
        total["loss_mask"] += (fl.flatten(2).mean(-1) / n).sum().item()
        # dice
        pf = p.flatten(2)
        gf = g.flatten(2)
        dice = 1 - (2 * (pf * gf).sum(-1) + 1) / (pf.sum(-1) + gf.sum(-1) + 1)
        total["loss_dice"] += (dice / n).sum().item()
        # iou
        pm = s.flatten(2) > 0
        gm = g.flatten(2) > 0
        ai = (pm & gm).sum(-1).float() / (pm | gm).sum(-1).float().clamp(min=1)
        err = (i - ai).abs() if use_l1 else (i - ai) ** 2
        total["loss_iou"] += (err / n).sum().item()
    total[CORE_LOSS_KEY] = sum(
        w * total[k] for k, w in weight_dict.items() if k in total)
    return total


def _random_case(rng, T=3, C=4, M=1, H=16, W=16, empty_cats=(2,)):
    src = rng.standard_normal((T, C, M, H, W)).astype(np.float32) * 3
    tgt = rng.random((T, C, H, W)) > 0.6
    for c in empty_cats:
        tgt[:, c] = False
    ious = rng.random((T, C, M)).astype(np.float32)
    return src, tgt, ious


def test_multistep_matches_reference_math(rng):
    src, tgt, ious = _random_case(rng)
    cfg = LossConfig()
    per_cat = {
        "high_res_multimasks": jnp.asarray(src),
        "ious": jnp.asarray(ious),
        "object_score_logits": jnp.asarray(src[:, :, :1, 0, 0]),
    }
    got = multi_step_loss(cfg, per_cat, jnp.asarray(tgt))
    want = torch_reference_multistep(src, tgt, ious, cfg.weight_dict)
    for k in ("loss_mask", "loss_dice", "loss_iou", CORE_LOSS_KEY):
        np.testing.assert_allclose(float(got[k]), want[k], rtol=2e-4,
                                   err_msg=k)
    assert float(got["frames_without_valid"]) == 0


def test_multistep_with_temperature(rng):
    src, tgt, ious = _random_case(rng)
    cfg = LossConfig(multistep_logit_temperature=2.0)
    per_cat = {"high_res_multimasks": jnp.asarray(src),
               "ious": jnp.asarray(ious),
               "object_score_logits": jnp.asarray(src[:, :, :1, 0, 0])}
    got = multi_step_loss(cfg, per_cat, jnp.asarray(tgt))
    want = torch_reference_multistep(src, tgt, ious, cfg.weight_dict,
                                     temperature=2.0)
    np.testing.assert_allclose(float(got[CORE_LOSS_KEY]),
                               want[CORE_LOSS_KEY], rtol=2e-4)


def test_bce_matches_torch(rng):
    T, C, H, W = 3, 4, 16, 16
    src = (rng.standard_normal((T, C, 1, H, W)) * 3).astype(np.float32)
    tgt = rng.random((T, C, H, W)) > 0.5
    tgt[:, 1] = False
    cfg = LossConfig(type="bce")
    got = bce_category_loss(
        cfg, {"high_res_masks": jnp.asarray(src)}, jnp.asarray(tgt))
    total = 0.0
    for t in range(T):
        s = torch.from_numpy(src[t, :, 0])
        g = torch.from_numpy(tgt[t]).float()
        valid = g.sum(dim=(1, 2)).bool()
        total += F.binary_cross_entropy_with_logits(
            s[valid], g[valid], reduction="mean").item()
    np.testing.assert_allclose(float(got[CORE_LOSS_KEY]), total / T, rtol=1e-4)


def test_bce_pos_weight(rng):
    T, C, H, W = 2, 3, 8, 8
    src = (rng.standard_normal((T, C, 1, H, W)) * 2).astype(np.float32)
    tgt = rng.random((T, C, H, W)) > 0.4
    pw = [1.0, 2.0, 0.5]
    cfg = LossConfig(type="bce", bce_pos_weight=pw)
    got = bce_category_loss(
        cfg, {"high_res_masks": jnp.asarray(src)}, jnp.asarray(tgt))
    total = 0.0
    for t in range(T):
        s = torch.from_numpy(src[t, :, 0])
        g = torch.from_numpy(tgt[t]).float()
        valid = g.sum(dim=(1, 2)).bool()
        w = torch.tensor(pw).view(-1, 1, 1)[valid]
        total += F.binary_cross_entropy_with_logits(
            s[valid], g[valid], pos_weight=w, reduction="mean").item()
    np.testing.assert_allclose(float(got[CORE_LOSS_KEY]), total / T, rtol=1e-4)


def test_gt_stride(rng):
    src, tgt, ious = _random_case(rng, T=4)
    per_cat = {"high_res_multimasks": jnp.asarray(src),
               "ious": jnp.asarray(ious),
               "object_score_logits": jnp.asarray(src[:, :, :1, 0, 0]),
               "high_res_masks": jnp.asarray(src)}
    got = compute_loss(LossConfig(gt_stride=2), per_cat, jnp.asarray(tgt))
    want = torch_reference_multistep(src[::2], tgt[::2], ious[::2],
                                     LossConfig().weight_dict)
    np.testing.assert_allclose(float(got[CORE_LOSS_KEY]),
                               want[CORE_LOSS_KEY], rtol=2e-4)


def test_empty_frame_contributes_zero(rng):
    src, tgt, ious = _random_case(rng, T=2)
    tgt[1] = False  # frame 1 fully empty
    cfg = LossConfig()
    per_cat = {"high_res_multimasks": jnp.asarray(src),
               "ious": jnp.asarray(ious),
               "object_score_logits": jnp.asarray(src[:, :, :1, 0, 0])}
    got = multi_step_loss(cfg, per_cat, jnp.asarray(tgt))
    want = torch_reference_multistep(src[:1], tgt[:1], ious[:1],
                                     cfg.weight_dict)
    np.testing.assert_allclose(float(got[CORE_LOSS_KEY]),
                               want[CORE_LOSS_KEY], rtol=2e-4)
    assert float(got["frames_without_valid"]) == 1


def test_multistep_pred_obj_scores_branch(rng):
    """loss_class focal on object-score logits vs torch rederivation
    (losses.py:194-204: target=1 for all valid rows, alpha=-1, gamma=0
    reduces to plain BCE mean over the singleton dim, / num_objects)."""
    src, tgt, ious = _random_case(rng, T=2)
    osl = (rng.standard_normal((2, 4, 1)) * 2).astype(np.float32)
    wd = dict(LossConfig().weight_dict)
    wd["loss_class"] = 2.0
    cfg = LossConfig(weight_dict=wd, pred_obj_scores=True,
                     focal_alpha_obj_score=-1.0, focal_gamma_obj_score=0.0)
    per_cat = {"high_res_multimasks": jnp.asarray(src),
               "ious": jnp.asarray(ious),
               "object_score_logits": jnp.asarray(osl)}
    got = multi_step_loss(cfg, per_cat, jnp.asarray(tgt))

    want_cls = 0.0
    for t in range(2):
        g = torch.from_numpy(tgt[t]).float()
        valid = g.sum(dim=(1, 2)).bool()
        s = torch.from_numpy(osl[t])[valid]
        n = float(valid.sum())
        target = torch.ones_like(s)
        ce = F.binary_cross_entropy_with_logits(s, target, reduction="none")
        want_cls += (ce.mean(1).sum() / n).item()
    np.testing.assert_allclose(float(got["loss_class"]), want_cls, rtol=2e-4)
    base = torch_reference_multistep(src, tgt, ious, wd)
    np.testing.assert_allclose(
        float(got[CORE_LOSS_KEY]), base[CORE_LOSS_KEY] + 2.0 * want_cls,
        rtol=2e-4)
