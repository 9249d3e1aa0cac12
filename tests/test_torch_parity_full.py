"""FULL-MODEL torch-mirror golden test (the strongest executable proxy for
the 0.5-pt Dice parity gate while no real checkpoint exists in this env).

Composes the per-module torch mirrors (test_torch_parity*.py) into a COMPLETE
independent torch re-implementation of the reference's simplified training
forward — /root/reference/sam2_video/model/sam2model.py:154-498 (forward /
prepare_prompt_inputs / forward_tracking / track_step) and
sam2_base.py:262-769 (_forward_sam_heads / _use_mask_as_output /
_prepare_memory_conditioned_features / _encode_new_memory) — using the
reference's own structures: a dict-based variable-length memory bank,
reference tpos-enc indexing (cond slot -> num_maskmem-1, k-frames-back ->
k-1), pointer list ordering [cond(pos=frame_idx), t_diff=1, 2, ...],
ptr-major pointer-token splitting, per-entry ``.detach()`` boundaries, the
category merge (utils/masks.py:53-213) and the multi-step loss — then demands
end-to-end agreement with ``forward_train`` on a multi-frame multi-object
clip: per-frame values, merged per-category values, the scalar loss AND
gradients (detach boundaries are only observable in grads).

Cross-checked semantics that per-module tests cannot see:
- fixed-shape ring buffers + validity-bias masking  ==  variable-length
  dict memory (frames 1..T-1 see 1..T-2 valid slots out of num_maskmem-1)
- slot-index == temporal-position identity of the ring layout
- pointer ordering/validity and the signed tpos normalization (t_diff_max)
- stop_gradient on carry updates == reference per-entry detach
  (verified via grads: memory_encoder/obj_ptr_proj get EXACTLY zero grad in
  the simplified trainer because their outputs are only consumed through the
  detached bank; memory_attention/mask_decoder grads must match torch)

Division of labor (measured during development): the SAM heads strongly damp
memory-side perturbations — a tpos-row swap moves the final mask logits by
only ~4e-4 at realistic parameter scales, far below any honest end-to-end
f32 tolerance, and amplifying the tpos table saturates the softmax and blows
up parity noise faster than the signal. So the end-to-end tests here verify
integration (values, merge, loss, grads/detach boundaries), while
``test_fuse_memory_reference_wiring`` pins the layout-sensitive semantics
(tpos indexing, pointer ordering, validity masking) at the memory-attention
output where a wiring mutation is 100x the parity noise — with in-test
mutation asserts proving the sensitivity.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from sam2_video_tpu.data.types import VideoClip
from sam2_video_tpu.models import sam2 as sam2_mod
from sam2_video_tpu.models.sam2 import SAM2Config
from sam2_video_tpu.models.video_model import VideoModelConfig, forward_train
from sam2_video_tpu.training.losses import (CORE_LOSS_KEY, LossConfig,
                                            compute_loss)
from tests.test_torch_parity import t, torch_attn, torch_linear, torch_ln
from tests.test_torch_parity_heads import torch_conv, torch_ln2d_nchw
from tests.test_torch_parity_hiera import torch_block

NO_OBJ = -1024.0


# ---------------------------------------------------------------------------
# torch param tree + shared primitives
# ---------------------------------------------------------------------------


def to_torch_tree(params, grad_roots=()):
    """Convert the jax param tree to torch tensors ONCE so autograd tracks a
    single leaf per parameter; subtrees named in ``grad_roots`` (top-level
    keys) get requires_grad."""

    def walk(node, root):
        if isinstance(node, dict):
            return {k: walk(v, root) for k, v in node.items()}
        v = torch.tensor(np.asarray(node, np.float32))
        if root in grad_roots:
            v.requires_grad_(True)
        return v

    return {k: walk(v, k) for k, v in params.items()}


def torch_mlp(p, x, sigmoid_output=False):
    layers = p["layers"]
    n = len(layers)
    for i in range(n):
        x = torch_linear(layers[str(i)], x)
        if i < n - 1:
            x = F.relu(x)
    return torch.sigmoid(x) if sigmoid_output else x


def sine_pe_2d_torch(h, w, C, temperature=10000.0):
    """PositionEmbeddingSine mirror (position_encoding.py:16-130)."""
    npf = C // 2
    scale = 2 * math.pi
    y = torch.arange(1, h + 1).float()[:, None].expand(h, w)
    x = torch.arange(1, w + 1).float()[None, :].expand(h, w)
    y = y / (y[-1:, :] + 1e-6) * scale
    x = x / (x[:, -1:] + 1e-6) * scale
    dim_t = temperature ** (2 * torch.div(torch.arange(npf), 2,
                                          rounding_mode="floor") / npf)
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    px = torch.stack([px[:, :, 0::2].sin(), px[:, :, 1::2].cos()],
                     dim=3).flatten(2)
    py = torch.stack([py[:, :, 0::2].sin(), py[:, :, 1::2].cos()],
                     dim=3).flatten(2)
    return torch.cat([py, px], dim=2)  # [h, w, C]


def sine_pe_1d_torch(pos, dim, temperature=10000.0):
    """get_1d_sine_pe mirror (sam2_utils.py:64-75)."""
    pe_dim = dim // 2
    dim_t = temperature ** (2 * torch.div(torch.arange(pe_dim), 2,
                                          rounding_mode="floor") / pe_dim)
    pe = pos.float()[:, None] / dim_t
    return torch.cat([pe.sin(), pe.cos()], dim=-1)


def rope_torch(x, ex, ey, theta=10000.0, repeat=1):
    """Axial RoPE via complex rotation (sam/transformer.py RoPEAttention)."""
    d = x.shape[-1]
    freqs = 1.0 / (theta ** (torch.arange(0, d, 4)[: d // 4].float() / d))
    idx = torch.arange(ex * ey, dtype=torch.float32)
    tx, ty = idx % ex, torch.div(idx, ex, rounding_mode="floor").float()
    cis = torch.cat([torch.polar(torch.ones(ex * ey, d // 4),
                                 torch.outer(tx, freqs)),
                     torch.polar(torch.ones(ex * ey, d // 4),
                                 torch.outer(ty, freqs))], dim=-1)
    if repeat > 1:
        cis = cis.repeat(repeat, 1)
    xc = torch.view_as_complex(x.float().reshape(*x.shape[:-1], -1, 2))
    return torch.view_as_real(xc * cis).flatten(-2)


# ---------------------------------------------------------------------------
# image encoder mirror (Hiera + FPN + conv_s0/s1 projection)
# ---------------------------------------------------------------------------


def torch_image_encoder(tp, images_np, cfg: SAM2Config):
    """[T, H, W, 3] -> (s0_proj, s1_proj, s16) NCHW torch tensors."""
    hcfg = cfg.trunk_config
    trunk = tp["image_encoder"]["trunk"]
    xt = t(images_np.transpose(0, 3, 1, 2))
    w = trunk["patch_embed"]["proj"]["weight"].permute(3, 2, 0, 1)
    y = F.conv2d(xt, w, trunk["patch_embed"]["proj"]["bias"], stride=4,
                 padding=3).permute(0, 2, 3, 1)
    h = y.shape[1]
    bkg = F.interpolate(trunk["pos_embed"].permute(0, 3, 1, 2), size=(h, h),
                        mode="bicubic", align_corners=False)
    win = trunk["pos_embed_window"].permute(0, 3, 1, 2)
    tiles = [a // b for a, b in zip(bkg.shape, win.shape)]
    y = y + (bkg + win.tile(tiles)).permute(0, 2, 3, 1)
    outs = []
    for i, spec in enumerate(hcfg.block_specs()):
        y = torch_block(trunk["blocks"][str(i)], y, spec, hcfg.q_stride)
        if i in hcfg.stage_ends:
            outs.append(y)
    convs = tp["image_encoder"]["neck"]["convs"]
    n = len(outs) - 1
    fpn = [None] * len(outs)
    prev = None
    for i in range(n, -1, -1):
        lateral = torch_conv(convs[str(n - i)]["conv"],
                             outs[i].permute(0, 3, 1, 2))
        if i in (2, 3) and prev is not None:
            prev = lateral + F.interpolate(prev, scale_factor=2.0,
                                           mode="nearest")
        else:
            prev = lateral
        fpn[i] = prev
    s0 = torch_conv(tp["sam_mask_decoder"]["conv_s0"], fpn[0])
    s1 = torch_conv(tp["sam_mask_decoder"]["conv_s1"], fpn[1])
    return s0, s1, fpn[2]


# ---------------------------------------------------------------------------
# prompt encoder mirror
# ---------------------------------------------------------------------------


def torch_embed_points(tpe, cfg: SAM2Config, coords, labels):
    """points + pad point -> sparse embeddings (prompt_encoder.py:79-121)."""
    B = coords.shape[0]
    c = torch.cat([coords.float() + 0.5, torch.zeros(B, 1, 2)], dim=1)
    l = torch.cat([labels.float(), -torch.ones(B, 1)], dim=1)
    g = tpe["pe_layer"]["positional_encoding_gaussian_matrix"]
    cn = c / float(cfg.image_size)
    enc = (2 * cn - 1) @ g * (2 * math.pi)
    point_pe = torch.cat([enc.sin(), enc.cos()], dim=-1)
    out = torch.where((l == -1)[..., None],
                      torch.zeros_like(point_pe)
                      + tpe["not_a_point_embed"]["weight"], point_pe)
    for i in range(4):
        out = torch.where((l == i)[..., None],
                          point_pe + tpe["point_embeddings"][str(i)]["weight"],
                          out)
    return out


def torch_dense_pe(tpe, h, w):
    """PositionEmbeddingRandom grid PE -> [h, w, C]."""
    ys = (torch.arange(h).float() + 0.5) / h
    xs = (torch.arange(w).float() + 0.5) / w
    gy, gx = torch.meshgrid(ys, xs, indexing="ij")
    coords = torch.stack([gx, gy], dim=-1)  # (x, y)
    g = tpe["pe_layer"]["positional_encoding_gaussian_matrix"]
    enc = (2 * coords - 1) @ g * (2 * math.pi)
    return torch.cat([enc.sin(), enc.cos()], dim=-1)


def torch_mask_downscale(tpe, m_nchw):
    md = tpe["mask_downscaling"]
    x = torch_conv(md["0"], m_nchw, stride=2)
    x = F.gelu(torch_ln2d_nchw(md["1"], x))
    x = torch_conv(md["3"], x, stride=2)
    x = F.gelu(torch_ln2d_nchw(md["4"], x))
    return torch_conv(md["6"], x)


# ---------------------------------------------------------------------------
# SAM heads mirror
# ---------------------------------------------------------------------------


def torch_predict_masks(tmd, cfg: SAM2Config, src_nchw, image_pe_hwc, sparse,
                        dense_nchw, hr0, hr1):
    mcfg = cfg.mask_decoder_config
    B = sparse.shape[0]
    C = src_nchw.shape[1]
    toks = torch.cat([tmd["obj_score_token"]["weight"],
                      tmd["iou_token"]["weight"],
                      tmd["mask_tokens"]["weight"]], dim=0)
    tokens = torch.cat([toks[None].expand(B, -1, -1), sparse], dim=1)
    src = (src_nchw + dense_nchw).flatten(2).permute(0, 2, 1)  # [B, HW, C]
    pos = image_pe_hwc.reshape(1, -1, C).expand(B, -1, -1)

    queries, keys = tokens, src
    heads = mcfg.transformer_num_heads
    tr = tmd["transformer"]
    for i in range(mcfg.transformer_depth):
        lp = tr["layers"][str(i)]
        if i == 0:
            queries = torch_attn(lp["self_attn"], queries, queries, queries,
                                 heads)
        else:
            q = queries + tokens
            queries = queries + torch_attn(lp["self_attn"], q, q, queries,
                                           heads)
        queries = torch_ln(lp["norm1"], queries)
        q = queries + tokens
        k = keys + pos
        queries = queries + torch_attn(lp["cross_attn_token_to_image"], q, k,
                                       keys, heads)
        queries = torch_ln(lp["norm2"], queries)
        hmid = F.relu(torch_linear(lp["mlp"]["layers"]["0"], queries))
        queries = queries + torch_linear(lp["mlp"]["layers"]["1"], hmid)
        queries = torch_ln(lp["norm3"], queries)
        q = queries + tokens
        k = keys + pos
        keys = keys + torch_attn(lp["cross_attn_image_to_token"], k, q,
                                 queries, heads)
        keys = torch_ln(lp["norm4"], keys)
    q = queries + tokens
    k = keys + pos
    queries = queries + torch_attn(tr["final_attn_token_to_image"], q, k,
                                   keys, heads)
    hs = torch_ln(tr["norm_final_attn"], queries)

    iou_token_out = hs[:, 1]
    mask_tokens_out = hs[:, 2: 2 + mcfg.num_mask_tokens]

    Hf = src_nchw.shape[2]
    src2 = keys.permute(0, 2, 1).reshape(B, C, Hf, Hf)
    up = tmd["output_upscaling"]
    w1 = up["0"]["weight"].permute(2, 3, 0, 1)
    dc1 = F.conv_transpose2d(src2, w1, up["0"]["bias"], stride=2)
    x = F.gelu(torch_ln2d_nchw(up["1"], dc1 + hr1))
    w2 = up["3"]["weight"].permute(2, 3, 0, 1)
    upscaled = F.gelu(F.conv_transpose2d(x, w2, up["3"]["bias"], stride=2)
                      + hr0)

    hyper = torch.stack(
        [torch_mlp(tmd["output_hypernetworks_mlps"][str(i)],
                   mask_tokens_out[:, i])
         for i in range(mcfg.num_mask_tokens)], dim=1)
    b, c8, h4, w4 = upscaled.shape
    masks = (hyper @ upscaled.reshape(b, c8, h4 * w4)).reshape(b, -1, h4, w4)

    iou_pred = torch_mlp(tmd["iou_prediction_head"], iou_token_out,
                         sigmoid_output=True)
    obj_score = torch_mlp(tmd["pred_obj_score_head"], hs[:, 0])
    return masks, iou_pred, mask_tokens_out, obj_score


def torch_sam_heads(tp, cfg: SAM2Config, feats_nchw, hr0, hr1,
                    point_coords=None, point_labels=None,
                    mask_inputs_nchw=None):
    """_forward_sam_heads mirror (sam2_base.py:262-434), single-mask path."""
    B = feats_nchw.shape[0]
    Fs = cfg.feat_size
    tpe = tp["sam_prompt_encoder"]

    if point_coords is None:
        point_coords = torch.zeros(B, 1, 2)
        point_labels = -torch.ones(B, 1)
    sparse = torch_embed_points(tpe, cfg, point_coords, point_labels)

    if mask_inputs_nchw is not None:
        tgt = 4 * Fs
        if mask_inputs_nchw.shape[-1] != tgt:
            m = F.interpolate(mask_inputs_nchw.float(), size=(tgt, tgt),
                              mode="bilinear", align_corners=False,
                              antialias=True)
        else:
            m = mask_inputs_nchw.float()
        dense = torch_mask_downscale(tpe, m)
    else:
        dense = tpe["no_mask_embed"]["weight"].reshape(1, -1, 1, 1).expand(
            B, cfg.d_model, Fs, Fs)

    image_pe = torch_dense_pe(tpe, Fs, Fs)
    masks, ious, mask_tokens, obj_score = torch_predict_masks(
        tp["sam_mask_decoder"], cfg, feats_nchw, image_pe, sparse, dense,
        hr0, hr1)
    # multimask_output=False -> single-mask slice (mask_decoder.py:110-166)
    low_res_multimasks = masks[:, 0:1]
    ious = ious[:, 0:1]
    sam_output_token = mask_tokens[:, 0]

    is_obj = obj_score > 0
    low_res_multimasks = torch.where(is_obj[..., None, None],
                                     low_res_multimasks,
                                     torch.tensor(NO_OBJ))
    high_res_multimasks = F.interpolate(
        low_res_multimasks, size=(cfg.image_size, cfg.image_size),
        mode="bilinear", align_corners=False)

    obj_ptr = torch_mlp(tp["obj_ptr_proj"], sam_output_token)
    lam = is_obj.float()
    obj_ptr = lam * obj_ptr  # fixed_no_obj_ptr
    obj_ptr = obj_ptr + (1.0 - lam) * tp["no_obj_ptr"]
    return {
        "high_res_multimasks": high_res_multimasks,
        "ious": ious,
        "object_score_logits": obj_score,
        "high_res_masks": high_res_multimasks[:, 0:1],
        "obj_ptr": obj_ptr,
    }


def torch_use_mask_as_output(tp, cfg: SAM2Config, feats_nchw, hr0, hr1,
                             mask_inputs_nchw):
    """_use_mask_as_output mirror (sam2_base.py:436-486)."""
    out_scale, out_bias = 20.0, -10.0
    mask_f = mask_inputs_nchw.float()
    high_res_masks = mask_f * out_scale + out_bias
    B = mask_f.shape[0]
    ious = torch.ones(B, 1)
    ds = torch_conv(tp["mask_downsample"], mask_f, stride=4)
    head = torch_sam_heads(tp, cfg, feats_nchw, hr0, hr1,
                           mask_inputs_nchw=ds)
    obj_ptr = head["obj_ptr"]
    is_obj = (mask_f.flatten(1).amax(dim=1) > 0).float()[:, None]
    obj_score = out_scale * is_obj + out_bias
    obj_ptr = is_obj * obj_ptr + (1.0 - is_obj) * tp["no_obj_ptr"]
    return {
        "high_res_multimasks": high_res_masks,
        "ious": ious,
        "object_score_logits": obj_score,
        "high_res_masks": high_res_masks,
        "obj_ptr": obj_ptr,
    }


# ---------------------------------------------------------------------------
# memory encoder + memory attention mirrors
# ---------------------------------------------------------------------------


def torch_encode_memory(tp, cfg: SAM2Config, pix_feat_nchw, high_res_masks,
                        obj_score):
    """_encode_new_memory mirror (sam2_base.py:715-769). Returns [O,64,F,F]."""
    tme = tp["memory_encoder"]
    x = torch.sigmoid(high_res_masks) * cfg.sigmoid_scale_for_mem_enc \
        + cfg.sigmoid_bias_for_mem_enc
    enc = tme["mask_downsampler"]["encoder"]
    i = 0
    for _ in range(4):
        x = torch_conv(enc[str(i)], x, stride=2, padding=1)
        x = F.gelu(torch_ln2d_nchw(enc[str(i + 1)], x))
        i += 3
    x = torch_conv(enc[str(i)], x)
    y = torch_conv(tme["pix_feat_proj"], pix_feat_nchw) + x
    for li in range(len(tme["fuser"]["layers"])):
        lp = tme["fuser"]["layers"][str(li)]
        inp = y
        y = torch_conv(lp["dwconv"], y, padding=3, groups=y.shape[1])
        y = torch_ln2d_nchw(lp["norm"], y).permute(0, 2, 3, 1)
        y = torch_linear(lp["pwconv2"], F.gelu(torch_linear(lp["pwconv1"], y)))
        y = inp + (lp["gamma"] * y).permute(0, 3, 1, 2)
    y = torch_conv(tme["out_proj"], y)
    is_obj = (obj_score > 0).float()
    y = y + (1.0 - is_obj[..., None, None]) * \
        tp["no_obj_embed_spatial"].reshape(1, -1, 1, 1)
    return y


def torch_memory_attention(tma, curr, memory, curr_pos, mem_pos, feat_hw,
                           num_spatial):
    """MemoryAttention mirror (memory_attention.py:102-169): 4 layers of
    RoPE self-attn + RoPE cross-attn (pointer keys unrotated) + FFN."""
    H, W = feat_hw
    reps = num_spatial // (H * W)
    output = curr + 0.1 * curr_pos
    for i in range(len(tma["layers"])):
        lp = tma["layers"][str(i)]
        tgt2 = torch_ln(lp["norm1"], output)
        ap = lp["self_attn"]
        q = rope_torch(torch_linear(ap["q_proj"], tgt2), W, H)
        k = rope_torch(torch_linear(ap["k_proj"], tgt2), W, H)
        v = torch_linear(ap["v_proj"], tgt2)
        a = F.scaled_dot_product_attention(q[:, None], k[:, None],
                                           v[:, None])[:, 0]
        output = output + torch_linear(ap["out_proj"], a)

        tgt2 = torch_ln(lp["norm2"], output)
        ap = lp["cross_attn_image"]
        q = rope_torch(torch_linear(ap["q_proj"], tgt2), W, H)
        k = torch_linear(ap["k_proj"], memory + mem_pos)
        k_sp = rope_torch(k[:, :num_spatial], W, H, repeat=reps)
        k = torch.cat([k_sp, k[:, num_spatial:]], dim=1)
        v = torch_linear(ap["v_proj"], memory)
        a = F.scaled_dot_product_attention(q[:, None], k[:, None],
                                           v[:, None])[:, 0]
        output = output + torch_linear(ap["out_proj"], a)

        tgt2 = torch_ln(lp["norm3"], output)
        output = output + torch_linear(
            lp["linear2"], F.relu(torch_linear(lp["linear1"], tgt2)))
    return torch_ln(tma["norm"], output)


# ---------------------------------------------------------------------------
# the reference tracking loop (dict memory bank, variable-length lists)
# ---------------------------------------------------------------------------


def torch_forward_tracking(tp, cfg: SAM2Config, images_np, obj_masks_np,
                           point_coords=None, point_labels=None,
                           prompt_type="point"):
    T = images_np.shape[0]
    O = obj_masks_np.shape[0]
    Fs = cfg.feat_size
    HW = Fs * Fs
    C = cfg.d_model
    s0, s1, s16 = torch_image_encoder(tp, images_np, cfg)
    curr_pos = sine_pe_2d_torch(Fs, Fs, C).reshape(1, HW, C)
    mem_pos_grid = sine_pe_2d_torch(Fs, Fs, cfg.mem_dim).reshape(1, HW,
                                                                 cfg.mem_dim)
    obj_masks = t(obj_masks_np)[:, None]  # [O, 1, H, W]

    cond = None
    noncond = {}
    frames = []
    max_ptrs = min(T, cfg.max_obj_ptrs_in_encoder)
    tpp = C // cfg.mem_dim

    for fi in range(T):
        feats = s16[fi: fi + 1].expand(O, -1, -1, -1)
        hr0 = s0[fi: fi + 1].expand(O, -1, -1, -1)
        hr1 = s1[fi: fi + 1].expand(O, -1, -1, -1)

        if fi == 0:
            if prompt_type == "mask":
                out = torch_use_mask_as_output(tp, cfg, feats, hr0, hr1,
                                               obj_masks)
            else:
                pix = feats + tp["no_mem_embed"].reshape(1, -1, 1, 1)
                out = torch_sam_heads(tp, cfg, pix, hr0, hr1,
                                      point_coords=point_coords,
                                      point_labels=point_labels)
        else:
            # spatial memories: [(t_pos 0, cond)] + earliest..latest noncond
            to_mem, to_pos = [cond["mem"]], [
                mem_pos_grid + tp["maskmem_tpos_enc"][
                    cfg.num_maskmem - 1].reshape(1, 1, -1)]
            for t_pos in range(1, cfg.num_maskmem):
                t_rel = cfg.num_maskmem - t_pos
                prev_idx = fi - 1 if t_rel == 1 else (fi - 2) - (t_rel - 2)
                e = noncond.get(prev_idx)
                if e is None:
                    continue
                to_mem.append(e["mem"])
                to_pos.append(mem_pos_grid + tp["maskmem_tpos_enc"][
                    cfg.num_maskmem - t_pos - 1].reshape(1, 1, -1))
            num_spatial = len(to_mem) * HW
            memory = torch.cat(to_mem, dim=1)       # [O, S*HW, 64]
            mem_pos = torch.cat(to_pos, dim=1)      # [1, S*HW, 64]

            # pointers: cond first (pos = frame_idx), then t_diff = 1, 2, ...
            pos_and_ptrs = [(float(fi), cond["ptr"])]
            for t_diff in range(1, max_ptrs):
                tt = fi - t_diff
                if tt < 0:
                    break
                e = noncond.get(tt)
                if e is not None:
                    pos_and_ptrs.append((float(t_diff), e["ptr"]))
            P = len(pos_and_ptrs)
            ptrs = torch.stack([x for _, x in pos_and_ptrs], dim=0)
            pos_list = torch.tensor([x for x, _ in pos_and_ptrs])
            obj_pos = sine_pe_1d_torch(pos_list / (max_ptrs - 1), C)
            obj_pos = torch_linear(tp["obj_ptr_tpos_proj"], obj_pos)
            ptr_tok = ptrs.reshape(P, O, tpp, cfg.mem_dim).permute(
                1, 0, 2, 3).reshape(O, P * tpp, cfg.mem_dim)
            ptr_pos = obj_pos.repeat_interleave(tpp, dim=0)[None]
            memory = torch.cat([memory, ptr_tok], dim=1)
            mem_pos = torch.cat([mem_pos.expand(O, -1, -1),
                                 ptr_pos.expand(O, -1, -1)], dim=1)

            curr = feats.flatten(2).permute(0, 2, 1)
            fused = torch_memory_attention(tp["memory_attention"], curr,
                                           memory, curr_pos, mem_pos,
                                           (Fs, Fs), num_spatial)
            fused = fused.permute(0, 2, 1).reshape(O, C, Fs, Fs)
            out = torch_sam_heads(tp, cfg, fused, hr0, hr1)

        # memory from RAW (pre-memory-attn) features; per-entry detach
        mem = torch_encode_memory(tp, cfg, feats, out["high_res_masks"],
                                  out["object_score_logits"])
        entry = {"mem": mem.flatten(2).permute(0, 2, 1).detach(),
                 "ptr": out["obj_ptr"].detach()}
        if fi == 0:
            cond = entry
        else:
            noncond[fi] = entry
            while len(noncond) > cfg.num_maskmem - 1:
                del noncond[min(noncond.keys())]
        frames.append(out)
    return frames


def torch_merge(frames, obj_to_cat, num_categories):
    """merge_object_results_to_category mirror (utils/masks.py:53-213)."""
    groups = [[] for _ in range(num_categories)]
    for oi, ci in enumerate(obj_to_cat):
        groups[int(ci)].append(oi)
    merged = []
    for out in frames:
        w = torch.sigmoid(out["high_res_masks"]).sum(dim=(1, 2, 3))
        m = {}
        for k in ("high_res_masks", "high_res_multimasks"):
            m[k] = torch.stack([out[k][g].amax(dim=0) for g in groups], dim=0)
        for k in ("ious", "object_score_logits"):
            v, rows = out[k], []
            for g in groups:
                sub, sw = v[g], w[g].view(-1, 1)
                denom = sw.sum(dim=0)
                rows.append((sub * sw).sum(dim=0) / denom
                            if torch.all(denom != 0) else sub.mean(dim=0))
            m[k] = torch.stack(rows, dim=0)
        merged.append(m)
    return merged


def torch_multistep_loss(merged, tgt_np, weights=(20.0, 1.0, 1.0),
                         alpha=0.25, gamma=2.0):
    """Differentiable MultiStepMultiMasksAndIous mirror (losses.py:79-248)."""
    total_mask = total_dice = total_iou = 0.0
    for fr, m in enumerate(merged):
        s = m["high_res_multimasks"]                 # [C, M, H, W]
        g = t(tgt_np[fr].astype(np.float32))[:, None].expand_as(s)
        i = m["ious"]
        valid = g.sum(dim=(2, 3)) > 0                # [C, M]
        s_v = s[valid].unsqueeze(1)
        g_v = g[valid].unsqueeze(1)
        i_v = i[valid].unsqueeze(1)
        n = float(s_v.shape[0])
        ce = F.binary_cross_entropy_with_logits(s_v, g_v, reduction="none")
        p = s_v.sigmoid()
        pt = p * g_v + (1 - p) * (1 - g_v)
        fl = (alpha * g_v + (1 - alpha) * (1 - g_v)) * ce * (1 - pt) ** gamma
        total_mask = total_mask + (fl.flatten(2).mean(-1) / n).sum()
        pf, gf = p.flatten(2), g_v.flatten(2)
        dice = 1 - (2 * (pf * gf).sum(-1) + 1) / (pf.sum(-1) + gf.sum(-1) + 1)
        total_dice = total_dice + (dice / n).sum()
        pm, gm = s_v.flatten(2) > 0, g_v.flatten(2) > 0
        ai = (pm & gm).sum(-1).float() / (pm | gm).sum(-1).float().clamp(min=1)
        total_iou = total_iou + ((i_v - ai).abs() / n).sum()
    return weights[0] * total_mask + weights[1] * total_dice \
        + weights[2] * total_iou


# ---------------------------------------------------------------------------
# fixtures: config, clip, params (wiring-sensitive params amplified)
# ---------------------------------------------------------------------------

T_FRAMES, N_OBJ, N_CAT, IMG = 4, 2, 2, 128


def _cfg(**kw):
    return SAM2Config(backbone="tiny", image_size=IMG,
                      compute_dtype="float32",
                      use_activation_checkpoint=False, remat_mode="none",
                      **kw)


@pytest.fixture(scope="module")
def clip_np():
    rng = np.random.default_rng(7)
    H = IMG
    images = rng.standard_normal((T_FRAMES, H, H, 3)).astype(np.float32)
    cat_masks = np.zeros((T_FRAMES, N_CAT, H, H), bool)
    cat_masks[:, 0, 16:56, 16:56] = True
    cat_masks[:, 1, 64:112, 72:120] = True
    obj_masks = cat_masks[0].astype(np.float32)           # [O, H, W]
    obj_to_cat = np.asarray([0, 1], np.int32)
    coords = np.asarray([[[36.0, 36.0]], [[96.0, 88.0]]], np.float32)
    labels = np.ones((N_OBJ, 1), np.int32)
    return dict(images=images, cat_masks=cat_masks, obj_masks=obj_masks,
                obj_to_cat=obj_to_cat, coords=coords, labels=labels)


@pytest.fixture(scope="module")
def params():
    p = sam2_mod.init(jax.random.PRNGKey(3), _cfg())
    # amplify wiring-sensitive params so layout mismatches dominate fp noise
    for k in ("maskmem_tpos_enc", "no_mem_embed", "no_obj_ptr",
              "no_obj_embed_spatial"):
        p[k] = p[k] * 25.0
    p["obj_ptr_tpos_proj"]["weight"] = p["obj_ptr_tpos_proj"]["weight"] * 5.0
    return jax.tree.map(lambda x: np.asarray(x), p)


def _jax_clip(clip_np):
    return VideoClip(images=jnp.asarray(clip_np["images"]),
                     cat_masks=jnp.asarray(clip_np["cat_masks"]),
                     obj_masks=jnp.asarray(clip_np["obj_masks"]),
                     obj_to_cat=jnp.asarray(clip_np["obj_to_cat"]),
                     point_coords=jnp.asarray(clip_np["coords"]),
                     point_labels=jnp.asarray(clip_np["labels"]))


def _run_jax(params, clip, prompt_type, training=True, **cfg_kw):
    mcfg = VideoModelConfig(sam2=_cfg(**cfg_kw), prompt_type=prompt_type)
    lcfg = LossConfig()

    def fwd(p, c):
        per_obj, per_cat = forward_train(p, mcfg, c, training=training)
        loss = compute_loss(lcfg, per_cat, c.cat_masks)
        return loss[CORE_LOSS_KEY], (per_obj, per_cat)

    (loss, (per_obj, per_cat)), grads = jax.jit(
        jax.value_and_grad(fwd, has_aux=True))(params, clip)
    return (jax.device_get(loss), jax.device_get(per_obj),
            jax.device_get(per_cat), jax.device_get(grads))


def _assert_frames_close(per_obj, per_cat, frames_t, merged_t, atol):
    for fr in range(T_FRAMES):
        for key in ("high_res_multimasks", "high_res_masks"):
            np.testing.assert_allclose(
                per_obj[key][fr], frames_t[fr][key].detach().numpy(),
                atol=atol, err_msg=f"frame {fr} per-obj {key}")
            np.testing.assert_allclose(
                per_cat[key][fr], merged_t[fr][key].detach().numpy(),
                atol=atol, err_msg=f"frame {fr} per-cat {key}")
        for key in ("ious", "object_score_logits"):
            np.testing.assert_allclose(
                per_obj[key][fr], frames_t[fr][key].detach().numpy(),
                atol=atol / 4, err_msg=f"frame {fr} per-obj {key}")
            np.testing.assert_allclose(
                per_cat[key][fr], merged_t[fr][key].detach().numpy(),
                atol=atol / 4, err_msg=f"frame {fr} per-cat {key}")


def test_full_model_point_train_values_and_grads(clip_np, params):
    """Point prompt, training path: per-frame values, merged values, loss AND
    gradients must match the reference-wired torch mirror."""
    clip = _jax_clip(clip_np)
    loss_j, per_obj, per_cat, grads_j = _run_jax(params, clip, "point")

    grad_roots = ("memory_attention", "memory_encoder", "sam_mask_decoder",
                  "obj_ptr_proj")
    tp = to_torch_tree(params, grad_roots=grad_roots)
    frames_t = torch_forward_tracking(
        tp, _cfg(), clip_np["images"], clip_np["obj_masks"],
        point_coords=t(clip_np["coords"]),
        point_labels=t(clip_np["labels"].astype(np.float32)),
        prompt_type="point")
    merged_t = torch_merge(frames_t, clip_np["obj_to_cat"], N_CAT)
    loss_t = torch_multistep_loss(merged_t, clip_np["cat_masks"])

    # decisive obj-score signs (no bifurcation near 0) — guards the test
    osl = per_obj["object_score_logits"]
    assert np.min(np.abs(osl)) > 1e-3, "obj scores too close to 0 for parity"

    _assert_frames_close(per_obj, per_cat, frames_t, merged_t, atol=2e-2)
    np.testing.assert_allclose(loss_j, loss_t.item(), rtol=2e-3)

    # ---- gradients: detach boundaries + within-frame flow ----
    loss_t.backward()

    def leaves(node, prefix=""):
        if isinstance(node, dict):
            for k, v in node.items():
                yield from leaves(v, f"{prefix}/{k}")
        else:
            yield prefix, node

    # memory_encoder + obj_ptr_proj outputs are only consumed through the
    # detached bank -> EXACTLY zero grads on both sides (detach parity)
    for root in ("memory_encoder", "obj_ptr_proj"):
        for path, leaf in leaves(tp[root], root):
            g = leaf.grad
            assert g is None or float(g.abs().max()) == 0.0, \
                f"torch {path} got nonzero grad through a detach boundary"
        gmax = max(float(np.max(np.abs(g)))
                   for _, g in leaves(grads_j[root], root))
        assert gmax == 0.0, f"jax {root} got grad through stop_gradient"

    # memory_attention + mask_decoder grads must MATCH (within-frame flow)
    for root in ("memory_attention", "sam_mask_decoder"):
        jl = dict(leaves(grads_j[root], root))
        for path, leaf in leaves(tp[root], root):
            gt = np.zeros_like(jl[path]) if leaf.grad is None \
                else leaf.grad.numpy()
            gj = jl[path]
            scale = max(np.max(np.abs(gt)), np.max(np.abs(gj)), 1e-8)
            if scale < 1e-6:
                # analytically-zero grads (e.g. attention k_proj bias: softmax
                # is invariant to a constant key offset) — only round-off here
                continue
            # elementwise, tolerating rare ReLU-boundary gate flips (<0.5%)
            ok = np.isclose(gj / scale, gt / scale, atol=1.5e-2)
            assert ok.mean() >= 0.995, \
                f"grad mismatch at {path}: {(~ok).sum()}/{ok.size} elements" \
                f" differ (scale {scale:.2e})"
            cos = float((gj * gt).sum() /
                        (np.linalg.norm(gj) * np.linalg.norm(gt) + 1e-12))
            assert cos > 0.999, f"grad direction mismatch at {path}: {cos}"
        # the subtree must actually receive gradient
        assert max(np.max(np.abs(g)) for g in
                   jax.tree.leaves(grads_j[root])) > 0.0


def test_full_model_mask_train(clip_np, params):
    """Mask prompt, training path (mask-bypass on frame 0 incl. the
    mask_downsample->heads obj_ptr route)."""
    clip = _jax_clip(clip_np)
    loss_j, per_obj, per_cat, _ = _run_jax(params, clip, "mask")

    tp = to_torch_tree(params)
    frames_t = torch_forward_tracking(tp, _cfg(), clip_np["images"],
                                      clip_np["obj_masks"],
                                      prompt_type="mask")
    merged_t = torch_merge(frames_t, clip_np["obj_to_cat"], N_CAT)
    loss_t = torch_multistep_loss(merged_t, clip_np["cat_masks"])

    _assert_frames_close(per_obj, per_cat, frames_t, merged_t, atol=2e-2)
    np.testing.assert_allclose(loss_j, loss_t.item(), rtol=2e-3)


def test_full_model_point_eval(clip_np, params):
    """Eval path (training=False): same wiring, no remat, stability fallback
    disabled on both sides (it is covered by its own unit tests and would
    bifurcate on random weights near the threshold)."""
    clip = _jax_clip(clip_np)
    _, per_obj, per_cat, _ = _run_jax(
        params, clip, "point", training=False,
        dynamic_multimask_via_stability=False)

    tp = to_torch_tree(params)
    frames_t = torch_forward_tracking(
        tp, _cfg(dynamic_multimask_via_stability=False),
        clip_np["images"], clip_np["obj_masks"],
        point_coords=t(clip_np["coords"]),
        point_labels=t(clip_np["labels"].astype(np.float32)),
        prompt_type="point")
    merged_t = torch_merge(frames_t, clip_np["obj_to_cat"], N_CAT)
    _assert_frames_close(per_obj, per_cat, frames_t, merged_t, atol=2e-2)


def test_fuse_memory_reference_wiring():
    """The sharp layout test: our fixed-shape ``fuse_memory`` (ring slots +
    validity biases) vs the reference's variable-length memory construction
    (sam2_base.py:530-680) rebuilt in torch — compared at the memory-attention
    OUTPUT, where tpos/pointer wiring errors are ~100x the parity noise.

    Simulates frame t=5 of a 10-frame video: 4 of 6 non-cond ring slots
    valid, 4 of 9 non-cond pointer slots valid. The torch mirror lists
    entries in the reference's own order (cond, earliest..latest) — also
    cross-checking that slot order only enters through the tpos table.
    In-test mutation asserts prove sensitivity; a garbage-in-invalid-slots
    assert proves the validity bias fully removes masked tokens."""
    cfg = _cfg()
    cfg = SAM2Config(backbone="tiny", image_size=64,
                     compute_dtype="float32",
                     use_activation_checkpoint=False, remat_mode="none")
    rng = np.random.default_rng(11)
    key = jax.random.PRNGKey(5)
    p = sam2_mod.init(key, cfg)
    p["maskmem_tpos_enc"] = p["maskmem_tpos_enc"] * 25.0
    p["obj_ptr_tpos_proj"]["weight"] = p["obj_ptr_tpos_proj"]["weight"] * 25.0
    p = jax.tree.map(lambda x: np.asarray(x), p)

    T, t_cur, O = 10, 5, 2
    Fs = cfg.feat_size
    HW = Fs * Fs
    C, mem_dim = cfg.d_model, cfg.mem_dim
    M = cfg.num_maskmem
    layout = sam2_mod.memory_layout(cfg, T)          # 10 ptr slots
    R, Pn = M - 1, layout.num_ptrs - 1

    from sam2_video_tpu.ops.position_encoding import sine_pe_2d
    curr = rng.standard_normal((O, HW, C)).astype(np.float32)
    curr_pos = np.asarray(sine_pe_2d(Fs, Fs, C)).reshape(HW, C)
    mem_pos_grid = np.asarray(sine_pe_2d(Fs, Fs, mem_dim)).reshape(HW, mem_dim)
    spatial_mem = rng.standard_normal((M, O, HW, mem_dim)).astype(np.float32)
    obj_ptrs = rng.standard_normal((layout.num_ptrs, O, C)).astype(np.float32)

    ring = np.arange(R)
    spatial_valid = np.concatenate([[True], ring <= t_cur - 2])
    tpos_index = np.concatenate([[M - 1], np.arange(R)])
    pidx = np.arange(Pn)
    ptr_valid = np.concatenate([[True], pidx <= t_cur - 2])
    ptr_tpos = np.concatenate([[float(t_cur)],
                               (pidx + 1).astype(np.float32)])

    def run(tpos_idx, ptrs, ptr_t, smem):
        out = sam2_mod.fuse_memory(
            p, cfg, layout, jnp.asarray(curr), jnp.asarray(curr_pos),
            jnp.asarray(smem), jnp.asarray(spatial_valid),
            jnp.asarray(mem_pos_grid), jnp.asarray(tpos_idx),
            jnp.asarray(ptrs), jnp.asarray(ptr_valid), jnp.asarray(ptr_t),
            training=False)
        return np.asarray(jax.device_get(out))

    got = run(tpos_index, obj_ptrs, ptr_tpos, spatial_mem)

    # ---- torch mirror: reference-order variable-length construction ----
    tp = to_torch_tree(p)
    n_valid_slots = int(spatial_valid.sum())
    # reference order: cond (enc idx M-1), then earliest..latest non-cond;
    # our slot j holds the frame j steps back with enc idx j-1
    order = [0] + [j for j in range(R, 0, -1) if spatial_valid[j]]
    to_mem = [t(spatial_mem[j]) for j in order]
    to_pos = [t(mem_pos_grid)[None]
              + tp["maskmem_tpos_enc"][int(tpos_index[j])].reshape(1, 1, -1)
              for j in order]
    memory = torch.cat(to_mem, dim=1)
    mem_pos = torch.cat(to_pos, dim=1)
    num_spatial = n_valid_slots * HW

    valid_p = [i for i in range(layout.num_ptrs) if ptr_valid[i]]
    P = len(valid_p)
    ptrs_t = torch.stack([t(obj_ptrs[i]) for i in valid_p], dim=0)
    pos_list = torch.tensor([float(ptr_tpos[i]) for i in valid_p])
    obj_pos = sine_pe_1d_torch(pos_list / (layout.num_ptrs - 1), C)
    obj_pos = torch_linear(tp["obj_ptr_tpos_proj"], obj_pos)
    tpp = C // mem_dim
    ptr_tok = ptrs_t.reshape(P, O, tpp, mem_dim).permute(1, 0, 2, 3).reshape(
        O, P * tpp, mem_dim)
    ptr_pos = obj_pos.repeat_interleave(tpp, dim=0)[None]
    memory = torch.cat([memory, ptr_tok], dim=1)
    mem_pos = torch.cat([mem_pos.expand(O, -1, -1),
                         ptr_pos.expand(O, -1, -1)], dim=1)
    want = torch_memory_attention(
        tp["memory_attention"], t(curr), memory, t(curr_pos)[None], mem_pos,
        (Fs, Fs), num_spatial).detach().numpy()

    ATOL = 2e-3
    np.testing.assert_allclose(got, want, atol=ATOL)

    # ---- in-test mutation sensitivity (layout errors must scream) ----
    mut_tpos = np.concatenate([[M - 1], np.arange(R)[::-1]])
    d = np.abs(run(mut_tpos, obj_ptrs, ptr_tpos, spatial_mem) - got).max()
    assert d > 10 * ATOL, f"tpos-index mutation only moved output by {d}"

    mut_ptr_t = ptr_tpos.copy()
    mut_ptr_t[1:5] = ptr_tpos[1:5][::-1]  # reverse the valid ptr tpos
    d = np.abs(run(tpos_index, obj_ptrs, mut_ptr_t, spatial_mem) - got).max()
    assert d > 10 * ATOL, f"ptr-tpos mutation only moved output by {d}"

    mut_ptrs = obj_ptrs.copy()
    mut_ptrs[[1, 4]] = obj_ptrs[[4, 1]]  # swap two valid pointers
    d = np.abs(run(tpos_index, mut_ptrs, ptr_tpos, spatial_mem) - got).max()
    assert d > 10 * ATOL, f"ptr-order mutation only moved output by {d}"

    # ---- invalid slots are FULLY masked: garbage there changes nothing ----
    garb = spatial_mem.copy()
    garb[~spatial_valid] = 1e3
    np.testing.assert_allclose(run(tpos_index, obj_ptrs, ptr_tpos, garb),
                               got, atol=1e-4,
                               err_msg="invalid spatial slots leak")
    garb_p = obj_ptrs.copy()
    garb_p[~ptr_valid] = 1e3
    np.testing.assert_allclose(run(tpos_index, garb_p, ptr_tpos, spatial_mem),
                               got, atol=1e-4,
                               err_msg="invalid pointer slots leak")


def test_padded_objects_do_not_change_categories(clip_np, params):
    """Padding objects (obj_to_cat == -1) must leave per-category outputs
    unchanged — the static-shape equivalent of the reference's variable
    object count."""
    clip = _jax_clip(clip_np)
    _, _, per_cat2, _ = _run_jax(params, clip, "point")

    O_pad = N_OBJ + 2
    pad_clip = VideoClip(
        images=clip.images, cat_masks=clip.cat_masks,
        obj_masks=jnp.concatenate(
            [clip.obj_masks,
             jnp.zeros((2,) + clip.obj_masks.shape[1:], jnp.float32)]),
        obj_to_cat=jnp.concatenate(
            [clip.obj_to_cat, -jnp.ones((2,), jnp.int32)]),
        point_coords=jnp.concatenate(
            [clip.point_coords, jnp.zeros((2, 1, 2), jnp.float32)]),
        point_labels=jnp.concatenate(
            [clip.point_labels, -jnp.ones((2, 1), jnp.int32)]))
    _, per_obj_p, per_cat_p, _ = _run_jax(params, pad_clip, "point")
    assert per_obj_p["high_res_masks"].shape[1] == O_pad
    for k in ("high_res_masks", "high_res_multimasks", "ious",
              "object_score_logits"):
        np.testing.assert_allclose(per_cat_p[k], per_cat2[k], atol=1e-4,
                                   err_msg=f"padded objects leaked into {k}")
