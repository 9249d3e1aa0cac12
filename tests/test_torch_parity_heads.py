"""Full-module torch-mirror parity: memory encoder and the complete mask
decoder ``predict_masks`` (upscaling + skips + hypernetworks + heads),
independently re-implemented in torch from the published architecture and fed
our initialized weights."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from sam2_video_tpu.models import mask_decoder as md
from sam2_video_tpu.models import memory_encoder as me
from tests.test_torch_parity import t, torch_linear, torch_ln


def torch_conv(p, x, stride=1, padding=0, groups=1):
    w = t(p["weight"]).permute(3, 2, 0, 1)  # HWIO -> OIHW
    return F.conv2d(x, w, t(p.get("bias")), stride=stride, padding=padding,
                    groups=groups)


def torch_ln2d_nchw(p, x, eps=1e-6):
    # channel-dim layernorm on NCHW
    u = x.mean(1, keepdim=True)
    s = (x - u).pow(2).mean(1, keepdim=True)
    x = (x - u) / torch.sqrt(s + eps)
    return t(p["weight"])[None, :, None, None] * x + \
        t(p["bias"])[None, :, None, None]


def test_memory_encoder_parity(rng):
    cfg = me.MemoryEncoderConfig()
    p = me.init(jax.random.PRNGKey(0), cfg)
    B, Fh = 2, 8
    pix = rng.standard_normal((B, Fh, Fh, 256)).astype(np.float32)
    masks = rng.standard_normal((B, 16 * Fh, 16 * Fh, 1)).astype(np.float32)

    got_mem, got_pos = me.apply(p, cfg, jnp.asarray(pix), jnp.asarray(masks))

    # torch mirror (NCHW)
    x = t(masks.transpose(0, 3, 1, 2))
    enc = p["mask_downsampler"]["encoder"]
    # 4 downsample stages (stride 2, total 16) then 1x1: indices 0,3,6,9,12
    i = 0
    for _ in range(4):
        x = torch_conv(enc[str(i)], x, stride=2, padding=1)
        # LayerNorm2d over channels
        x = torch_ln2d_nchw(enc[str(i + 1)], x)
        x = F.gelu(x)
        i += 3
    x = torch_conv(enc[str(i)], x)

    pf = torch_conv(p["pix_feat_proj"], t(pix.transpose(0, 3, 1, 2)))
    y = pf + x
    for li in range(cfg.fuser_num_layers):
        lp = p["fuser"]["layers"][str(li)]
        inp = y
        y = torch_conv(lp["dwconv"], y, padding=3, groups=256)
        y = torch_ln2d_nchw(lp["norm"], y)
        y = y.permute(0, 2, 3, 1)
        y = torch_linear(lp["pwconv1"], y)
        y = F.gelu(y)
        y = torch_linear(lp["pwconv2"], y)
        y = t(lp["gamma"]) * y
        y = inp + y.permute(0, 3, 1, 2)
    y = torch_conv(p["out_proj"], y)

    np.testing.assert_allclose(np.asarray(got_mem),
                               y.permute(0, 2, 3, 1).detach().numpy(),
                               atol=3e-4)
    assert got_pos.shape == (Fh, Fh, cfg.num_pos_feats)


def test_mask_decoder_predict_masks_parity(rng):
    cfg = md.MaskDecoderConfig(transformer_dim=64, transformer_mlp_dim=128,
                               transformer_num_heads=4,
                               iou_head_hidden_dim=64)
    p = md.init(jax.random.PRNGKey(3), cfg)
    B, H = 2, 8
    img = rng.standard_normal((B, H, H, 64)).astype(np.float32)
    img_pe = rng.standard_normal((H, H, 64)).astype(np.float32)
    sparse = rng.standard_normal((B, 3, 64)).astype(np.float32)
    dense = rng.standard_normal((B, H, H, 64)).astype(np.float32)
    hr0 = rng.standard_normal((B, 4 * H, 4 * H, 8)).astype(np.float32)
    hr1 = rng.standard_normal((B, 2 * H, 2 * H, 16)).astype(np.float32)

    got_masks, got_iou, got_tok, got_obj = md.predict_masks(
        p, cfg, jnp.asarray(img), jnp.asarray(img_pe), jnp.asarray(sparse),
        jnp.asarray(dense), high_res_features=(jnp.asarray(hr0),
                                               jnp.asarray(hr1)))

    # ---- torch mirror ----
    toks = torch.cat([t(p["obj_score_token"]["weight"]),
                      t(p["iou_token"]["weight"]),
                      t(p["mask_tokens"]["weight"])], dim=0)
    tokens = torch.cat([toks[None].expand(B, -1, -1), t(sparse)], dim=1)
    src = (t(img) + t(dense)).reshape(B, H * H, 64)
    pos = t(img_pe).reshape(1, H * H, 64).expand(B, -1, -1)

    # two-way transformer (mirror from test_torch_parity)
    from tests.test_torch_parity import torch_attn
    queries, keys = tokens, src
    for i in range(cfg.transformer_depth):
        lp = p["transformer"]["layers"][str(i)]
        if i == 0:
            queries = torch_attn(lp["self_attn"], queries, queries, queries,
                                 cfg.transformer_num_heads)
        else:
            q = queries + tokens
            queries = queries + torch_attn(lp["self_attn"], q, q, queries,
                                           cfg.transformer_num_heads)
        queries = torch_ln(lp["norm1"], queries)
        q = queries + tokens
        k = keys + pos
        queries = queries + torch_attn(lp["cross_attn_token_to_image"], q, k,
                                       keys, cfg.transformer_num_heads)
        queries = torch_ln(lp["norm2"], queries)
        hmid = F.relu(torch_linear(lp["mlp"]["layers"]["0"], queries))
        queries = queries + torch_linear(lp["mlp"]["layers"]["1"], hmid)
        queries = torch_ln(lp["norm3"], queries)
        q = queries + tokens
        k = keys + pos
        keys = keys + torch_attn(lp["cross_attn_image_to_token"], k, q,
                                 queries, cfg.transformer_num_heads)
        keys = torch_ln(lp["norm4"], keys)
    q = queries + tokens
    k = keys + pos
    queries = queries + torch_attn(p["transformer"]["final_attn_token_to_image"],
                                   q, k, keys, cfg.transformer_num_heads)
    hs = torch_ln(p["transformer"]["norm_final_attn"], queries)

    iou_token_out = hs[:, 1]
    mask_tokens_out = hs[:, 2: 2 + cfg.num_mask_tokens]

    src2 = keys.reshape(B, H, H, 64).permute(0, 3, 1, 2)
    up = p["output_upscaling"]
    # deconv k2 s2: torch weight layout from HWIO: [kh,kw,in,out]->[in,out,kh,kw]
    w1 = t(up["0"]["weight"]).permute(2, 3, 0, 1)
    dc1 = F.conv_transpose2d(src2, w1, t(up["0"]["bias"]), stride=2)
    x = dc1 + t(hr1.transpose(0, 3, 1, 2))
    # LayerNorm2d then exact GELU
    x = F.gelu(torch_ln2d_nchw(up["1"], x))
    w2 = t(up["3"]["weight"]).permute(2, 3, 0, 1)
    dc2 = F.conv_transpose2d(x, w2, t(up["3"]["bias"]), stride=2)
    upscaled = F.gelu(dc2 + t(hr0.transpose(0, 3, 1, 2)))

    hyper = []
    for i in range(cfg.num_mask_tokens):
        hp = p["output_hypernetworks_mlps"][str(i)]
        hcur = mask_tokens_out[:, i]
        hcur = F.relu(torch_linear(hp["layers"]["0"], hcur))
        hcur = F.relu(torch_linear(hp["layers"]["1"], hcur))
        hcur = torch_linear(hp["layers"]["2"], hcur)
        hyper.append(hcur)
    hyper = torch.stack(hyper, dim=1)
    b, c, h4, w4 = upscaled.shape
    masks = (hyper @ upscaled.reshape(b, c, h4 * w4)).reshape(
        b, -1, h4, w4)

    ih = p["iou_prediction_head"]
    iou = F.relu(torch_linear(ih["layers"]["0"], iou_token_out))
    iou = F.relu(torch_linear(ih["layers"]["1"], iou))
    iou = torch.sigmoid(torch_linear(ih["layers"]["2"], iou))

    oh = p["pred_obj_score_head"]
    obj = F.relu(torch_linear(oh["layers"]["0"], hs[:, 0]))
    obj = F.relu(torch_linear(oh["layers"]["1"], obj))
    obj = torch_linear(oh["layers"]["2"], obj)

    np.testing.assert_allclose(np.asarray(got_masks), masks.detach().numpy(),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_iou), iou.detach().numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_obj), obj.detach().numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_tok),
                               mask_tokens_out.detach().numpy(), atol=3e-4)
