"""Hiera trunk torch-mirror parity: windowed attention with padding,
q-pooling stage transitions, global blocks, and the tiled+interpolated
position embedding — the places where silent layout bugs would destroy
pretrained-weight accuracy."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from sam2_video_tpu.models import hiera
from tests.test_torch_parity import t, torch_linear, torch_ln


def torch_window_partition(x, ws):
    B, H, W, C = x.shape
    pad_h = (ws - H % ws) % ws
    pad_w = (ws - W % ws) % ws
    if pad_h or pad_w:
        x = F.pad(x, (0, 0, 0, pad_w, 0, pad_h))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.view(B, Hp // ws, ws, Wp // ws, ws, C)
    return (x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C), (Hp, Wp))


def torch_window_unpartition(win, ws, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = win.shape[0] // (Hp * Wp // ws // ws)
    x = win.view(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


def torch_msattn(p, x, heads, q_pool):
    B, H, W, _ = x.shape
    qkv = torch_linear(p["qkv"], x).reshape(B, H * W, 3, -1)
    q, k, v = qkv.unbind(2)
    dim_out = q.shape[-1]
    if q_pool:
        q = q.reshape(B, H, W, dim_out).permute(0, 3, 1, 2)
        q = F.max_pool2d(q, 2, 2).permute(0, 2, 3, 1)
        H, W = q.shape[1], q.shape[2]
        q = q.reshape(B, H * W, dim_out)

    def split(z):
        b, n, c = z.shape
        return z.reshape(b, n, heads, c // heads).transpose(1, 2)

    o = F.scaled_dot_product_attention(split(q), split(k), split(v))
    o = o.transpose(1, 2).reshape(B, H, W, dim_out)
    return torch_linear(p["proj"], o)


def torch_block(p, x, spec, q_stride):
    shortcut = x
    x = torch_ln(p["norm1"], x, eps=1e-6)
    if spec["dim"] != spec["dim_out"]:
        s = torch_linear(p["proj"], x)
        if spec["q_pool"]:
            s = F.max_pool2d(s.permute(0, 3, 1, 2), 2, 2).permute(0, 2, 3, 1)
        shortcut = s
    ws = spec["window_size"]
    if ws > 0:
        H, W = x.shape[1], x.shape[2]
        x, pad_hw = torch_window_partition(x, ws)
    x = torch_msattn(p["attn"], x, spec["num_heads"], spec["q_pool"])
    if spec["q_pool"]:
        ws = spec["window_size"] // q_stride[0]
        H, W = shortcut.shape[1], shortcut.shape[2]
        pad_h = (ws - H % ws) % ws if ws else 0
        pad_w = (ws - W % ws) % ws if ws else 0
        pad_hw = (H + pad_h, W + pad_w)
    if spec["window_size"] > 0:
        x = torch_window_unpartition(x, ws, pad_hw, (H, W))
    x = shortcut + x
    h = torch_ln(p["norm2"], x, eps=1e-6)
    h = F.gelu(torch_linear(p["mlp"]["layers"]["0"], h))
    h = torch_linear(p["mlp"]["layers"]["1"], h)
    return x + h


def test_hiera_trunk_parity(rng):
    cfg = hiera.HIERA_PRESETS["tiny"]
    p = hiera.init(jax.random.PRNGKey(0), cfg)
    # 96px: 24x24 post-patch grid (divisible by the stage-1 window, as the
    # pos-embed tiling requires — same constraint as the reference); stages
    # 3/4 (grids 6 and 3 vs windows 14 and 7) exercise window padding, and
    # q-pool transitions happen at blocks 1, 3, 10
    x = rng.standard_normal((1, 96, 96, 3)).astype(np.float32)
    got = hiera.apply(p, jnp.asarray(x), cfg)

    # torch mirror
    xt = t(x.transpose(0, 3, 1, 2))
    w = t(p["patch_embed"]["proj"]["weight"]).permute(3, 2, 0, 1)
    y = F.conv2d(xt, w, t(p["patch_embed"]["proj"]["bias"]), stride=4,
                 padding=3).permute(0, 2, 3, 1)
    h = y.shape[1]
    bkg = F.interpolate(t(p["pos_embed"]).permute(0, 3, 1, 2), size=(h, h),
                        mode="bicubic", align_corners=False)
    win = t(p["pos_embed_window"]).permute(0, 3, 1, 2)
    tiles = [a // b for a, b in zip(bkg.shape, win.shape)]
    pos = (bkg + win.tile(tiles)).permute(0, 2, 3, 1)
    y = y + pos

    outs = []
    specs = cfg.block_specs()
    for i, spec in enumerate(specs):
        y = torch_block(p["blocks"][str(i)], y, spec, cfg.q_stride)
        if i in cfg.stage_ends:
            outs.append(y)

    for level, (a, b) in enumerate(zip(got, outs)):
        np.testing.assert_allclose(
            np.asarray(a), b.detach().numpy(), atol=2e-3,
            err_msg=f"stage {level}")
