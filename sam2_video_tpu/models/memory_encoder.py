"""Memory encoder: fuses the current frame's pixel features with its predicted
mask into a compact (mem_dim=64) spatial memory.

Parity spec: /root/reference/sam2_video/model/modeling/memory_encoder.py
(MaskDownSampler:17-58, CXBlock:62-117, Fuser:120-135, MemoryEncoder:138-181).
NHWC throughout; the depthwise 7x7 + pointwise convs of the ConvNeXt fuser map
directly onto XLA's fused conv + matmul path.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..ops import common as nn
from ..ops.position_encoding import sine_pe_2d


@dataclasses.dataclass(frozen=True)
class MemoryEncoderConfig:
    out_dim: int = 64
    in_dim: int = 256
    mask_downsampler_kernel: int = 3
    mask_downsampler_stride: int = 2
    mask_downsampler_padding: int = 1
    mask_downsampler_total_stride: int = 16
    fuser_num_layers: int = 2
    fuser_dim: int = 256
    fuser_kernel: int = 7
    fuser_padding: int = 3
    layer_scale_init_value: float = 1e-6
    num_pos_feats: int = 64


def _mask_downsampler_init(key, cfg: MemoryEncoderConfig):
    s = cfg.mask_downsampler_stride
    num_layers = int(math.log2(cfg.mask_downsampler_total_stride) // math.log2(s))
    layers = {}
    in_ch = 1
    idx = 0
    ks = jax.random.split(key, num_layers + 1)
    for i in range(num_layers):
        out_ch = in_ch * s * s
        layers[str(idx)] = nn.conv2d_init(ks[i], in_ch, out_ch,
                                          cfg.mask_downsampler_kernel)
        layers[str(idx + 1)] = nn.layer_norm_init(out_ch)
        idx += 3  # conv, norm, act (act has no params but keeps torch indices)
        in_ch = out_ch
    layers[str(idx)] = nn.conv2d_init(ks[-1], in_ch, cfg.fuser_dim, 1)
    return {"encoder": layers}


def _mask_downsampler(p, cfg: MemoryEncoderConfig, x):
    s = cfg.mask_downsampler_stride
    num_layers = int(math.log2(cfg.mask_downsampler_total_stride) // math.log2(s))
    enc = p["encoder"]
    idx = 0
    for _ in range(num_layers):
        x = nn.conv2d(enc[str(idx)], x, stride=s,
                      padding=cfg.mask_downsampler_padding)
        x = nn.layer_norm_2d(enc[str(idx + 1)], x)
        x = nn.gelu(x)
        idx += 3
    return nn.conv2d(enc[str(idx)], x)


def _cx_block_init(key, cfg: MemoryEncoderConfig):
    d = cfg.fuser_dim
    ks = jax.random.split(key, 3)
    return {
        "dwconv": nn.conv2d_init(ks[0], d, d, cfg.fuser_kernel, groups=d),
        "norm": nn.layer_norm_init(d),
        "pwconv1": nn.linear_init(ks[1], d, 4 * d),
        "pwconv2": nn.linear_init(ks[2], 4 * d, d),
        "gamma": cfg.layer_scale_init_value * jnp.ones((d,)),
    }


def _cx_block(p, cfg: MemoryEncoderConfig, x):
    inp = x
    x = nn.conv2d(p["dwconv"], x, padding=cfg.fuser_padding,
                  groups=cfg.fuser_dim)
    x = nn.layer_norm_2d(p["norm"], x)
    x = nn.linear(p["pwconv1"], x)
    x = nn.gelu(x)
    x = nn.linear(p["pwconv2"], x)
    x = p["gamma"].astype(x.dtype) * x
    return inp + x


def init(key, cfg: MemoryEncoderConfig):
    ks = jax.random.split(key, 4 + cfg.fuser_num_layers)
    p = {
        "mask_downsampler": _mask_downsampler_init(ks[0], cfg),
        "pix_feat_proj": nn.conv2d_init(ks[1], cfg.in_dim, cfg.in_dim, 1),
        "fuser": {"layers": {
            str(i): _cx_block_init(ks[2 + i], cfg)
            for i in range(cfg.fuser_num_layers)
        }},
    }
    if cfg.out_dim != cfg.in_dim:
        p["out_proj"] = nn.conv2d_init(ks[-1], cfg.in_dim, cfg.out_dim, 1)
    return p


def apply(p, cfg: MemoryEncoderConfig, pix_feat, masks):
    """pix_feat: [B, H16, W16, C]; masks: [B, H, W, 1] *already* passed through
    scaled sigmoid (the SAM2 recurrence always pre-applies sigmoid scale/bias,
    sam2_base.py:736-750, so skip_mask_sigmoid=True parity).

    Returns (memory features [B, H16, W16, out_dim], pos enc [H16, W16, out_dim]).
    """
    m = _mask_downsampler(p["mask_downsampler"], cfg, masks)
    x = nn.conv2d(p["pix_feat_proj"], pix_feat)
    x = x + m
    for i in range(cfg.fuser_num_layers):
        x = _cx_block(p["fuser"]["layers"][str(i)], cfg, x)
    if "out_proj" in p:
        x = nn.conv2d(p["out_proj"], x)
    pos = sine_pe_2d(x.shape[1], x.shape[2], cfg.num_pos_feats)
    return x, pos
