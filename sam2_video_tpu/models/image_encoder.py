"""FPN neck + ImageEncoder wrapper over the Hiera trunk.

Parity spec: /root/reference/sam2_video/model/modeling/backbones/image_encoder.py
(FpnNeck:45-134, ImageEncoder:14-42). 1x1 lateral convs to d_model, top-down
nearest 2x fusion only on ``fpn_top_down_levels`` (SAM2.1 uses [2, 3]), sine
position encodings per level, ``scalp`` discards the lowest-res level.
All activations NHWC.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops import common as nn
from ..ops.position_encoding import sine_pe_2d
from ..ops.resize import resize_nearest
from . import hiera


@dataclasses.dataclass(frozen=True)
class ImageEncoderConfig:
    trunk: hiera.HieraConfig = dataclasses.field(
        default_factory=lambda: hiera.HIERA_PRESETS["tiny"])
    d_model: int = 256
    scalp: int = 1
    fpn_top_down_levels: tuple = (2, 3)
    num_pos_feats: int = 256

    @property
    def backbone_channel_list(self) -> tuple:
        return self.trunk.channel_list  # lowest-res first, e.g. (768,384,192,96)


def init(key, cfg: ImageEncoderConfig):
    ks = jax.random.split(key, 1 + len(cfg.backbone_channel_list))
    neck = {"convs": {}}
    for i, ch in enumerate(cfg.backbone_channel_list):
        neck["convs"][str(i)] = {
            "conv": nn.conv2d_init(ks[i + 1], ch, cfg.d_model, 1)}
    return {"trunk": hiera.init(ks[0], cfg.trunk), "neck": neck}


def apply(p, x, cfg: ImageEncoderConfig, allow_fused: bool = False,
          fused_vjp: bool = False):
    """x: [B, H, W, 3] -> dict with
    - backbone_fpn: list of NHWC features, high-res first (post-scalp)
    - vision_pos_enc: matching sine PEs [H, W, C] (broadcast over batch)
    - vision_features: the last (lowest-res kept) feature map
    """
    xs = hiera.apply(p["trunk"], x, cfg.trunk, allow_fused=allow_fused,
                     fused_vjp=fused_vjp)  # high-res first
    n = len(xs) - 1
    out = [None] * len(xs)
    pos = [None] * len(xs)
    prev = None
    # top-down: i indexes resolution (0 = highest); convs[k] maps channel
    # list entry k (lowest-res first) -> conv index n - i.
    for i in range(n, -1, -1):
        lateral = nn.conv2d(p["neck"]["convs"][str(n - i)]["conv"], xs[i])
        if i in cfg.fpn_top_down_levels and prev is not None:
            h, w = lateral.shape[1], lateral.shape[2]
            top_down = resize_nearest(
                jnp.moveaxis(prev.astype(jnp.float32), -1, 1), (h, w))
            top_down = jnp.moveaxis(top_down, 1, -1).astype(lateral.dtype)
            prev = lateral + top_down
        else:
            prev = lateral
        out[i] = prev
        pos[i] = sine_pe_2d(prev.shape[1], prev.shape[2], cfg.num_pos_feats)
    if cfg.scalp > 0:
        out, pos = out[: -cfg.scalp], pos[: -cfg.scalp]
    return {"backbone_fpn": out, "vision_pos_enc": pos,
            "vision_features": out[-1]}
