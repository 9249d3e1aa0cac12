"""Hiera multi-scale vision trunk (https://arxiv.org/abs/2306.00989), built
TPU-first: NHWC activations, static window partition via reshape/transpose
(no dynamic padding at standard image sizes), attention on the MXU in bf16.

Parity spec: /root/reference/sam2_video/model/modeling/backbones/hieradet.py
(MultiScaleAttention:39-81, MultiScaleBlock:84-166, Hiera:169-299) and
backbones/utils.py (window partition:16-61, PatchEmbed:63-93). Param paths
mirror the torch state_dict (``trunk.blocks.{i}.attn.qkv.weight`` etc.) so the
pretrained checkpoint converts by path rename (+ conv layout transpose).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops import (common as nn)
from ..ops.attention import merge_heads, sdpa, split_heads
from ..ops.resize import resize_bicubic_torch


@dataclasses.dataclass(frozen=True)
class HieraConfig:
    embed_dim: int = 96
    num_heads: int = 1
    stages: tuple = (2, 3, 16, 3)
    global_att_blocks: tuple = (12, 16, 20)
    window_pos_embed_bkg_spatial_size: tuple = (14, 14)
    window_spec: tuple = (8, 4, 14, 7)
    q_stride: tuple = (2, 2)
    q_pool: int = 3
    dim_mul: float = 2.0
    head_mul: float = 2.0
    mlp_ratio: float = 4.0

    @property
    def depth(self) -> int:
        return sum(self.stages)

    @property
    def stage_ends(self) -> tuple:
        return tuple(sum(self.stages[: i + 1]) - 1 for i in range(len(self.stages)))

    @property
    def q_pool_blocks(self) -> tuple:
        return tuple(x + 1 for x in self.stage_ends[:-1])[: self.q_pool]

    def block_specs(self):
        """Static per-block spec: (dim, dim_out, num_heads, window_size, q_pool)."""
        specs = []
        embed_dim, num_heads = self.embed_dim, self.num_heads
        cur_stage = 1
        for i in range(self.depth):
            dim_out = embed_dim
            window_size = self.window_spec[cur_stage - 1]
            if i in self.global_att_blocks:
                window_size = 0
            if i - 1 in self.stage_ends:
                dim_out = int(embed_dim * self.dim_mul)
                num_heads = int(num_heads * self.head_mul)
                cur_stage += 1
            specs.append(dict(dim=embed_dim, dim_out=dim_out, num_heads=num_heads,
                              window_size=window_size,
                              q_pool=i in self.q_pool_blocks))
            embed_dim = dim_out
        return specs

    @property
    def channel_list(self) -> tuple:
        """Per-stage output channels, lowest-res first (matches reference)."""
        specs = self.block_specs()
        return tuple(specs[i]["dim_out"] for i in self.stage_ends[::-1])


# Model-family presets (hyperparameters from the published SAM2.1 configs,
# cf. /root/reference/configs/sam2/sam2.1_hiera_t.yaml:9-15).
HIERA_PRESETS = {
    "tiny": HieraConfig(embed_dim=96, num_heads=1, stages=(1, 2, 7, 2),
                        global_att_blocks=(5, 7, 9),
                        window_pos_embed_bkg_spatial_size=(7, 7)),
    "small": HieraConfig(embed_dim=96, num_heads=1, stages=(1, 2, 11, 2),
                         global_att_blocks=(7, 10, 13),
                         window_pos_embed_bkg_spatial_size=(7, 7)),
    "base_plus": HieraConfig(embed_dim=112, num_heads=2, stages=(2, 3, 16, 3),
                             global_att_blocks=(12, 16, 20),
                             window_pos_embed_bkg_spatial_size=(14, 14)),
    "large": HieraConfig(embed_dim=144, num_heads=2, stages=(2, 6, 36, 4),
                         global_att_blocks=(23, 33, 43),
                         window_spec=(8, 4, 16, 8),
                         window_pos_embed_bkg_spatial_size=(7, 7)),
}


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init(key, cfg: HieraConfig):
    keys = jax.random.split(key, cfg.depth + 3)
    p = {
        "patch_embed": {"proj": nn.conv2d_init(keys[0], 3, cfg.embed_dim, 7)},
        # stored NHWC ([1, h, w, C]); torch keeps [1, C, h, w]
        "pos_embed": jnp.zeros((1, *cfg.window_pos_embed_bkg_spatial_size,
                                cfg.embed_dim)),
        "pos_embed_window": jnp.zeros((1, cfg.window_spec[0], cfg.window_spec[0],
                                       cfg.embed_dim)),
        "blocks": {},
    }
    for i, spec in enumerate(cfg.block_specs()):
        k = jax.random.split(keys[i + 3], 6)
        blk = {
            "norm1": nn.layer_norm_init(spec["dim"]),
            "attn": {
                "qkv": nn.linear_init(k[0], spec["dim"], spec["dim_out"] * 3),
                "proj": nn.linear_init(k[1], spec["dim_out"], spec["dim_out"]),
            },
            "norm2": nn.layer_norm_init(spec["dim_out"]),
            "mlp": nn.mlp_init(k[2], spec["dim_out"],
                               int(spec["dim_out"] * cfg.mlp_ratio),
                               spec["dim_out"], num_layers=2),
        }
        if spec["dim"] != spec["dim_out"]:
            blk["proj"] = nn.linear_init(k[3], spec["dim"], spec["dim_out"])
        p["blocks"][str(i)] = blk
    return p


# ---------------------------------------------------------------------------
# Windowing (static shapes; pad only when H % window != 0)
# ---------------------------------------------------------------------------


def _window_partition(x, ws: int):
    """[B, H, W, C] -> [B*nW, ws, ws, C], plus padded (Hp, Wp)."""
    B, H, W, C = x.shape
    pad_h = (ws - H % ws) % ws
    pad_w = (ws - W % ws) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)
    return x, (Hp, Wp)


def _window_unpartition(windows, ws: int, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    C = windows.shape[-1]
    B = windows.shape[0] // (Hp * Wp // ws // ws)
    x = windows.reshape(B, Hp // ws, Wp // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    if Hp > H or Wp > W:
        x = x[:, :H, :W]
    return x


def _attention(p, x, num_heads: int, q_pool: bool, q_stride):
    """MultiScaleAttention: qkv -> optional q max-pool -> SDPA -> proj.

    x: [B, H, W, C_in] -> [B, H', W', C_out].

    The checkpoint stores one fused qkv projection (hieradet.py:50); applying
    it fused and then reshaping [.., 3, C] relayouts the whole window tensor
    (a real HBM copy per block, ~3 ms/step profiled round 3). The weight is
    row-sliced into three projections instead — free on the [3C, C] weight,
    issued once per backbone apply — so q/k/v are each written exactly once
    in their consumed layout. Single-head blocks skip split/merge entirely
    (same measured win as memory_attention._self_attn)."""
    B, H, W, _ = x.shape
    w, b = p["qkv"]["weight"], p["qkv"].get("bias")
    dim_out = w.shape[0] // 3
    q, k, v = (
        nn.linear({"weight": w[i * dim_out:(i + 1) * dim_out],
                   **({"bias": b[i * dim_out:(i + 1) * dim_out]}
                      if b is not None else {})}, x)
        for i in range(3))
    if q_pool:
        q = nn.max_pool2d(q, q_stride[0], q_stride[0])
        H, W = q.shape[1], q.shape[2]
    q = q.reshape(B, H * W, dim_out)
    k = k.reshape(B, k.shape[1] * k.shape[2], dim_out)
    v = v.reshape(B, v.shape[1] * v.shape[2], dim_out)
    if num_heads > 1:
        q, k, v = (split_heads(t, num_heads) for t in (q, k, v))
    out = sdpa(q, k, v)
    if num_heads > 1:
        out = merge_heads(out)
    out = out.reshape(B, H, W, dim_out)
    return nn.linear(p["proj"], out)


def _block(p, x, spec, q_stride):
    shortcut = x
    x = nn.layer_norm(p["norm1"], x, eps=1e-6)
    if spec["dim"] != spec["dim_out"]:
        s = nn.linear(p["proj"], x)
        if spec["q_pool"]:
            s = nn.max_pool2d(s, q_stride[0], q_stride[0])
        shortcut = s

    ws = spec["window_size"]
    if ws > 0:
        H, W = x.shape[1], x.shape[2]
        x, pad_hw = _window_partition(x, ws)

    x = _attention(p["attn"], x, spec["num_heads"],
                   spec["q_pool"], q_stride)
    if spec["q_pool"]:
        ws = spec["window_size"] // q_stride[0]
        H, W = shortcut.shape[1], shortcut.shape[2]
        pad_h = (ws - H % ws) % ws if ws > 0 else 0
        pad_w = (ws - W % ws) % ws if ws > 0 else 0
        pad_hw = (H + pad_h, W + pad_w)

    if spec["window_size"] > 0:
        x = _window_unpartition(x, ws, pad_hw, (H, W))

    x = shortcut + x
    x = x + nn.mlp(p["mlp"], nn.layer_norm(p["norm2"], x, eps=1e-6),
                   activation="gelu")
    return x


def _get_pos_embed(p, hw):
    h, w = hw
    bkg = resize_bicubic_torch(p["pos_embed"], (h, w))  # [1, h, w, C]
    win = p["pos_embed_window"]
    tiles = (1, h // win.shape[1], w // win.shape[2], 1)
    return bkg + jnp.tile(win, tiles)


def apply(p, x, cfg: HieraConfig, allow_fused: bool = False,
          fused_vjp: bool = False) -> list[jnp.ndarray]:
    """x: [B, H, W, 3] -> list of per-stage NHWC features (high-res first:
    strides 4, 8, 16, 32).

    ``allow_fused=True`` routes eligible blocks through the forward-only
    fused Pallas block kernel (ops/hiera_block_kernel.py). Callers may set
    it ONLY when no gradient w.r.t. the trunk parameters will be requested —
    the image encoder is frozen, or the model runs in eval mode; see
    SAM2Config.fused_backbone.

    ``fused_vjp=True`` instead routes eligible blocks through the
    differentiable fused kernel (custom-VJP Pallas backward,
    ops/hiera_block_bwd.py) — for encoder-trainable training; see
    SAM2Config.fused_backbone_vjp."""
    x = nn.conv2d(p["patch_embed"]["proj"], x, stride=4, padding=3)
    x = x + _get_pos_embed(p, x.shape[1:3]).astype(x.dtype)
    outputs = []
    specs = cfg.block_specs()
    stage_ends = set(cfg.stage_ends)
    if allow_fused:
        from ..ops import hiera_block_kernel as hbk
    if fused_vjp:
        from ..ops import hiera_block_bwd as hbb
    for i, spec in enumerate(specs):
        bp = p["blocks"][str(i)]
        if allow_fused and hbk.fused_block_eligible(
                spec, x.shape[1], x.shape[2], cfg.mlp_ratio):
            x = hbk.fused_block(bp, x, spec, cfg.q_stride, cfg.mlp_ratio)
        elif fused_vjp and hbb.fused_block_bwd_eligible(
                spec, x.shape[1], x.shape[2], cfg.mlp_ratio):
            x = hbb.fused_block_trainable(bp, x, spec, cfg.q_stride,
                                          cfg.mlp_ratio)
        else:
            x = _block(bp, x, spec, cfg.q_stride)
        if i in stage_ends:
            outputs.append(x)
    return outputs
