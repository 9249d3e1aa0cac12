"""Memory encoder: fuses the current frame's pixel features with its predicted
mask into a compact (mem_dim=64) spatial memory.

Parity spec: /root/reference/sam2_video/model/modeling/memory_encoder.py
(MaskDownSampler:17-58, CXBlock:62-117, Fuser:120-135, MemoryEncoder:138-181).
NHWC throughout; the depthwise 7x7 + pointwise convs of the ConvNeXt fuser map
directly onto XLA's fused conv + matmul path.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

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
    if (cfg.mask_downsampler_stride == 2 and cfg.mask_downsampler_kernel == 3
            and cfg.mask_downsampler_padding == 1
            and cfg.mask_downsampler_total_stride == 16
            and x.shape[1] % 16 == 0 and x.shape[2] % 16 == 0):
        return _mask_downsampler_s2d(p, cfg, x)
    return _mask_downsampler_naive(p, cfg, x)


def _mask_downsampler_naive(p, cfg: MemoryEncoderConfig, x):
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


# --- space-to-depth formulation of the downsampler pyramid -----------------
#
# The naive pyramid runs four stride-2 convs whose channel counts (1, 4, 16,
# 64) are far below the TPU's 128-lane tile, so XLA pads the minor dim (or
# worse, puts the batch of 8 objects in lanes): the 21-MFLOP first conv
# measured 1.9 ms/step — ~300x off the bandwidth roofline — plus ~2 ms of
# layout shuffles around it (round-3 trace). The TPU-native formulation
# keeps every intermediate at the FINAL 1/16 resolution with phases packed
# into the lane dim: the input space-to-depths to [N, H/16, W/16, 256] once,
# and each k3/s2 conv becomes a dense 2x2x256x256 conv at that fixed shape —
# exact same linear map (each output element receives precisely its nine
# taps, routed by a static phase map), perfect MXU shapes, zero strided
# access. LayerNorm/GELU run in the packed domain by regrouping lanes as
# [channel, phase]. The effective 2x2 kernels are derived from the canonical
# 3x3 weights by a constant-0/1 einsum, so the whole path is differentiable
# back to the checkpoint-layout parameters and the converter is untouched.


@functools.lru_cache(maxsize=None)
def _phase_route(g_in: int, g_out: int) -> np.ndarray:
    """R[h, ri, ro, a] = 1 iff input phase ri (of a g_in-phase axis) feeds
    output phase ro (of g_out) through tap a of a k3/s2/p1 conv, with block
    offset h-1 (h=0: previous s2d block, h=1: same block)."""
    R = np.zeros((2, g_in, g_out, 3), np.float32)
    for ro in range(g_out):
        for a in range(3):
            q = 2 * ro + a - 1
            h = 0 if q < 0 else 1
            R[h, q % g_in, ro, a] = 1.0
    return R


def _effective_weight(w: jnp.ndarray, g_in: int, g_out: int) -> jnp.ndarray:
    """[3, 3, Cin, Cout] canonical kernel -> [2, 2, Cin*g_in^2, Cout*g_out^2]
    packed-phase kernel (lane order: channel-major, then row phase, then
    column phase — consistent across layers so no relayout between convs)."""
    R = jnp.asarray(_phase_route(g_in, g_out))
    weff = jnp.einsum("hpqa,wrsb,abio->hwiproqs", R, R, w)
    cin, cout = w.shape[2], w.shape[3]
    return weff.reshape(2, 2, cin * g_in * g_in, cout * g_out * g_out)


def _packed_layer_norm(pln, x, channels: int, phases: int,
                       eps: float = 1e-6):
    """LayerNorm over the channel group of a phase-packed lane dim
    (lane = c * phases + p): same math as nn.layer_norm_2d per spatial
    site, computed at the packed 1/16-resolution layout."""
    s = x.shape
    xf = x.astype(jnp.float32).reshape(s[:-1] + (channels, phases))
    # one-pass moments (var = E[x^2] - mu^2): halves the reduction passes
    # over the packed tensor vs the two-pass form; the cancellation risk is
    # negligible at LN activation scales and the equivalence test pins it
    mu = xf.mean(axis=-2, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-2, keepdims=True) - jnp.square(mu)
    var = jnp.maximum(var, 0.0)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * pln["weight"].reshape(channels, 1) + pln["bias"].reshape(
        channels, 1)
    return y.reshape(s).astype(x.dtype)


def _mask_downsampler_s2d(p, cfg: MemoryEncoderConfig, x):
    """x: [N, H, W, 1] -> [N, H/16, W/16, fuser_dim]; exact (up to float
    reassociation) equivalent of _mask_downsampler_naive for the k3/s2/p1,
    total-stride-16 geometry."""
    N, H, W, _ = x.shape
    ho, wo = H // 16, W // 16
    x = x.reshape(N, ho, 16, wo, 16).transpose(0, 1, 3, 2, 4)
    x = x.reshape(N, ho, wo, 256)
    enc = p["encoder"]
    geometry = ((1, 16, 4, 8), (4, 8, 16, 4), (16, 4, 64, 2), (64, 2, 256, 1))
    idx = 0
    for ci, gi, co, go in geometry:
        cp = enc[str(idx)]
        weff = _effective_weight(cp["weight"], gi, go).astype(x.dtype)
        x = jax.lax.conv_general_dilated(
            x, weff, window_strides=(1, 1), padding=((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = x + jnp.repeat(cp["bias"], go * go).astype(x.dtype)
        x = _packed_layer_norm(enc[str(idx + 1)], x, co, go * go)
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


def apply(p, cfg: MemoryEncoderConfig, pix_feat, masks,
          allow_fused: bool = True):
    """pix_feat: [B, H16, W16, C]; masks: [B, H, W, 1] *already* passed through
    scaled sigmoid (the SAM2 recurrence always pre-applies sigmoid scale/bias,
    sam2_base.py:736-750, so skip_mask_sigmoid=True parity).

    ``allow_fused``: route through the single-program Pallas kernel
    (ops/memory_encoder_kernel.py) at the default geometry. The caller must
    clear this when gradients can flow through the output (full-BPTT
    training) — the kernel has no VJP because under the reference's
    per-entry detach semantics none is ever needed.

    Returns (memory features [B, H16, W16, out_dim], pos enc [H16, W16, out_dim]).
    """
    from ..ops.memory_encoder_kernel import (fused_memory_encoder,
                                             fused_memory_encoder_eligible)

    feat_hw = pix_feat.shape[1:3]
    if allow_fused and fused_memory_encoder_eligible(
            cfg, masks.shape[1:3], feat_hw):
        # cut tangents at the kernel boundary: every gradient path through
        # the encoder is already dead (the output's only consumer is the
        # detached bank — the allow_fused contract), so stopping gradients
        # here changes nothing numerically but keeps autodiff linearization
        # from demanding a JVP rule for the pallas_call
        p = jax.lax.stop_gradient(p)
        pix_feat = jax.lax.stop_gradient(pix_feat)
        masks = jax.lax.stop_gradient(masks)
        pix_proj = nn.conv2d(p["pix_feat_proj"], pix_feat)
        x = fused_memory_encoder(p, cfg, pix_proj, masks)
        pos = sine_pe_2d(x.shape[1], x.shape[2], cfg.num_pos_feats)
        return x, pos

    m = _mask_downsampler(p["mask_downsampler"], cfg, masks)
    x = nn.conv2d(p["pix_feat_proj"], pix_feat)
    x = x + m
    for i in range(cfg.fuser_num_layers):
        x = _cx_block(p["fuser"]["layers"][str(i)], cfg, x)
    if "out_proj" in p:
        x = nn.conv2d(p["out_proj"], x)
    pos = sine_pe_2d(x.shape[1], x.shape[2], cfg.num_pos_feats)
    return x, pos
