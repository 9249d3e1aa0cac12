"""Functional NN primitives over plain param pytrees.

Design notes (TPU-first):

- Params are nested dicts of jnp arrays whose *paths mirror the PyTorch SAM2
  checkpoint naming* (``image_encoder.trunk.blocks.0.attn.qkv.weight`` becomes
  ``params["image_encoder"]["trunk"]["blocks"]["0"]["attn"]["qkv"]["weight"]``),
  so the pretrained-checkpoint converter (training/convert.py) is a mechanical
  path rename. Linear weights keep the torch ``[out, in]`` layout (einsum makes
  that free on the MXU); conv kernels are stored HWIO (converter transposes
  once at load time) because activations are NHWC on TPU.
- All modules are pure functions ``apply(params, x, ...)`` plus an
  ``init(key, ...)`` returning the param dict. No classes, no state.
- Mixed precision: callers cast activations to a compute dtype (bf16 on TPU);
  normalization statistics are always computed in f32.

Reference parity: layers match the vendored SAM2 spec in
/root/reference/sam2_video/model/modeling/sam2_utils.py (MLP:112-140,
LayerNorm2d:143-156) and torch.nn.Linear/Conv2d semantics.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Initializers (matching torch defaults so un-pretrained modules behave alike)
# ---------------------------------------------------------------------------


def _kaiming_uniform(key, shape, fan_in, dtype=jnp.float32):
    # torch nn.Linear / nn.Conv2d default: kaiming_uniform(a=sqrt(5)) which
    # reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)) scaled by sqrt(3)*gain;
    # gain = sqrt(2/(1+5)) = sqrt(1/3) -> bound = 1/sqrt(fan_in).
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    """torch.nn.init.trunc_normal_(std=std) — truncation at ±2."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------


def linear_init(key, in_dim: int, out_dim: int, bias: bool = True):
    kw, kb = jax.random.split(key)
    p = {"weight": _kaiming_uniform(kw, (out_dim, in_dim), in_dim)}
    if bias:
        p["bias"] = _kaiming_uniform(kb, (out_dim,), in_dim)
    return p


def linear(p, x):
    """x: [..., in] @ weight[out, in] -> [..., out]."""
    y = jnp.einsum("...i,oi->...o", x, p["weight"].astype(x.dtype))
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# LayerNorm (channel-last) and LayerNorm2d (NHWC over channel axis)
# ---------------------------------------------------------------------------


def layer_norm_init(dim: int):
    return {"weight": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def layer_norm(p, x, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * p["weight"] + p["bias"]
    return y.astype(x.dtype)


def layer_norm_2d(p, x, eps: float = 1e-6):
    """Reference LayerNorm2d (sam2_utils.py:143-156) normalizes over the
    channel dim only. Our activations are NHWC so that is the last axis —
    identical math to ``layer_norm`` but with the reference's biased variance
    and default eps=1e-6."""
    return layer_norm(p, x, eps=eps)


# ---------------------------------------------------------------------------
# Conv2d / ConvTranspose2d / MaxPool (NHWC)
# ---------------------------------------------------------------------------


def conv2d_init(key, in_ch: int, out_ch: int, kernel_size, bias: bool = True,
                groups: int = 1):
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    kh, kw = kernel_size
    fan_in = in_ch // groups * kh * kw
    k1, k2 = jax.random.split(key)
    p = {"weight": _kaiming_uniform(k1, (kh, kw, in_ch // groups, out_ch), fan_in)}
    if bias:
        p["bias"] = _kaiming_uniform(k2, (out_ch,), fan_in)
    return p


def conv2d(p, x, stride=1, padding=0, groups: int = 1):
    """x: [N, H, W, C] with HWIO kernel."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    w = p["weight"].astype(x.dtype)
    # no preferred_element_type: the MXU accumulates bf16 convs in f32
    # internally, and a strict-dtype lax op must see matching operand dtypes
    # in the transpose (backward) conv as well.
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def conv_transpose2d_init(key, in_ch: int, out_ch: int, kernel_size: int,
                          bias: bool = True):
    fan_in = in_ch * kernel_size * kernel_size
    k1, k2 = jax.random.split(key)
    p = {"weight": _kaiming_uniform(
        k1, (kernel_size, kernel_size, in_ch, out_ch), fan_in)}
    if bias:
        p["bias"] = _kaiming_uniform(k2, (out_ch,), fan_in)
    return p


def conv_transpose2d(p, x, stride: int):
    """Matches torch ConvTranspose2d(kernel_size=stride=s, padding=0).

    With non-overlapping kernels (the only flavor SAM uses: the 2x upscaling
    deconvs, mask_decoder.py:66-74) the transpose conv is exactly one matmul:
    out[n, i*s+di, j*s+dj, o] = sum_c x[n,i,j,c] * w[di,dj,c,o]. We express it
    that way — a single MXU einsum plus a reshape — instead of relying on
    lax.conv_transpose kernel-flip conventions.
    """
    w = p["weight"].astype(x.dtype)  # [s, s, in, out]
    s = w.shape[0]
    assert s == stride and w.shape[1] == stride, \
        "conv_transpose2d only supports kernel_size == stride"
    n, h, wd, _ = x.shape
    y = jnp.einsum("nhwc,klco->nhkwlo", x, w,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    y = y.reshape(n, h * s, wd * s, w.shape[-1])
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def max_pool2d(x, window: int, stride: int):
    """x: [N, H, W, C]; torch MaxPool2d(ceil_mode=False) == VALID."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


# ---------------------------------------------------------------------------
# MLP (reference sam2_utils.py MLP:112-140 — num_layers linears, act between)
# ---------------------------------------------------------------------------


def mlp_init(key, in_dim: int, hidden_dim: int, out_dim: int, num_layers: int):
    dims = [in_dim] + [hidden_dim] * (num_layers - 1) + [out_dim]
    keys = jax.random.split(key, num_layers)
    return {
        "layers": {
            str(i): linear_init(keys[i], dims[i], dims[i + 1])
            for i in range(num_layers)
        }
    }


def mlp(p, x, activation="relu", sigmoid_output: bool = False):
    layers = p["layers"]
    n = len(layers)
    act = {"relu": jax.nn.relu, "gelu": jax.nn.gelu}[activation]
    for i in range(n):
        x = linear(layers[str(i)], x)
        if i < n - 1:
            x = act(x)
    if sigmoid_output:
        x = jax.nn.sigmoid(x)
    return x


# ---------------------------------------------------------------------------
# Misc
# ---------------------------------------------------------------------------


def embedding_init(key, num: int, dim: int):
    return {"weight": jax.random.normal(key, (num, dim))}


def gelu(x):
    # torch nn.GELU default is the exact (erf) formulation.
    return jax.nn.gelu(x, approximate=False)


def param_count(tree) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))


def tree_paths(tree, prefix: str = "") -> Sequence[str]:
    """Flatten a nested param dict into torch-style dotted paths."""
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.extend(tree_paths(v, prefix + str(k) + "."))
    else:
        out.append(prefix[:-1])
    return out
