"""Position encodings for the SAM2 stack, as pure jnp functions.

Parity targets (cited into /root/reference/sam2_video/model/modeling/):
- ``sine_pe_2d``      ~ position_encoding.py:16-130  (PositionEmbeddingSine)
- ``random_pe_grid`` / ``random_pe_coords``
                      ~ position_encoding.py:133-177 (PositionEmbeddingRandom)
- ``axial_rope_table`` / ``apply_rope`` ~ position_encoding.py:185-239
                        (init_t_xy / compute_axial_cis / apply_rotary_enc),
                        expressed as real cos/sin pairs instead of complex64
                        (TPUs have no complex MXU path; the interleaved
                        real/imag rotation is two fused multiplies on the VPU).
- ``sine_pe_1d``      ~ sam2_utils.py:64-75 (get_1d_sine_pe)

All tables here are functions of *static* shapes, so under jit they are
constant-folded by XLA and never recomputed per step.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def sine_pe_2d(h: int, w: int, num_pos_feats: int, temperature: float = 10000.0,
               normalize: bool = True, scale: float | None = None) -> jnp.ndarray:
    """Returns [H, W, C] sine position embedding, C = num_pos_feats (must be
    even; half allotted to y, half to x — concatenated (y, x) like the
    reference's `_pe` which returns channels [pos_y, pos_x])."""
    assert num_pos_feats % 2 == 0
    npf = num_pos_feats // 2
    if scale is None:
        scale = 2 * math.pi
    y_embed = np.arange(1, h + 1, dtype=np.float32)[:, None] * np.ones((1, w), np.float32)
    x_embed = np.ones((h, 1), np.float32) * np.arange(1, w + 1, dtype=np.float32)[None, :]
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, -1:] + eps) * scale
    dim_t = np.arange(npf, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / npf)
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    # interleave sin/cos over pairs, exactly like the torch stack+flatten
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])],
                     axis=3).reshape(h, w, npf)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])],
                     axis=3).reshape(h, w, npf)
    return jnp.asarray(np.concatenate([pos_y, pos_x], axis=2))


def sine_pe_1d(pos: jnp.ndarray, dim: int, temperature: float = 10000.0) -> jnp.ndarray:
    """[...,] positions -> [..., dim] embedding (get_1d_sine_pe parity)."""
    pe_dim = dim // 2
    dim_t = jnp.arange(pe_dim, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / pe_dim)
    pe = pos.astype(jnp.float32)[..., None] / dim_t
    return jnp.concatenate([jnp.sin(pe), jnp.cos(pe)], axis=-1)


# ---------------------------------------------------------------------------
# Random-Fourier point PE (SAM prompt encoder)
# ---------------------------------------------------------------------------


def random_pe_init(key, num_pos_feats: int, scale: float | None = None):
    if scale is None or scale <= 0.0:
        scale = 1.0
    return {
        "positional_encoding_gaussian_matrix":
            scale * jax.random.normal(key, (2, num_pos_feats))
    }


def _random_pe_encode(p, coords):
    """coords in [0,1]^2, shape [..., 2] -> [..., 2*num_pos_feats]."""
    g = p["positional_encoding_gaussian_matrix"].astype(jnp.float32)
    c = 2.0 * coords.astype(jnp.float32) - 1.0
    c = c @ g
    c = 2.0 * jnp.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def random_pe_grid(p, h: int, w: int) -> jnp.ndarray:
    """Dense grid PE, returns [H, W, C]."""
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # [H,W,2](x,y)
    return _random_pe_encode(p, grid)


def random_pe_coords(p, coords, image_size: tuple[int, int]) -> jnp.ndarray:
    """coords [..., 2] in pixel units (x, y) -> [..., C]."""
    scale = jnp.asarray([1.0 / image_size[1], 1.0 / image_size[0]], jnp.float32)
    return _random_pe_encode(p, coords * scale)


# ---------------------------------------------------------------------------
# Axial RoPE (memory attention)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def axial_rope_table(dim: int, end_x: int, end_y: int, theta: float = 10000.0):
    """Real-valued axial rotary table.

    The reference builds complex ``freqs_cis`` of shape [end_x*end_y, dim//2]
    whose first dim//4 entries rotate by x-position and last dim//4 by
    y-position (compute_axial_cis). We return (cos, sin) each of shape
    [L, dim//2] with the same layout.
    """
    freqs = 1.0 / (theta ** (np.arange(0, dim, 4)[: dim // 4].astype(np.float32) / dim))
    t = np.arange(end_x * end_y, dtype=np.float32)
    t_x = t % end_x
    t_y = np.floor(t / end_x)
    ang_x = np.outer(t_x, freqs)
    ang_y = np.outer(t_y, freqs)
    ang = np.concatenate([ang_x, ang_y], axis=-1)  # [L, dim//2]
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate interleaved pairs of the last dim.

    x: [..., L, D]; cos/sin: [L, D//2] (or broadcastable [..., L, D//2]).
    Pairs (x[2i], x[2i+1]) are treated as complex numbers and multiplied by
    exp(i*ang) — identical to torch.view_as_complex path.
    """
    xf = x.astype(jnp.float32)
    x_even = xf[..., 0::2]
    x_odd = xf[..., 1::2]
    out_even = x_even * cos - x_odd * sin
    out_odd = x_even * sin + x_odd * cos
    out = jnp.stack([out_even, out_odd], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)


def tile_rope_table(cos: jnp.ndarray, sin: jnp.ndarray, repeats: int):
    """rope_k_repeat: tile the per-frame table along the sequence axis so a
    length-(repeats*L) memory sequence gets per-frame-identical rotations."""
    return (jnp.tile(cos, (repeats, 1)), jnp.tile(sin, (repeats, 1)))


# --- de-interleaved ("rotate-half") RoPE — the TPU-fast formulation --------
#
# ``apply_rope`` above slices stride-2 lanes and re-interleaves with
# stack+reshape: on TPU that lowers to gathers + layout copies on every
# [O, Lk, 256] key tensor, per layer, per frame (measured ~600 MB of HBM
# traffic per scan iteration). The equivalent fast form permutes the pair
# layout from interleaved (x0,y0,x1,y1,...) to split halves
# (x0,x1,...,y0,y1,...): the rotation becomes one fused multiply-add with a
# 128-lane-aligned half swap. The permutation itself is FREE because it is
# folded into the q/k projection weight rows (``deinterleave_perm``) — a
# permutation applied to both q and k leaves q·kᵀ unchanged, and v is never
# rotated, so attention outputs are identical (up to sum order on the MXU).


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def axial_rope_table_half(dim: int, end_x: int, end_y: int,
                          theta: float = 10000.0):
    """``axial_rope_table`` in de-interleaved layout: (cos, sin) of shape
    [L, dim] where position j and j+dim//2 carry the angle of pair j."""
    cos, sin = axial_rope_table(dim, end_x, end_y, theta)
    return (jnp.concatenate([cos, cos], axis=-1),
            jnp.concatenate([sin, sin], axis=-1))


def deinterleave_perm(d_model: int, num_heads: int) -> np.ndarray:
    """Row permutation that moves each head's even feature indices to the
    first half of the head dim and odd ones to the second half. Apply it to
    the OUT rows of q_proj/k_proj weights (and biases) so projections emit
    q/k directly in the ``apply_rope_half`` layout."""
    dh = d_model // num_heads
    within = np.concatenate([np.arange(0, dh, 2), np.arange(1, dh, 2)])
    return (np.arange(num_heads)[:, None] * dh + within[None, :]).reshape(-1)


def apply_rope_half(x: jnp.ndarray, cos: jnp.ndarray,
                    sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate de-interleaved pairs: x [..., L, D] (D split in halves),
    cos/sin [L, D]. Computes in x's dtype — under bf16 the products feed
    bf16 matmuls anyway and the angle range here is tiny (L <= a few
    thousand), so there is no f32 upcast (and none of its HBM traffic)."""
    cos = cos.astype(x.dtype)
    sin = sin.astype(x.dtype)
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    return x * cos + rot * sin
