"""Golden tests for ops: compared against independently-written torch/numpy
reference math (NOT copied from the reference repo — re-derived from the
published formulas so parity failures point at our implementation)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from sam2_video_tpu import ops


def test_linear_matches_torch(rng):
    lin = torch.nn.Linear(16, 32)
    x = rng.standard_normal((4, 16)).astype(np.float32)
    p = {"weight": jnp.asarray(lin.weight.detach().numpy()),
         "bias": jnp.asarray(lin.bias.detach().numpy())}
    got = np.asarray(ops.linear(p, jnp.asarray(x)))
    want = lin(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv2d_matches_torch(rng):
    conv = torch.nn.Conv2d(3, 8, kernel_size=7, stride=4, padding=3)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    w = conv.weight.detach().numpy().transpose(2, 3, 1, 0)  # OIHW->HWIO
    p = {"weight": jnp.asarray(w), "bias": jnp.asarray(conv.bias.detach().numpy())}
    got = np.asarray(ops.conv2d(p, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                stride=4, padding=3))
    want = conv(torch.from_numpy(x)).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_depthwise_conv_matches_torch(rng):
    conv = torch.nn.Conv2d(8, 8, kernel_size=7, padding=3, groups=8)
    x = rng.standard_normal((1, 8, 16, 16)).astype(np.float32)
    w = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
    p = {"weight": jnp.asarray(w), "bias": jnp.asarray(conv.bias.detach().numpy())}
    got = np.asarray(ops.conv2d(p, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                padding=3, groups=8))
    want = conv(torch.from_numpy(x)).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_conv_transpose_matches_torch(rng):
    deconv = torch.nn.ConvTranspose2d(8, 4, kernel_size=2, stride=2)
    x = rng.standard_normal((1, 8, 6, 6)).astype(np.float32)
    # torch ConvTranspose weight is [in, out, kh, kw] -> HWIO
    w = deconv.weight.detach().numpy().transpose(2, 3, 0, 1)
    p = {"weight": jnp.asarray(w), "bias": jnp.asarray(deconv.bias.detach().numpy())}
    got = np.asarray(ops.conv_transpose2d(p, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                          stride=2))
    want = deconv(torch.from_numpy(x)).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_layer_norm_matches_torch(rng):
    ln = torch.nn.LayerNorm(32, eps=1e-6)
    with torch.no_grad():
        ln.weight.copy_(torch.rand(32))
        ln.bias.copy_(torch.rand(32))
    x = rng.standard_normal((4, 32)).astype(np.float32)
    p = {"weight": jnp.asarray(ln.weight.detach().numpy()),
         "bias": jnp.asarray(ln.bias.detach().numpy())}
    got = np.asarray(ops.layer_norm(p, jnp.asarray(x), eps=1e-6))
    want = ln(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sdpa_matches_torch(rng):
    q = rng.standard_normal((2, 4, 10, 16)).astype(np.float32)
    k = rng.standard_normal((2, 4, 20, 16)).astype(np.float32)
    v = rng.standard_normal((2, 4, 20, 16)).astype(np.float32)
    got = np.asarray(ops.sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    want = F.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sdpa_bias_masking(rng):
    """Keys with -inf-like bias must get zero weight."""
    q = rng.standard_normal((1, 1, 4, 8)).astype(np.float32)
    k = rng.standard_normal((1, 1, 6, 8)).astype(np.float32)
    v = rng.standard_normal((1, 1, 6, 8)).astype(np.float32)
    bias = np.zeros((1, 1, 4, 6), np.float32)
    bias[..., 3:] = -1e9
    got = np.asarray(ops.sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                              jnp.asarray(bias)))
    want = np.asarray(ops.sdpa(jnp.asarray(q), jnp.asarray(k[:, :, :3]),
                               jnp.asarray(v[:, :, :3])))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sine_pe_2d_matches_reference_math():
    """Re-derivation of PositionEmbeddingSine (DETR-style) in torch."""
    h, w, npf = 6, 8, 64
    scale = 2 * np.pi
    y = torch.arange(1, h + 1, dtype=torch.float32).view(-1, 1).repeat(1, w)
    x = torch.arange(1, w + 1, dtype=torch.float32).view(1, -1).repeat(h, 1)
    y = y / (y[-1:, :] + 1e-6) * scale
    x = x / (x[:, -1:] + 1e-6) * scale
    dim_t = torch.arange(npf // 2, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / (npf // 2))
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    px = torch.stack((px[:, :, 0::2].sin(), px[:, :, 1::2].cos()), dim=3).flatten(2)
    py = torch.stack((py[:, :, 0::2].sin(), py[:, :, 1::2].cos()), dim=3).flatten(2)
    want = torch.cat([py, px], dim=2).numpy()
    got = np.asarray(ops.sine_pe_2d(h, w, npf))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sine_pe_1d():
    pos = jnp.asarray([0.0, 0.5, 3.0])
    pe = ops.sine_pe_1d(pos, 64)
    assert pe.shape == (3, 64)
    # position 0 -> sin=0, cos=1
    np.testing.assert_allclose(np.asarray(pe[0, :32]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pe[0, 32:]), 1.0, atol=1e-6)


def test_rope_matches_torch_complex(rng):
    """apply_rope == complex rotation (torch.view_as_complex formulation)."""
    dim, ex, ey = 32, 4, 3
    L = ex * ey
    cos, sin = ops.axial_rope_table(dim, ex, ey)
    x = rng.standard_normal((2, L, dim)).astype(np.float32)

    # torch reference: compute_axial_cis + complex multiply
    freqs = 1.0 / (10000.0 ** (torch.arange(0, dim, 4)[: dim // 4].float() / dim))
    t = torch.arange(L, dtype=torch.float32)
    tx, ty = t % ex, torch.div(t, ex, rounding_mode="floor").float()
    fx = torch.outer(tx, freqs)
    fy = torch.outer(ty, freqs)
    cis = torch.cat([torch.polar(torch.ones_like(fx), fx),
                     torch.polar(torch.ones_like(fy), fy)], dim=-1)
    xt = torch.from_numpy(x)
    xc = torch.view_as_complex(xt.reshape(2, L, dim // 2, 2))
    want = torch.view_as_real(xc * cis).flatten(2).numpy()

    got = np.asarray(ops.apply_rope(jnp.asarray(x), cos, sin))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rope_half_matches_interleaved_scores(rng):
    """The de-interleaved rotate-half RoPE (permutation folded into the q/k
    projections) must produce identical attention scores to the interleaved
    torch formulation — q.kT is invariant to a shared feature permutation."""
    from sam2_video_tpu.ops.position_encoding import (
        apply_rope_half, axial_rope_table_half, deinterleave_perm)

    dim, heads, ex, ey = 64, 2, 4, 3
    L = ex * ey
    dh = dim // heads
    q = rng.standard_normal((2, heads, L, dh)).astype(np.float32)
    k = rng.standard_normal((2, heads, L, dh)).astype(np.float32)

    cos, sin = ops.axial_rope_table(dh, ex, ey)
    want = np.einsum("bhqd,bhkd->bhqk",
                     np.asarray(ops.apply_rope(jnp.asarray(q), cos, sin)),
                     np.asarray(ops.apply_rope(jnp.asarray(k), cos, sin)))

    # per-head slice of the d_model-level permutation
    perm = deinterleave_perm(dim, heads).reshape(heads, dh) % dh
    c2, s2 = axial_rope_table_half(dh, ex, ey)
    qp = np.take_along_axis(q, perm[None, :, None, :], axis=-1)
    kp = np.take_along_axis(k, perm[None, :, None, :], axis=-1)
    got = np.einsum("bhqd,bhkd->bhqk",
                    np.asarray(apply_rope_half(jnp.asarray(qp), c2, s2)),
                    np.asarray(apply_rope_half(jnp.asarray(kp), c2, s2)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_rope_tile():
    cos, sin = ops.axial_rope_table(16, 2, 2)
    c2, s2 = ops.tile_rope_table(cos, sin, 3)
    assert c2.shape == (12, 8)
    np.testing.assert_allclose(np.asarray(c2[4:8]), np.asarray(cos))


def test_random_pe_coords_matches_math(rng):
    key = jax.random.PRNGKey(0)
    p = ops.random_pe_init(key, 8)
    coords = jnp.asarray(rng.uniform(0, 64, (2, 3, 2)).astype(np.float32))
    got = np.asarray(ops.random_pe_coords(p, coords, (64, 64)))
    g = np.asarray(p["positional_encoding_gaussian_matrix"])
    c = np.asarray(coords) / 64.0
    c = 2 * c - 1
    c = 2 * np.pi * (c @ g)
    want = np.concatenate([np.sin(c), np.cos(c)], axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bicubic_matches_torch(rng):
    x = rng.standard_normal((1, 3, 7, 7)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=(24, 24), mode="bicubic",
                         align_corners=False).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(ops.resize_bicubic_torch(
        jnp.asarray(x.transpose(0, 2, 3, 1)), (24, 24)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_bilinear_upsample_matches_torch(rng):
    x = rng.standard_normal((1, 2, 8, 8)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=(32, 32), mode="bilinear",
                         align_corners=False).numpy()
    got = np.asarray(ops.resize_bilinear(jnp.asarray(x), (32, 32)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_bilinear_downsample_matches_torch_antialias(rng):
    x = rng.standard_normal((1, 1, 32, 32)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=(8, 8), mode="bilinear",
                         align_corners=False, antialias=True).numpy()
    got = np.asarray(ops.resize_bilinear(jnp.asarray(x), (8, 8)))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_max_pool_matches_torch(rng):
    x = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    want = F.max_pool2d(torch.from_numpy(x), 2, 2).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(ops.max_pool2d(jnp.asarray(x.transpose(0, 2, 3, 1)), 2, 2))
    np.testing.assert_allclose(got, want)


def test_mlp_structure():
    key = jax.random.PRNGKey(0)
    p = ops.mlp_init(key, 8, 16, 4, num_layers=3)
    x = jnp.ones((2, 8))
    y = ops.mlp(p, x)
    assert y.shape == (2, 4)
    assert len(p["layers"]) == 3
