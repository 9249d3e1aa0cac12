"""Flash-attention kernel correctness vs the XLA sdpa reference, in Pallas
interpreter mode on CPU (forward + gradients, with and without key bias)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sam2_video_tpu.ops import flash_attention as fa
from sam2_video_tpu.ops.attention import sdpa


@pytest.fixture(autouse=True)
def interpret_mode():
    fa.INTERPRET = True
    yield
    fa.INTERPRET = False


def _case(rng, BH=2, Lq=128, Lk=256, D=128, Dv=128):
    q = rng.standard_normal((BH, Lq, D)).astype(np.float32)
    k = rng.standard_normal((BH, Lk, D)).astype(np.float32)
    v = rng.standard_normal((BH, Lk, Dv)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_forward_matches_sdpa(rng):
    q, k, v = _case(rng)
    bias = jnp.zeros((2, 1, k.shape[1]), jnp.float32)
    got = fa._flash_attention_3d(q, k, v, bias, 128)
    want = sdpa(q[:, None], k[:, None], v[:, None])[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_forward_with_key_bias_masking(rng):
    q, k, v = _case(rng, Lk=256)
    bias = np.zeros((2, 1, 256), np.float32)
    bias[:, :, 128:] = -1e9
    got = fa._flash_attention_3d(q, k, v, jnp.asarray(bias), 128)
    want = sdpa(q[:, None], k[:, :128][:, None], v[:, :128][:, None])[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_gradients_match_sdpa(rng):
    q, k, v = _case(rng, BH=1, Lq=64, Lk=128)
    bias = jnp.zeros((1, 1, 128), jnp.float32)

    def f_flash(q, k, v):
        return jnp.sum(jnp.sin(fa._flash_attention_3d(q, k, v, bias, 128)))

    def f_ref(q, k, v):
        return jnp.sum(jnp.sin(sdpa(q[:, None], k[:, None], v[:, None])[:, 0]))

    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   err_msg=f"d{name}")


def test_gradients_with_bias_masking(rng):
    q, k, v = _case(rng, BH=1, Lq=64, Lk=256)
    bias_np = np.zeros((1, 1, 256), np.float32)
    bias_np[:, :, 192:] = -1e9
    bias = jnp.asarray(bias_np)

    def f_flash(q, k, v):
        return jnp.sum(fa._flash_attention_3d(q, k, v, bias, 128) ** 2)

    def f_ref(q, k, v):
        full_bias = jnp.broadcast_to(bias[:, None, :, :], (1, 1, 64, 256))
        return jnp.sum(sdpa(q[:, None], k[:, None], v[:, None],
                            full_bias)[:, 0] ** 2)

    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   err_msg=f"d{name}")
    # masked keys receive zero gradient
    np.testing.assert_allclose(np.asarray(g_flash[1][:, 192:]), 0.0, atol=1e-6)


def _kproj_case(rng, BH=2, Lq=64, D=256, kv=64, gw=8, gh=8, slots=7,
                ptr_tokens=64):
    """Realistic memory-cross-attention layout at toy size: ``slots`` spatial
    tiles of gw*gh tokens + unrotated pointer tokens."""
    num_spatial = slots * gw * gh
    Lk = num_spatial + ptr_tokens
    q = jnp.asarray(rng.standard_normal((BH, Lq, D)).astype(np.float32))
    kin = jnp.asarray(rng.standard_normal((BH, Lk, kv)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((BH, Lk, kv)).astype(np.float32))
    wk_w = jnp.asarray(rng.standard_normal((D, kv)).astype(np.float32) * 0.1)
    wk_b = jnp.asarray(rng.standard_normal((D,)).astype(np.float32) * 0.1)
    bias_np = np.zeros((Lk,), np.float32)
    bias_np[2 * gw * gh: 3 * gw * gh] = -1e9      # one invalid slot
    bias_np[-ptr_tokens // 2:] = -1e9              # some invalid pointers
    return q, kin, v, wk_w, wk_b, jnp.asarray(bias_np), num_spatial, (gw, gh)


def _kproj_ref(q, kin, v, wk_w, wk_b, key_bias, num_spatial, grid_wh,
               theta=10000.0):
    """The XLA-path math the fused kernel must reproduce: project k, rope the
    spatial block with the tiled half-layout axial table, sdpa."""
    from sam2_video_tpu.ops.position_encoding import (apply_rope_half,
                                                      axial_rope_table_half)
    gw, gh = grid_wh
    D = q.shape[-1]
    k_pre = kin @ wk_w.T + wk_b
    cos, sin = axial_rope_table_half(D, gw, gh, theta)
    reps = num_spatial // (gw * gh)
    cos_t, sin_t = jnp.tile(cos, (reps, 1)), jnp.tile(sin, (reps, 1))
    k_sp = apply_rope_half(k_pre[:, :num_spatial], cos_t, sin_t)
    k = jnp.concatenate([k_sp, k_pre[:, num_spatial:]], axis=1)
    bias = jnp.broadcast_to(key_bias[None, None, None, :],
                            (q.shape[0], 1, q.shape[1], k.shape[1]))
    return sdpa(q[:, None], k[:, None], v[:, None], bias)[:, 0]


def test_kproj_forward_matches_xla_path(rng):
    q, kin, v, wk_w, wk_b, bias, num_spatial, grid_wh = _kproj_case(rng)
    got = fa.flash_attention_kproj(q, kin, v, wk_w, wk_b, bias,
                                   num_spatial, grid_wh)[..., :64]
    want = _kproj_ref(q, kin, v, wk_w, wk_b, bias, num_spatial, grid_wh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)
    # pad lanes come back as exact zeros
    full = fa.flash_attention_kproj(q, kin, v, wk_w, wk_b, bias,
                                    num_spatial, grid_wh)
    np.testing.assert_allclose(np.asarray(full[..., 64:]), 0.0, atol=0)


def test_kproj_gradients_match_xla_path(rng):
    q, kin, v, wk_w, wk_b, bias, num_spatial, grid_wh = _kproj_case(
        rng, BH=1, Lq=32)

    def f_fused(q, kin, v, wk_w, wk_b):
        out = fa.flash_attention_kproj(q, kin, v, wk_w, wk_b, bias,
                                       num_spatial, grid_wh)[..., :64]
        return jnp.sum(jnp.sin(out))

    def f_ref(q, kin, v, wk_w, wk_b):
        return jnp.sum(jnp.sin(_kproj_ref(q, kin, v, wk_w, wk_b, bias,
                                          num_spatial, grid_wh)))

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2, 3, 4))(q, kin, v, wk_w,
                                                         wk_b)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(q, kin, v, wk_w, wk_b)
    for a, b, name in zip(g_fused, g_ref,
                          ("q", "kin", "v", "wk_w", "wk_b")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   err_msg=f"d{name}")


def test_kproj_multiblock_grid(rng):
    """Lk=1280 -> two 640-token k-blocks: covers the cross-block dwk
    accumulation, rope position indexing at j>0, and BH>1 accumulation."""
    q, kin, v, wk_w, wk_b, bias, num_spatial, grid_wh = _kproj_case(
        rng, BH=2, Lq=32, slots=19)  # 19*64 + 64 = 1280

    def f_fused(q, kin, v, wk_w, wk_b):
        out = fa.flash_attention_kproj(q, kin, v, wk_w, wk_b, bias,
                                       num_spatial, grid_wh)[..., :64]
        return jnp.sum(jnp.sin(out))

    def f_ref(q, kin, v, wk_w, wk_b):
        return jnp.sum(jnp.sin(_kproj_ref(q, kin, v, wk_w, wk_b, bias,
                                          num_spatial, grid_wh)))

    got = fa.flash_attention_kproj(q, kin, v, wk_w, wk_b, bias,
                                   num_spatial, grid_wh)[..., :64]
    want = _kproj_ref(q, kin, v, wk_w, wk_b, bias, num_spatial, grid_wh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)
    g_fused = jax.grad(f_fused, argnums=(0, 1, 2, 3, 4))(q, kin, v, wk_w,
                                                         wk_b)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(q, kin, v, wk_w, wk_b)
    for a, b, name in zip(g_fused, g_ref,
                          ("q", "kin", "v", "wk_w", "wk_b")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   err_msg=f"d{name}")


def test_kproj_nonuniform_tail_padding(rng):
    """Lk not a 256-multiple exercises the zero-token/-inf-bias tail pad."""
    q, kin, v, wk_w, wk_b, bias, num_spatial, grid_wh = _kproj_case(
        rng, BH=1, Lq=32, ptr_tokens=32)   # Lk = 480 -> pads to 512
    got = fa.flash_attention_kproj(q, kin, v, wk_w, wk_b, bias,
                                   num_spatial, grid_wh)[..., :64]
    want = _kproj_ref(q, kin, v, wk_w, wk_b, bias, num_spatial, grid_wh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_wrapper_fallback_on_cpu(rng):
    """On CPU the public wrapper must route to sdpa and still be correct."""
    fa.INTERPRET = False
    q, k, v = _case(rng, BH=2, Lq=100, Lk=130)  # non-tileable shapes
    got = fa.flash_attention(q, k, v)
    want = sdpa(q[:, None], k[:, None], v[:, None])[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
