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


def test_wrapper_fallback_on_cpu(rng):
    """On CPU the public wrapper must route to sdpa and still be correct."""
    fa.INTERPRET = False
    q, k, v = _case(rng, BH=2, Lq=100, Lk=130)  # non-tileable shapes
    got = fa.flash_attention(q, k, v)
    want = sdpa(q[:, None], k[:, None], v[:, None])[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
