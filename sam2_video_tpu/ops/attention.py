"""Attention primitives.

``sdpa`` is the XLA path: a fused-by-XLA softmax(QK^T)V with f32 accumulation
on the MXU (parity with torch F.scaled_dot_product_attention, reference
transformer.py:243,306 and hieradet.py:70-74). Kernel coverage in this stack:
the Hiera windowed/global attention and the SAM two-way decoder use ``sdpa``
(small windows of 49-196 tokens / <=600-token sequences that XLA already
tiles onto the MXU well — measured MFU in docs/DESIGN.md); the long-sequence
memory CROSS-attention (576-2304 queries x up to ~7.2k keys) routes through
the Pallas flash kernel in ``ops/flash_attention.py`` on real TPUs
(memory_attention.py `use_flash`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
         bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Scaled dot-product attention.

    q: [..., Lq, D], k: [..., Lk, D], v: [..., Lk, Dv]; bias broadcastable to
    [..., Lq, Lk] (additive, f32). Softmax in f32, output cast back to q.dtype.
    """
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    logits = jnp.einsum("...qd,...kd->...qk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("...qk,...kd->...qd", weights.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[..., L, H*D] -> [..., H, L, D]."""
    *lead, L, C = x.shape
    x = x.reshape(*lead, L, num_heads, C // num_heads)
    return jnp.swapaxes(x, -2, -3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[..., H, L, D] -> [..., L, H*D]."""
    x = jnp.swapaxes(x, -2, -3)
    *lead, L, H, D = x.shape
    return x.reshape(*lead, L, H * D)
