"""Image/feature resizing with torch-parity semantics.

- ``resize_bilinear``: half-pixel bilinear; jax.image.resize('linear') matches
  torch F.interpolate(mode='bilinear', align_corners=False, antialias=True)
  for downsampling (jax always antialiases when shrinking) and plain bilinear
  for upsampling. Used for mask-logit up/downsampling
  (reference sam2_base.py:394-399, 445-451).
- ``resize_nearest``: integer-factor duplication / striding; identical to
  torch 'nearest' for the exact-2x FPN top-down path (image_encoder.py:116).
- ``bicubic_matrix`` + ``resize_bicubic_torch``: *exact* torch bicubic
  (a=-0.75, align_corners=False) as two static interpolation matmuls, used for
  the Hiera background pos-embed interpolation (hieradet.py:276) where
  jax.image's Keys kernel (a=-0.5) would drift from the pretrained weights.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """x: [..., H, W] -> [..., h, w] (channel dims lead)."""
    out_shape = x.shape[:-2] + tuple(out_hw)
    return jax.image.resize(x.astype(jnp.float32), out_shape, method="linear"
                            ).astype(x.dtype)


def resize_nearest(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    out_shape = x.shape[:-2] + tuple(out_hw)
    return jax.image.resize(x, out_shape, method="nearest")


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    at = np.abs(t)
    return np.where(
        at <= 1.0, (a + 2) * at**3 - (a + 3) * at**2 + 1,
        np.where(at < 2.0, a * at**3 - 5 * a * at**2 + 8 * a * at - 4 * a, 0.0),
    )


@lru_cache(maxsize=32)
def bicubic_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out_size, in_size] torch-bicubic interpolation matrix (align_corners
    False, border replication). Rows sum to 1."""
    scale = in_size / out_size
    m = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        fs = int(np.floor(src))
        for j in range(fs - 1, fs + 3):
            w = _cubic_kernel(src - j)
            m[i, min(max(j, 0), in_size - 1)] += w
    return m


def resize_bicubic_torch(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """x: [..., H, W, C] -> [..., h, w, C], exact torch bicubic semantics."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    my = jnp.asarray(bicubic_matrix(h, oh))
    mx = jnp.asarray(bicubic_matrix(w, ow))
    y = jnp.einsum("oh,...hwc->...owc", my, x.astype(jnp.float32))
    y = jnp.einsum("pw,...owc->...opc", mx, y)
    return y.astype(x.dtype)
