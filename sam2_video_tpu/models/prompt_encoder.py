"""SAM prompt encoder: sparse (point/box) and dense (mask) prompt embeddings.

Parity spec: /root/reference/sam2_video/model/modeling/sam/prompt_encoder.py
(PromptEncoder:17-202). TPU-first difference: point labels select their type
embedding with one gather over a stacked [6, C] table instead of five chained
torch.where — a single VPU select. Labels: -1 pad, 0 neg, 1 pos, 2/3 box
corners. Boxes are expressed as two labeled corner points (the reference
training path does the same, utils/prompts.py:78-97), so ``embed_points``
covers all sparse prompts and shapes stay static.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops import common as nn
from ..ops.position_encoding import random_pe_coords, random_pe_grid, random_pe_init


@dataclasses.dataclass(frozen=True)
class PromptEncoderConfig:
    embed_dim: int = 256
    image_embedding_size: tuple = (24, 24)
    input_image_size: tuple = (384, 384)
    mask_in_chans: int = 16


def init(key, cfg: PromptEncoderConfig):
    ks = jax.random.split(key, 10)
    c = cfg.mask_in_chans
    return {
        "pe_layer": random_pe_init(ks[0], cfg.embed_dim // 2),
        "point_embeddings": {
            str(i): nn.embedding_init(ks[1 + i], 1, cfg.embed_dim)
            for i in range(4)
        },
        "not_a_point_embed": nn.embedding_init(ks[5], 1, cfg.embed_dim),
        "no_mask_embed": nn.embedding_init(ks[6], 1, cfg.embed_dim),
        "mask_downscaling": {
            "0": nn.conv2d_init(ks[7], 1, c // 4, 2),
            "1": nn.layer_norm_init(c // 4),
            "3": nn.conv2d_init(ks[8], c // 4, c, 2),
            "4": nn.layer_norm_init(c),
            "6": nn.conv2d_init(ks[9], c, cfg.embed_dim, 1),
        },
    }


def get_dense_pe(p, cfg: PromptEncoderConfig) -> jnp.ndarray:
    """[H, W, C] positional encoding over the image-embedding grid."""
    h, w = cfg.image_embedding_size
    return random_pe_grid(p["pe_layer"], h, w)


def embed_points(p, cfg: PromptEncoderConfig, coords, labels, pad: bool = True):
    """coords: [B, P, 2] pixel (x, y); labels: [B, P] in {-1, 0, 1, 2, 3}.

    Returns sparse embeddings [B, P(+1), C]. When ``pad`` is True a single
    padding point (label -1) is appended — the reference does this whenever no
    box prompt accompanies the points (prompt_encoder.py:87-91).
    """
    coords = coords.astype(jnp.float32) + 0.5  # center of pixel
    if pad:
        B = coords.shape[0]
        coords = jnp.concatenate(
            [coords, jnp.zeros((B, 1, 2), coords.dtype)], axis=1)
        labels = jnp.concatenate(
            [labels, -jnp.ones((B, 1), labels.dtype)], axis=1)
    pe = random_pe_coords(p["pe_layer"], coords, cfg.input_image_size)
    # label -1 -> not_a_point (replaces PE); labels 0..3 -> PE + type embed
    type_table = jnp.concatenate(
        [p["not_a_point_embed"]["weight"]] +
        [p["point_embeddings"][str(i)]["weight"] for i in range(4)], axis=0)
    idx = labels.astype(jnp.int32) + 1  # [-1..3] -> [0..4]
    type_emb = type_table[idx]  # [B, P, C]
    is_pad = (labels == -1)[..., None]
    return jnp.where(is_pad, type_emb, pe + type_emb)


def embed_masks(p, masks: jnp.ndarray) -> jnp.ndarray:
    """masks: [B, 4*H16, 4*W16, 1] (stride-4 resolution) -> dense embeddings
    [B, H16, W16, C]."""
    md = p["mask_downscaling"]
    x = nn.conv2d(md["0"], masks, stride=2)
    x = nn.layer_norm_2d(md["1"], x)
    x = nn.gelu(x)
    x = nn.conv2d(md["3"], x, stride=2)
    x = nn.layer_norm_2d(md["4"], x)
    x = nn.gelu(x)
    return nn.conv2d(md["6"], x)


def no_mask_dense(p, cfg: PromptEncoderConfig, batch: int) -> jnp.ndarray:
    h, w = cfg.image_embedding_size
    e = p["no_mask_embed"]["weight"].reshape(1, 1, 1, -1)
    return jnp.broadcast_to(e, (batch, h, w, cfg.embed_dim))
