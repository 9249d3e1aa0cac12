"""Two-way-transformer mask decoder (SAM head).

Parity spec: /root/reference/sam2_video/model/modeling/sam/transformer.py
(TwoWayTransformer:19-109, TwoWayAttentionBlock:112-187, Attention:190-248)
and sam/mask_decoder.py (MaskDecoder:15-295). Output-token order is
[obj_score | iou | 4 mask tokens]; upscaling fuses the stride-4/stride-8
high-res skip features; hypernetwork MLPs produce per-token mask kernels that
contract against the upscaled embedding on the MXU.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops import common as nn
from ..ops.attention import merge_heads, sdpa, split_heads


@dataclasses.dataclass(frozen=True)
class MaskDecoderConfig:
    transformer_dim: int = 256
    transformer_depth: int = 2
    transformer_mlp_dim: int = 2048
    transformer_num_heads: int = 8
    attention_downsample_rate: int = 2
    # Route the two-way blocks through the fused Pallas kernels
    # (ops/twoway_kernel.py). MEASURED AND REJECTED for training (round 5):
    # the kernels cost 27.5 ms/step vs ~7 ms for the XLA band they replace
    # (headline 22.6 -> 18.0 clips/s) — the decoder's math is tiny and the
    # in-kernel recompute + per-head small dots lose to XLA's pipelined
    # fusions. Kept for latency-bound eval experiments (per-frame dispatch
    # count matters more than math there). docs/DESIGN.md §4d.
    fused_twoway: bool = False
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    use_high_res_features: bool = True
    iou_prediction_use_sigmoid: bool = True
    pred_obj_scores: bool = True
    pred_obj_scores_mlp: bool = True
    use_multimask_token_for_obj_ptr: bool = False
    dynamic_multimask_via_stability: bool = True
    dynamic_multimask_stability_delta: float = 0.05
    dynamic_multimask_stability_thresh: float = 0.98

    @property
    def num_mask_tokens(self) -> int:
        return self.num_multimask_outputs + 1


# ---------------------------------------------------------------------------
# Attention (with internal-dim downsampling)
# ---------------------------------------------------------------------------


def _attn_init(key, embed_dim, num_heads, downsample_rate=1, kv_in_dim=None):
    kv_in_dim = kv_in_dim if kv_in_dim is not None else embed_dim
    internal = embed_dim // downsample_rate
    ks = jax.random.split(key, 4)
    return {
        "q_proj": nn.linear_init(ks[0], embed_dim, internal),
        "k_proj": nn.linear_init(ks[1], kv_in_dim, internal),
        "v_proj": nn.linear_init(ks[2], kv_in_dim, internal),
        "out_proj": nn.linear_init(ks[3], internal, embed_dim),
    }


def _attn(p, q, k, v, num_heads: int):
    q = split_heads(nn.linear(p["q_proj"], q), num_heads)
    k = split_heads(nn.linear(p["k_proj"], k), num_heads)
    v = split_heads(nn.linear(p["v_proj"], v), num_heads)
    out = merge_heads(sdpa(q, k, v))
    return nn.linear(p["out_proj"], out)


# ---------------------------------------------------------------------------
# Two-way transformer
# ---------------------------------------------------------------------------


def _twoway_block_init(key, cfg: MaskDecoderConfig):
    d, h, r = cfg.transformer_dim, cfg.transformer_num_heads, cfg.attention_downsample_rate
    ks = jax.random.split(key, 5)
    return {
        "self_attn": _attn_init(ks[0], d, h),
        "norm1": nn.layer_norm_init(d),
        "cross_attn_token_to_image": _attn_init(ks[1], d, h, r),
        "norm2": nn.layer_norm_init(d),
        "mlp": nn.mlp_init(ks[2], d, cfg.transformer_mlp_dim, d, 2),
        "norm3": nn.layer_norm_init(d),
        "norm4": nn.layer_norm_init(d),
        "cross_attn_image_to_token": _attn_init(ks[3], d, h, r),
    }


def _twoway_block(p, queries, keys, query_pe, key_pe, num_heads, skip_first_pe):
    if skip_first_pe:
        # first layer: attention output *replaces* queries (no residual),
        # matching transformer.py:160-161
        queries = _attn(p["self_attn"], queries, queries, queries, num_heads)
    else:
        q = queries + query_pe
        queries = queries + _attn(p["self_attn"], q, q, queries, num_heads)
    queries = nn.layer_norm(p["norm1"], queries)

    q = queries + query_pe
    k = keys + key_pe
    queries = queries + _attn(p["cross_attn_token_to_image"], q, k, keys,
                              num_heads)
    queries = nn.layer_norm(p["norm2"], queries)

    queries = queries + nn.mlp(p["mlp"], queries, activation="relu")
    queries = nn.layer_norm(p["norm3"], queries)

    q = queries + query_pe
    k = keys + key_pe
    keys = keys + _attn(p["cross_attn_image_to_token"], k, q, queries,
                        num_heads)
    keys = nn.layer_norm(p["norm4"], keys)
    return queries, keys


def _transformer_init(key, cfg: MaskDecoderConfig):
    ks = jax.random.split(key, cfg.transformer_depth + 1)
    return {
        "layers": {str(i): _twoway_block_init(ks[i], cfg)
                   for i in range(cfg.transformer_depth)},
        "final_attn_token_to_image": _attn_init(
            ks[-1], cfg.transformer_dim, cfg.transformer_num_heads,
            cfg.attention_downsample_rate),
        "norm_final_attn": nn.layer_norm_init(cfg.transformer_dim),
    }


def _transformer(p, cfg, image_embedding, image_pe_2d, point_embedding):
    """image_embedding: [B, HW, C]; image_pe_2d: [HW, C] (shared across the
    object batch); point_embedding: [B, N, C]."""
    B, HW, C = image_embedding.shape
    N = point_embedding.shape[1]
    queries, keys = point_embedding, image_embedding

    fused = _transformer_blocks_fused(p, cfg, queries, keys, image_pe_2d)
    if fused is not None:
        queries, keys = fused
    else:
        image_pe = jnp.broadcast_to(image_pe_2d[None], (B, HW, C))
        for i in range(cfg.transformer_depth):
            queries, keys = _twoway_block(
                p["layers"][str(i)], queries, keys, point_embedding,
                image_pe, cfg.transformer_num_heads, skip_first_pe=(i == 0))

    q = queries + point_embedding
    k = keys + image_pe_2d[None]
    queries = queries + _attn(p["final_attn_token_to_image"], q, k, keys,
                              cfg.transformer_num_heads)
    queries = nn.layer_norm(p["norm_final_attn"], queries)
    return queries, keys


def _transformer_blocks_fused(p, cfg, queries, keys, image_pe_2d):
    """Fused two-way blocks (ops/twoway_kernel.py): each block runs as one
    VMEM-resident Pallas program over ALL objects (dense object-block-
    masked attention), replacing the ~13 ms/step band of sub-0.5 ms XLA
    fusions the per-frame SAM head lowered to (round-5 profiling). Returns
    None when ineligible — the caller takes the XLA path; results are
    equivalent up to f32 reassociation (tests/test_twoway_fused.py)."""
    from ..ops import twoway_kernel as twk

    B, HW, C = keys.shape
    N = queries.shape[1]
    if not cfg.fused_twoway or not twk.fused_twoway_eligible(cfg, B, N, HW):
        return None
    q4 = queries[None]
    k4 = keys[None]
    qpe4 = queries[None]  # the pe re-added at every stage IS the tokens
    kpe = image_pe_2d.astype(keys.dtype)
    for i in range(cfg.transformer_depth):
        q4, k4 = twk.fused_twoway_block(
            p["layers"][str(i)], q4, k4, qpe4, kpe, first=(i == 0),
            heads=cfg.transformer_num_heads)
    return q4[0], k4[0]


# ---------------------------------------------------------------------------
# Mask decoder
# ---------------------------------------------------------------------------


def init(key, cfg: MaskDecoderConfig):
    d = cfg.transformer_dim
    ks = jax.random.split(key, 12)
    p = {
        "transformer": _transformer_init(ks[0], cfg),
        "iou_token": nn.embedding_init(ks[1], 1, d),
        "mask_tokens": nn.embedding_init(ks[2], cfg.num_mask_tokens, d),
        "output_upscaling": {
            "0": nn.conv_transpose2d_init(ks[3], d, d // 4, 2),
            "1": nn.layer_norm_init(d // 4),
            "3": nn.conv_transpose2d_init(ks[4], d // 4, d // 8, 2),
        },
        "output_hypernetworks_mlps": {
            str(i): nn.mlp_init(jax.random.fold_in(ks[5], i), d, d, d // 8, 3)
            for i in range(cfg.num_mask_tokens)
        },
        "iou_prediction_head": nn.mlp_init(
            ks[6], d, cfg.iou_head_hidden_dim, cfg.num_mask_tokens,
            cfg.iou_head_depth),
    }
    if cfg.pred_obj_scores:
        p["obj_score_token"] = nn.embedding_init(ks[7], 1, d)
        if cfg.pred_obj_scores_mlp:
            p["pred_obj_score_head"] = nn.mlp_init(ks[8], d, d, 1, 3)
        else:
            p["pred_obj_score_head"] = nn.linear_init(ks[8], d, 1)
    if cfg.use_high_res_features:
        p["conv_s0"] = nn.conv2d_init(ks[9], d, d // 8, 1)
        p["conv_s1"] = nn.conv2d_init(ks[10], d, d // 4, 1)
    return p


def predict_masks(p, cfg: MaskDecoderConfig, image_embeddings, image_pe,
                  sparse_prompt_embeddings, dense_prompt_embeddings,
                  high_res_features=None):
    """All spatial tensors NHWC.

    image_embeddings: [B, H, W, C]; image_pe: [H, W, C];
    sparse: [B, N, C]; dense: [B, H, W, C];
    high_res_features: ([B, 4H, 4W, C/8], [B, 2H, 2W, C/4]) ALREADY projected
    by conv_s0/conv_s1 (the reference precomputes those in forward_image,
    sam2_base.py:497-506 — we follow the same split; see sam2.py).

    Returns (masks [B, M, 4H, 4W], iou_pred [B, M], mask_tokens_out [B, M, C],
    object_score_logits [B, 1]).
    """
    B = sparse_prompt_embeddings.shape[0]
    s = 1 if cfg.pred_obj_scores else 0
    toks = [p["iou_token"]["weight"], p["mask_tokens"]["weight"]]
    if cfg.pred_obj_scores:
        toks.insert(0, p["obj_score_token"]["weight"])
    output_tokens = jnp.concatenate(toks, axis=0)
    output_tokens = jnp.broadcast_to(
        output_tokens[None], (B, *output_tokens.shape))
    tokens = jnp.concatenate(
        [output_tokens.astype(sparse_prompt_embeddings.dtype),
         sparse_prompt_embeddings], axis=1)

    Bi, H, W, C = image_embeddings.shape
    src = image_embeddings + dense_prompt_embeddings
    src = src.reshape(B, H * W, C)
    pe_2d = image_pe.reshape(H * W, C).astype(src.dtype)

    hs, src = _transformer(p["transformer"], cfg, src, pe_2d, tokens)
    iou_token_out = hs[:, s]
    mask_tokens_out = hs[:, s + 1: s + 1 + cfg.num_mask_tokens]

    src = src.reshape(B, H, W, C)
    up = p["output_upscaling"]
    dc1 = nn.conv_transpose2d(up["0"], src, stride=2)
    if cfg.use_high_res_features:
        feat_s0, feat_s1 = high_res_features
        x = nn.gelu(nn.layer_norm_2d(up["1"], dc1 + feat_s1))
        upscaled = nn.gelu(nn.conv_transpose2d(up["3"], x, stride=2) + feat_s0)
    else:
        x = nn.gelu(nn.layer_norm_2d(up["1"], dc1))
        upscaled = nn.gelu(nn.conv_transpose2d(up["3"], x, stride=2))

    hyper_in = jnp.stack(
        [nn.mlp(p["output_hypernetworks_mlps"][str(i)],
                mask_tokens_out[:, i], activation="relu")
         for i in range(cfg.num_mask_tokens)], axis=1)  # [B, M, C/8]
    b, h4, w4, c8 = upscaled.shape
    masks = jnp.einsum("bmc,bhwc->bmhw", hyper_in, upscaled,
                       preferred_element_type=jnp.float32).astype(hyper_in.dtype)

    iou_pred = nn.mlp(p["iou_prediction_head"], iou_token_out,
                      activation="relu",
                      sigmoid_output=cfg.iou_prediction_use_sigmoid)
    if cfg.pred_obj_scores:
        if cfg.pred_obj_scores_mlp:
            object_score_logits = nn.mlp(p["pred_obj_score_head"], hs[:, 0],
                                         activation="relu")
        else:
            object_score_logits = nn.linear(p["pred_obj_score_head"], hs[:, 0])
    else:
        object_score_logits = 10.0 * jnp.ones((B, 1), iou_pred.dtype)
    return masks, iou_pred, mask_tokens_out, object_score_logits


def _stability_scores(cfg, mask_logits):
    flat = mask_logits.reshape(*mask_logits.shape[:-2], -1)
    d = cfg.dynamic_multimask_stability_delta
    area_i = jnp.sum(flat > d, axis=-1).astype(jnp.float32)
    area_u = jnp.sum(flat > -d, axis=-1).astype(jnp.float32)
    return jnp.where(area_u > 0, area_i / area_u, 1.0)


def _dynamic_multimask_via_stability(cfg, all_mask_logits, all_iou_scores):
    """Eval-time fallback from the single-mask token to the best multimask
    token when stability is low (mask_decoder.py:259-295)."""
    multimask_logits = all_mask_logits[:, 1:]
    multimask_iou = all_iou_scores[:, 1:]
    best = jnp.argmax(multimask_iou, axis=-1)
    bi = jnp.arange(all_mask_logits.shape[0])
    best_logits = multimask_logits[bi, best][:, None]
    best_iou = multimask_iou[bi, best][:, None]
    single_logits = all_mask_logits[:, 0:1]
    single_iou = all_iou_scores[:, 0:1]
    stable = _stability_scores(cfg, single_logits) >= \
        cfg.dynamic_multimask_stability_thresh
    out_logits = jnp.where(stable[..., None, None], single_logits, best_logits)
    out_iou = jnp.where(stable, single_iou, best_iou)
    return out_logits, out_iou


def apply(p, cfg: MaskDecoderConfig, image_embeddings, image_pe,
          sparse_prompt_embeddings, dense_prompt_embeddings,
          multimask_output: bool, high_res_features=None,
          training: bool = True):
    """Full decoder forward (mask_decoder.py:110-166).

    Returns (masks [B, M, 4H, 4W], iou_pred [B, M], sam_tokens_out [B, 1|3, C],
    object_score_logits [B, 1]) where M = 3 if multimask else 1."""
    masks, iou_pred, mask_tokens_out, object_score_logits = predict_masks(
        p, cfg, image_embeddings, image_pe, sparse_prompt_embeddings,
        dense_prompt_embeddings, high_res_features)

    if multimask_output:
        masks = masks[:, 1:]
        iou_pred = iou_pred[:, 1:]
    elif cfg.dynamic_multimask_via_stability and not training:
        masks, iou_pred = _dynamic_multimask_via_stability(cfg, masks, iou_pred)
    else:
        masks = masks[:, 0:1]
        iou_pred = iou_pred[:, 0:1]

    if multimask_output and cfg.use_multimask_token_for_obj_ptr:
        sam_tokens_out = mask_tokens_out[:, 1:]
    else:
        sam_tokens_out = mask_tokens_out[:, 0:1]
    return masks, iou_pred, sam_tokens_out, object_score_logits
