"""Memory attention: conditions the current frame's features on the memory
bank (spatial memories + object-pointer tokens) with RoPE attention.

Parity spec: /root/reference/sam2_video/model/modeling/memory_attention.py
(MemoryAttentionLayer:17-99, MemoryAttention:102-169) and sam/transformer.py
RoPEAttention:251-311. TPU-first differences:

- The memory sequence is a *fixed-shape* concatenation of ``num_maskmem``
  spatial-memory slots plus a fixed number of object-pointer tokens; invalid
  slots are removed from attention by an additive f32 bias instead of a
  dynamic concat (static shapes are mandatory under ``lax.scan``/jit).
- RoPE tables are tiled per spatial slot (``rope_k_repeat``); pointer tokens
  are excluded from rotation (``num_k_exclude_rope``) simply by rotating only
  the leading spatial block — possible because the layout is static.
- All attention runs batched over objects on the MXU with f32 softmax.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

import numpy as np

from ..ops import common as nn
from ..ops.attention import merge_heads, sdpa, split_heads
from ..ops.position_encoding import (apply_rope_half, axial_rope_table_half,
                                     deinterleave_perm)


@dataclasses.dataclass(frozen=True)
class MemoryAttentionConfig:
    d_model: int = 256
    num_layers: int = 4
    dim_feedforward: int = 2048
    num_heads: int = 1
    kv_in_dim: int = 64
    rope_theta: float = 10000.0
    pos_enc_at_input: bool = True
    pos_enc_at_attn: bool = False
    pos_enc_at_cross_attn_keys: bool = True
    pos_enc_at_cross_attn_queries: bool = False
    activation: str = "relu"
    # route the big cross-attention (576 q x ~4k keys) through the Pallas
    # flash kernel on TPU (ops/flash_attention.py); XLA sdpa otherwise
    use_flash: bool = True


def _rope_attn_init(key, embed_dim, num_heads, kv_in_dim=None):
    kv = kv_in_dim if kv_in_dim is not None else embed_dim
    ks = jax.random.split(key, 4)
    return {
        "q_proj": nn.linear_init(ks[0], embed_dim, embed_dim),
        "k_proj": nn.linear_init(ks[1], kv, embed_dim),
        "v_proj": nn.linear_init(ks[2], kv, embed_dim),
        "out_proj": nn.linear_init(ks[3], embed_dim, embed_dim),
    }


def _layer_init(key, cfg: MemoryAttentionConfig):
    ks = jax.random.split(key, 4)
    return {
        "self_attn": _rope_attn_init(ks[0], cfg.d_model, cfg.num_heads),
        "cross_attn_image": _rope_attn_init(ks[1], cfg.d_model, cfg.num_heads,
                                            cfg.kv_in_dim),
        "linear1": nn.linear_init(ks[2], cfg.d_model, cfg.dim_feedforward),
        "linear2": nn.linear_init(ks[3], cfg.dim_feedforward, cfg.d_model),
        "norm1": nn.layer_norm_init(cfg.d_model),
        "norm2": nn.layer_norm_init(cfg.d_model),
        "norm3": nn.layer_norm_init(cfg.d_model),
    }


def init(key, cfg: MemoryAttentionConfig):
    ks = jax.random.split(key, cfg.num_layers + 1)
    return {
        "layers": {str(i): _layer_init(ks[i], cfg)
                   for i in range(cfg.num_layers)},
        "norm": nn.layer_norm_init(cfg.d_model),
    }


def _perm_rows(p, perm):
    """Fold the de-interleave permutation into a projection's out rows —
    q·kᵀ is invariant to a shared permutation of q and k features, so the
    rotated layout costs nothing at apply time (see position_encoding.py)."""
    out = {"weight": p["weight"][perm]}
    if "bias" in p:
        out["bias"] = p["bias"][perm]
    return out


def prepare(p, cfg: MemoryAttentionConfig):
    """Pre-apply the de-interleave row permutation to every q/k projection,
    ONCE per forward. Under the fully-unrolled frame scan each trace of the
    body re-emitted the [d_model, d_model] weight gathers and — worse — the
    autodiff transpose emitted one scatter per frame per projection in the
    backward (~1 ms/step measured round 3). Hoisting the permuted views above
    the scan leaves a single gather/scatter pair per projection per step.
    The permuted entries ride under ``_qp``/``_kp`` keys; apply() falls back
    to permuting in place when they are absent (eval paths)."""
    perm = deinterleave_perm(cfg.d_model, cfg.num_heads)
    layers = {}
    for i, lp in p["layers"].items():
        lp = dict(lp)
        lp["self_attn"] = {
            **lp["self_attn"],
            "_qp": _perm_rows(lp["self_attn"]["q_proj"], perm),
            "_kp": _perm_rows(lp["self_attn"]["k_proj"], perm),
        }
        lp["cross_attn_image"] = {
            **lp["cross_attn_image"],
            "_qp": _perm_rows(lp["cross_attn_image"]["q_proj"], perm),
            "_kp": _perm_rows(lp["cross_attn_image"]["k_proj"], perm),
        }
        layers[i] = lp
    return {**p, "layers": layers}


def _permed(ap, key, perm):
    """Permuted view of projection ``key`` ('q_proj'/'k_proj'): the
    prepare()-hoisted entry when present, else permute here."""
    cached = ap.get("_qp" if key == "q_proj" else "_kp")
    return cached if cached is not None else _perm_rows(ap[key], perm)


def _self_attn(p, cfg, tgt, query_pos, rope_q, perm):
    """Self-attention with RoPE on both q and k (RoPEAttention, q==k length).

    The single-head case skips the head split/merge entirely — the swapaxes
    in split_heads lowered to a real [O, 1, L, D] layout copy per frame per
    layer (+0.6% step throughput, measured round 3). A merged-QKV single
    projection and routing this block through the flash kernel were both
    A/B-measured and LOSE at these shapes (576 q/k tokens, d=256): XLA's
    three-dot fusion beats one wide dot + split, and the [576, 576] logits
    fit VMEM so flash only adds custom-call overhead."""
    tgt2 = nn.layer_norm(p["norm1"], tgt)
    ap = p["self_attn"]
    qk_in = tgt2 + query_pos if cfg.pos_enc_at_attn else tgt2
    q = nn.linear(_permed(ap, "q_proj", perm), qk_in)
    k = nn.linear(_permed(ap, "k_proj", perm), qk_in)
    v = nn.linear(ap["v_proj"], tgt2)
    if cfg.num_heads > 1:
        q, k, v = (split_heads(x, cfg.num_heads) for x in (q, k, v))
    cos, sin = rope_q
    q = apply_rope_half(q, cos, sin)
    k = apply_rope_half(k, cos, sin)
    out = sdpa(q, k, v)
    if cfg.num_heads > 1:
        out = merge_heads(out)
    out = nn.linear(ap["out_proj"], out)
    return tgt + out


def _cross_attn(p, cfg, tgt, memory, query_pos, pos, rope_q, rope_k,
                num_spatial_k: int, key_valid, perm, feat_hw):
    """Cross-attention: q gets RoPE; the first ``num_spatial_k`` keys get the
    tiled RoPE; trailing (object-pointer) keys are left unrotated (they are
    still feature-permuted by ``perm`` like every key, which q·kᵀ cancels).
    Invalid memory slots are removed via an additive key bias; on TPU this
    runs through the Pallas flash kernel."""
    tgt2 = nn.layer_norm(p["norm2"], tgt)
    q_in = tgt2 + query_pos if cfg.pos_enc_at_cross_attn_queries else tgt2
    k_in = memory + pos if cfg.pos_enc_at_cross_attn_keys else memory
    ap = p["cross_attn_image"]
    # single-head: keep [*, Lq, D] — no head axis, no split/merge copies
    q = nn.linear(_permed(ap, "q_proj", perm), q_in)
    if cfg.num_heads > 1:
        q = split_heads(q, cfg.num_heads)

    if cfg.use_flash and cfg.num_heads == 1:
        # fused path: K never materializes — the Pallas kernel streams the
        # raw kv_in_dim k-input tokens and computes k = rope(k_in @ Wk + bk)
        # per block in VMEM; the v-projection commute (below) already streams
        # raw memories as v, so the whole cross-attention reads only 64-dim
        # token tensors from HBM (ops/flash_attention.py, round-3 profiling)
        from ..ops.flash_attention import (flash_attention_kproj,
                                           flash_kproj_eligible)
        q3 = apply_rope_half(q, *rope_q)
        if flash_kproj_eligible(q3, k_in, num_spatial_k, feat_hw):
            key_bias = (jnp.where(key_valid, 0.0, -1e9).astype(jnp.float32)
                        if key_valid is not None else None)
            kp = _permed(ap, "k_proj", perm)
            attn = flash_attention_kproj(
                q3, k_in, memory, kp["weight"], kp["bias"], key_bias,
                num_spatial_k, feat_hw,
                theta=cfg.rope_theta)[..., :cfg.kv_in_dim]
            attn = nn.linear(ap["v_proj"], attn)
            out = nn.linear(ap["out_proj"], attn)
            return tgt + out

    k = nn.linear(_permed(ap, "k_proj", perm), k_in)
    if cfg.num_heads > 1:
        k = split_heads(k, cfg.num_heads)
    # v-projection commute (single-head only): softmax rows sum to 1, so
    # P @ (m Wv + bv) == (P @ m) Wv + bv exactly. Attend against the RAW
    # kv_in_dim(=64) memories (zero-padded to the flash kernel's 128-lane
    # minimum) and run v_proj on the [Lq, 64] attention output instead of
    # the [Lk, 256] values: 2x less PV/dP compute, 4x less dV, and no
    # [Lk, d_model] V materialization in the scan's hottest block. With
    # multiple heads each head would need its own P @ m, erasing the win.
    commute_v = cfg.num_heads == 1
    if commute_v:
        v = memory                          # raw [B, Lk, kv_in_dim]
    else:
        v = split_heads(nn.linear(ap["v_proj"], memory), cfg.num_heads)
    q = apply_rope_half(q, *rope_q)
    k_spatial = apply_rope_half(k[..., :num_spatial_k, :], *rope_k)
    k = jnp.concatenate([k_spatial, k[..., num_spatial_k:, :]], axis=-2)
    key_bias = None
    if key_valid is not None:
        key_bias = jnp.where(key_valid, 0.0, -1e9).astype(jnp.float32)
    if cfg.use_flash:
        from ..ops.flash_attention import flash_attention
        if commute_v:
            # zero-pad v to the Pallas kernel's 128-lane minimum (pad
            # columns come back as exact zeros and are sliced off); the
            # sdpa fallback below skips the pad — it handles Dv=64 natively
            pad = (-cfg.kv_in_dim) % 128
            vk = (jnp.concatenate(
                [v, jnp.zeros(v.shape[:-1] + (pad,), v.dtype)], axis=-1)
                if pad else v)
            attn = flash_attention(q, k, vk, key_bias)[..., :cfg.kv_in_dim]
        else:
            attn = flash_attention(q, k, v, key_bias)
    else:
        if key_bias is not None:
            extra = q.ndim - 1 - key_bias.ndim
            bias = key_bias.reshape((1,) * extra + (1,) + key_bias.shape)
        else:
            bias = None
        attn = sdpa(q, k, v, bias)
    if cfg.num_heads > 1:
        attn = merge_heads(attn)
    if commute_v:
        attn = nn.linear(ap["v_proj"], attn)
    out = nn.linear(ap["out_proj"], attn)
    return tgt + out


def apply(p, cfg: MemoryAttentionConfig, curr, memory, curr_pos, memory_pos,
          feat_hw: tuple[int, int], num_spatial_k: int,
          key_valid: jnp.ndarray | None = None):
    """
    curr:       [B, Lq, d_model]   current-frame features (queries)
    memory:     [B, Lk, kv_in_dim] memory tokens (spatial slots then pointers)
    curr_pos:   [B or 1, Lq, d_model]
    memory_pos: [B or 1, Lk, kv_in_dim]
    feat_hw:    (H, W) of the query feature map; H*W == Lq
    num_spatial_k: leading key count that receives tiled RoPE
    key_valid:  [Lk] bool — False keys are masked out of attention
    """
    h, w = feat_hw
    assert h * w == curr.shape[-2]
    head_dim = cfg.d_model // cfg.num_heads
    rope_q = axial_rope_table_half(head_dim, w, h, cfg.rope_theta)
    reps = num_spatial_k // (h * w)
    assert reps * h * w == num_spatial_k
    rope_k = (jnp.tile(rope_q[0], (reps, 1)), jnp.tile(rope_q[1], (reps, 1)))
    perm = deinterleave_perm(cfg.d_model, cfg.num_heads)

    output = curr
    if cfg.pos_enc_at_input and curr_pos is not None:
        output = output + 0.1 * curr_pos

    fused = _fused_layers(p, cfg, output, memory, memory_pos, rope_q,
                          num_spatial_k, key_valid, perm, (w, h))
    if fused is not None:
        return fused

    act = {"relu": jax.nn.relu, "gelu": nn.gelu}[cfg.activation]
    for i in range(cfg.num_layers):
        lp = p["layers"][str(i)]
        output = _self_attn(lp, cfg, output, curr_pos, rope_q, perm)
        output = _cross_attn(lp, cfg, output, memory, curr_pos, memory_pos,
                             rope_q, rope_k, num_spatial_k, key_valid, perm,
                             (w, h))
        tgt2 = nn.layer_norm(lp["norm3"], output)
        tgt2 = nn.linear(lp["linear2"], act(nn.linear(lp["linear1"], tgt2)))
        output = output + tgt2
    return nn.layer_norm(p["norm"], output)


def _fused_layers(p, cfg, output, memory, memory_pos, rope_q,
                  num_spatial_k, key_valid, perm, grid_wh):
    """Fused per-layer path (ops/memattn_layer_kernel.py): each layer runs
    as self-attn kernel -> flash cross-attention (k-proj + RoPE fused,
    v-commuted) -> tail kernel, replacing ~25 XLA glue ops per layer per
    frame with two Pallas programs around the flash call. Returns None when
    any piece is ineligible (the caller then takes the XLA/flash path;
    results are equivalent up to f32 reassociation — tests/
    test_memattn_fused.py)."""
    from ..ops import memattn_layer_kernel as mlk
    from ..ops.flash_attention import (flash_attention_kproj,
                                       flash_kproj_eligible)

    L = output.shape[-2]
    if not (cfg.use_flash and mlk.fused_layer_eligible(cfg, L)):
        return None
    k_in = (memory + memory_pos if cfg.pos_enc_at_cross_attn_keys
            else memory)
    # eligibility probe with a representative rope'd-q shape
    if not flash_kproj_eligible(output, k_in, num_spatial_k, grid_wh):
        return None
    key_bias = (jnp.where(key_valid, 0.0, -1e9).astype(jnp.float32)
                if key_valid is not None else None)
    cos32 = rope_q[0].astype(jnp.float32)
    sin32 = rope_q[1].astype(jnp.float32)
    for i in range(cfg.num_layers):
        lp = p["layers"][str(i)]
        sp, cp = lp["self_attn"], lp["cross_attn_image"]
        p_self = {"q": _permed(sp, "q_proj", perm),
                  "k": _permed(sp, "k_proj", perm),
                  "v": sp["v_proj"], "out": sp["out_proj"]}
        output, q3 = mlk.fused_self_block(
            p_self, _permed(cp, "q_proj", perm), lp["norm1"], lp["norm2"],
            output, cos32, sin32)
        kp = _permed(cp, "k_proj", perm)
        attn = flash_attention_kproj(
            q3, k_in, memory, kp["weight"], kp["bias"], key_bias,
            num_spatial_k, grid_wh, theta=cfg.rope_theta)
        output = mlk.fused_tail_block(
            cp["v_proj"], cp["out_proj"], lp["norm3"], lp["linear1"],
            lp["linear2"], output, attn)
    return nn.layer_norm(p["norm"], output)
