"""Composite-block numerical parity: torch mirrors written independently from
the published SAM2 architecture, fed with weights exported from our param
trees. Catches composition bugs (residual/norm ordering, PE placement) that
per-op tests cannot."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from sam2_video_tpu.models import mask_decoder as md
from sam2_video_tpu.models import memory_attention as ma
from sam2_video_tpu.ops.position_encoding import axial_rope_table


def t(x):
    """numpy/jax array -> torch f32; passes torch tensors (e.g. an
    autograd-tracked param tree, test_torch_parity_full.py) through."""
    if x is None or isinstance(x, torch.Tensor):
        return x
    return torch.from_numpy(np.asarray(x, np.float32))


def torch_linear(p, x):
    return F.linear(x, t(p["weight"]), t(p.get("bias")))


def torch_ln(p, x, eps=1e-5):
    return F.layer_norm(x, (x.shape[-1],), t(p["weight"]), t(p["bias"]), eps)


def torch_attn(p, q, k, v, heads):
    q = torch_linear(p["q_proj"], q)
    k = torch_linear(p["k_proj"], k)
    v = torch_linear(p["v_proj"], v)

    def split(x):
        b, n, c = x.shape
        return x.reshape(b, n, heads, c // heads).transpose(1, 2)

    o = F.scaled_dot_product_attention(split(q), split(k), split(v))
    b, h, n, d = o.shape
    o = o.transpose(1, 2).reshape(b, n, h * d)
    return torch_linear(p["out_proj"], o)


def test_twoway_transformer_parity(rng):
    cfg = md.MaskDecoderConfig(transformer_dim=64, transformer_mlp_dim=128,
                               transformer_num_heads=4)
    p = md._transformer_init(jax.random.PRNGKey(0), cfg)
    B, N, HW = 2, 6, 16
    img = rng.standard_normal((B, HW, 64)).astype(np.float32)
    img_pe = rng.standard_normal((B, HW, 64)).astype(np.float32)
    tok = rng.standard_normal((B, N, 64)).astype(np.float32)

    got_q, got_k = md._transformer(p, cfg, jnp.asarray(img),
                                   jnp.asarray(img_pe), jnp.asarray(tok))

    # independent torch mirror of the two-way decoder
    queries, keys = t(tok), t(img)
    qpe, kpe = t(tok), t(img_pe)
    for i in range(cfg.transformer_depth):
        lp = p["layers"][str(i)]
        if i == 0:
            queries = torch_attn(lp["self_attn"], queries, queries, queries,
                                 cfg.transformer_num_heads)
        else:
            q = queries + qpe
            queries = queries + torch_attn(lp["self_attn"], q, q, queries,
                                           cfg.transformer_num_heads)
        queries = torch_ln(lp["norm1"], queries)
        q = queries + qpe
        k = keys + kpe
        queries = queries + torch_attn(lp["cross_attn_token_to_image"], q, k,
                                       keys, cfg.transformer_num_heads)
        queries = torch_ln(lp["norm2"], queries)
        h = F.relu(torch_linear(lp["mlp"]["layers"]["0"], queries))
        queries = queries + torch_linear(lp["mlp"]["layers"]["1"], h)
        queries = torch_ln(lp["norm3"], queries)
        q = queries + qpe
        k = keys + kpe
        keys = keys + torch_attn(lp["cross_attn_image_to_token"], k, q,
                                 queries, cfg.transformer_num_heads)
        keys = torch_ln(lp["norm4"], keys)
    q = queries + qpe
    k = keys + kpe
    queries = queries + torch_attn(p["final_attn_token_to_image"], q, k, keys,
                                   cfg.transformer_num_heads)
    queries = torch_ln(p["norm_final_attn"], queries)

    np.testing.assert_allclose(np.asarray(got_q), queries.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_k), keys.numpy(), atol=2e-4)


def test_memory_attention_layer_parity(rng):
    """One memory-attention layer (self RoPE + cross RoPE-with-repeat + FFN)
    vs a torch mirror using complex-number rotation."""
    cfg = ma.MemoryAttentionConfig(d_model=64, num_layers=1,
                                   dim_feedforward=128, num_heads=1,
                                   kv_in_dim=32, use_flash=False)
    p = ma.init(jax.random.PRNGKey(1), cfg)
    H = W = 4
    Lq = H * W
    reps = 3
    Lk_spatial = reps * Lq
    Lk = Lk_spatial + 8  # + pointer tokens excluded from rope
    B = 2
    curr = rng.standard_normal((B, Lq, 64)).astype(np.float32)
    mem = rng.standard_normal((B, Lk, 32)).astype(np.float32)
    curr_pos = rng.standard_normal((B, Lq, 64)).astype(np.float32)
    mem_pos = rng.standard_normal((B, Lk, 32)).astype(np.float32)

    got = ma.apply(p, cfg, jnp.asarray(curr), jnp.asarray(mem),
                   jnp.asarray(curr_pos), jnp.asarray(mem_pos),
                   feat_hw=(H, W), num_spatial_k=Lk_spatial, key_valid=None)

    # torch mirror
    def rope_torch(x, ex, ey, theta=10000.0, repeat=1):
        d = x.shape[-1]
        freqs = 1.0 / (theta ** (torch.arange(0, d, 4)[: d // 4].float() / d))
        idx = torch.arange(ex * ey, dtype=torch.float32)
        tx, ty = idx % ex, torch.div(idx, ex, rounding_mode="floor").float()
        cis = torch.cat([torch.polar(torch.ones(ex * ey, d // 4),
                                     torch.outer(tx, freqs)),
                         torch.polar(torch.ones(ex * ey, d // 4),
                                     torch.outer(ty, freqs))], dim=-1)
        if repeat > 1:
            cis = cis.repeat(repeat, 1)
        xc = torch.view_as_complex(x.reshape(*x.shape[:-1], -1, 2))
        return torch.view_as_real(xc * cis).flatten(-2)

    lp = p["layers"]["0"]
    out = t(curr) + 0.1 * t(curr_pos)
    # self-attn (pos_enc_at_attn=False)
    tgt2 = torch_ln(lp["norm1"], out)
    ap = lp["self_attn"]
    q = rope_torch(torch_linear(ap["q_proj"], tgt2), W, H)
    k = rope_torch(torch_linear(ap["k_proj"], tgt2), W, H)
    v = torch_linear(ap["v_proj"], tgt2)
    a = F.scaled_dot_product_attention(q[:, None], k[:, None], v[:, None]
                                       )[:, 0]
    out = out + torch_linear(ap["out_proj"], a)
    # cross-attn: q rope; spatial k rope (tiled); keys get mem pos enc
    tgt2 = torch_ln(lp["norm2"], out)
    ap = lp["cross_attn_image"]
    q = rope_torch(torch_linear(ap["q_proj"], tgt2), W, H)
    k_in = t(mem) + t(mem_pos)
    k = torch_linear(ap["k_proj"], k_in)
    k_sp = rope_torch(k[:, :Lk_spatial], W, H, repeat=reps)
    k = torch.cat([k_sp, k[:, Lk_spatial:]], dim=1)
    v = torch_linear(ap["v_proj"], t(mem))
    a = F.scaled_dot_product_attention(q[:, None], k[:, None], v[:, None]
                                       )[:, 0]
    out = out + torch_linear(ap["out_proj"], a)
    # FFN
    tgt2 = torch_ln(lp["norm3"], out)
    out = out + torch_linear(lp["linear2"],
                             F.relu(torch_linear(lp["linear1"], tgt2)))
    out = torch_ln(p["norm"], out)

    np.testing.assert_allclose(np.asarray(got), out.numpy(), atol=3e-4)
