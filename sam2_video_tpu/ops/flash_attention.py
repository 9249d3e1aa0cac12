"""Pallas TPU flash attention (forward + custom-VJP backward) for the
stack's hot attention shapes:

- memory attention cross-attn: Lq = 576 (24x24 feature grid), Lk = 4096
  (7 spatial memory slots x 576 + 16 pointers x 4 tokens) — exactly 8x512
  key blocks;
- Hiera global-attention blocks (Lq = Lk = H16*W16).

Design (cf. /opt/skills/guides/pallas_guide.md): grid over (batch*heads,
q blocks); keys/values stream through VMEM in ``block_k`` chunks with the
online-softmax running (m, l) rescale; optional additive key bias vector
(the memory-slot validity mask) folded into the logits. f32 accumulation,
bf16 or f32 I/O. Backward recomputes probabilities blockwise from the saved
logsumexp (no Lq x Lk materialization anywhere).

Falls back to the XLA path (ops.attention.sdpa) when shapes don't tile or
when running on CPU — ``attend`` picks automatically.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .attention import sdpa

_NEG_INF = -1e30

# set True in tests to run kernels in interpreter mode on CPU
INTERPRET = False


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *,
                block_k: int, scale: float):
    q = q_ref[0].astype(jnp.float32) * scale        # [bq, d]
    bq = q.shape[0]
    num_kb = k_ref.shape[1] // block_k

    def body(i, carry):
        acc, m_i, l_i = carry
        kb = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        vb = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s + bias_ref[0, pl.ds(i * block_k, block_k)][None, :]
        m_new = jnp.maximum(m_i, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = alpha * l_i + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    d = q_ref.shape[-1]
    dv = v_ref.shape[-1]
    acc0 = jnp.zeros((bq, dv), jnp.float32)
    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m_f, l_f = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0] = (acc / l_f).astype(o_ref.dtype)
    lse_ref[0] = (m_f + jnp.log(l_f))[:, 0]


def _flash_fwd(q, k, v, bias, block_q: int, block_k: int):
    BH, Lq, D = q.shape
    Lk = k.shape[1]
    Dv = v.shape[-1]
    scale = 1.0 / math.sqrt(D)
    grid = (BH, Lq // block_q)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, block_k=block_k, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Lk, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Lk, Dv), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Lk), lambda b, i: (b, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, Dv), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_q), lambda b, i: (b, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Lq, Dv), q.dtype),
            jax.ShapeDtypeStruct((BH, Lq), jnp.float32),
        ],
        interpret=INTERPRET,
    )(q, k, v, bias)
    return out, lse


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, *, block_k: int, scale: float):
    q = q_ref[0].astype(jnp.float32) * scale
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, None]
    delta = delta_ref[0][:, None]
    num_kb = k_ref.shape[1] // block_k

    def body(i, dq_acc):
        kb = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        vb = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s + bias_ref[0, pl.ds(i * block_k, block_k)][None, :]
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, vb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq_acc + jax.lax.dot_general(
            ds, kb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(
        0, num_kb, body, jnp.zeros_like(q, jnp.float32))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, block_q: int, scale: float):
    kb = k_ref[0].astype(jnp.float32)           # [bk, d]
    vb = v_ref[0].astype(jnp.float32)
    bias = bias_ref[0][None, :]                  # [1, bk]
    num_qb = q_ref.shape[1] // block_q

    def body(i, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32) \
            * scale
        do = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(i * block_q, block_q)][:, None]
        delta = delta_ref[0, pl.ds(i * block_q, block_q)][:, None]
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s + bias
        p = jnp.exp(s - lse)                     # [bq, bk]
        dv_acc = dv_acc + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, vb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk_acc, dv_acc

    dk0 = jnp.zeros(kb.shape, jnp.float32)
    dv0 = jnp.zeros(vb.shape, jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_qb, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_bwd(block_q, block_k, res, g):
    q, k, v, bias, out, lse = res
    do, _ = g
    BH, Lq, D = q.shape
    Lk = k.shape[1]
    Dv = v.shape[-1]
    scale = 1.0 / math.sqrt(D)
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)  # [BH, Lq]

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_k=block_k, scale=scale),
        grid=(BH, Lq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Lk, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Lk, Dv), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Lk), lambda b, i: (b, 0)),
            pl.BlockSpec((1, block_q, Dv), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_q), lambda b, i: (b, i)),
            pl.BlockSpec((1, block_q), lambda b, i: (b, i)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=INTERPRET,
    )(q, k, v, bias, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, block_q=block_q, scale=scale),
        grid=(BH, Lk // block_k),
        in_specs=[
            pl.BlockSpec((1, Lq, D), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, Dv), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, block_k), lambda b, j: (b, j)),
            pl.BlockSpec((1, Lq, Dv), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, Lq), lambda b, j: (b, 0)),
            pl.BlockSpec((1, Lq), lambda b, j: (b, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, D), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, Dv), lambda b, j: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        interpret=INTERPRET,
    )(q, k, v, bias, do, lse, delta)
    # bias is the constant validity mask; a zero cotangent satisfies
    # custom_vjp's structure requirement without computing it
    return dq, dk, dv, jnp.zeros_like(bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_attention_3d(q, k, v, bias, block_q, block_k):
    out, _ = _flash_fwd(q, k, v, bias, block_q, block_k)
    return out


def _flash_attention_3d_fwd(q, k, v, bias, block_q, block_k):
    out, lse = _flash_fwd(q, k, v, bias, block_q, block_k)
    return out, (q, k, v, bias, out, lse)


def _flash_attention_3d_bwd(block_q, block_k, res, g):
    return _flash_bwd(block_q, block_k, res, (g, None))


_flash_attention_3d.defvjp(_flash_attention_3d_fwd, _flash_attention_3d_bwd)


def _pick_block(n: int, target: int, align: int) -> int | None:
    """Largest divisor of n that is <= target and a multiple of align."""
    best = None
    for b in range(align, min(n, target) + 1, align):
        if n % b == 0:
            best = b
    return best


def flash_attention(q, k, v, key_bias=None):
    """q: [..., Lq, D]; k/v: [..., Lk, D/Dv]; key_bias broadcastable [Lk] or
    [..., Lk] additive f32. Returns [..., Lq, Dv].

    Uses the Pallas kernel when on TPU with tileable shapes, else XLA sdpa.
    """
    *lead, Lq, D = q.shape
    Lk = k.shape[-2]
    Dv = v.shape[-1]
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    # large q blocks: K/V are re-streamed once per (batch, q-block) program,
    # so fewer q blocks = less VMEM traffic (Lq=576 fits in one block)
    block_q = _pick_block(Lq, 1024, 64)
    block_k = _pick_block(Lk, 1024, 128)
    ok = (on_tpu and block_q is not None and block_k is not None
          and D % 128 == 0 and Dv % 128 == 0)
    if not ok:
        bias = None
        if key_bias is not None:
            bias = jnp.broadcast_to(
                key_bias.astype(jnp.float32),
                tuple(lead) + (Lk,))[..., None, :]
            bias = jnp.broadcast_to(bias, tuple(lead) + (Lq, Lk))
        return sdpa(q, k, v, bias)

    BH = 1
    for s in lead:
        BH *= s
    q3 = q.reshape(BH, Lq, D)
    k3 = k.reshape(BH, Lk, D)
    v3 = v.reshape(BH, Lk, Dv)
    if key_bias is None:
        bias3 = jnp.zeros((BH, Lk), jnp.float32)
    else:
        bias3 = jnp.broadcast_to(key_bias.astype(jnp.float32),
                                 tuple(lead) + (Lk,)).reshape(BH, Lk)
    out = _flash_attention_3d(q3, k3, v3, bias3, block_q, block_k)
    return out.reshape(*lead, Lq, Dv)
