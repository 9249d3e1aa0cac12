"""Pallas TPU flash attention (forward + custom-VJP backward) for the
stack's hot attention shapes:

- memory attention cross-attn: Lq = 576 (24x24 feature grid), Lk = 4096
  (7 spatial memory slots x 576 + 16 pointers x 4 tokens) — exactly 8x512
  key blocks;
- larger grids (512px: Lq = 1024) up to Lq <= 2048.

Design (cf. /opt/skills/guides/pallas_guide.md): the whole query block lives
in VMEM (Lq x D is small for these shapes) and keys/values stream from HBM in
``block_k`` chunks with the online-softmax running (m, l) rescale; the
additive key-bias vector (memory-slot validity mask) folds into the logits.
Grid is (batch*heads, k-blocks) for every kernel — forward and dq carry
persistent f32 VMEM scratch accumulators across the sequential k-block steps
so no kernel ever holds the full K/V resident (at the 512px grouped-eval
shape that would exceed the 16 MB VMEM budget).
f32 accumulation, bf16 or f32 I/O. Backward recomputes probabilities
blockwise from the saved logsumexp — no Lq x Lk materialization anywhere.
All small per-row tensors (lse, delta, bias) are kept 3D with full-size
trailing blocks to satisfy the Mosaic (8, 128) tiling rules.

Falls back to the XLA path (ops.attention.sdpa) when shapes don't tile or
when running on CPU — ``flash_attention`` picks automatically.
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

MAX_LQ = 2048  # whole-q-block VMEM budget guard


# ---------------------------------------------------------------------------
# Forward kernel: grid (BH, k-blocks), whole q resident, K/V streamed from
# HBM one block per grid step (Pallas double-buffers them), online-softmax
# state (acc, m, l) lives in f32 VMEM scratch that persists across the
# sequential k-block iterations. Keeping the full K/V resident instead
# OOMs VMEM at the 512px grouped-eval shape ([G*H, 1024, 256] x Lk=7424).
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
                acc_ref, m_ref, l_ref, *, scale: float):
    j = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32) * scale        # [Lq, d]
    kb = k_ref[0].astype(jnp.float32)               # [bk, d]
    vb = v_ref[0].astype(jnp.float32)               # [bk, dv]
    s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + bias_ref[0, 0][None, :]
    m_i = m_ref[...]
    m_new = jnp.maximum(m_i, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_i - m_new)
    l_ref[...] = alpha * l_ref[...] + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p, vb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[...] = m_new

    @pl.when(j == nk - 1)
    def _():
        o_ref[0] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)
        lse_ref[0, 0] = (m_ref[...] + jnp.log(l_ref[...]))[:, 0]


def _flash_fwd(q, k, v, bias, block_k: int):
    BH, Lq, D = q.shape
    Lk = k.shape[1]
    Dv = v.shape[-1]
    scale = 1.0 / math.sqrt(D)
    from jax.experimental.pallas import tpu as pltpu
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(BH, Lk // block_k),
        in_specs=[
            pl.BlockSpec((1, Lq, D), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, Dv), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, j: (b, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, Lq, Dv), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, 1, Lq), lambda b, j: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Lq, Dv), q.dtype),
            jax.ShapeDtypeStruct((BH, 1, Lq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Lq, Dv), jnp.float32),
            pltpu.VMEM((Lq, 1), jnp.float32),
            pltpu.VMEM((Lq, 1), jnp.float32),
        ],
        interpret=INTERPRET,
    )(q, k, v, bias)
    return out, lse


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
                dq_ref, dk_ref, dv_ref, dq_acc_ref, *, scale: float):
    """SINGLE merged backward pass, grid (BH, k-blocks): dq, dk and dv come
    out of one K/V streaming sweep. A dq-kernel/dkv-kernel split would
    stream q/k/v/do twice and recompute s and the probabilities per pass.
    The whole q/do block is resident per program; dq accumulates in an f32
    VMEM scratch that persists across the (sequential) k-block iterations
    and is flushed on the last one; dk/dv blocks write per grid step."""
    j = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        dq_acc_ref[...] = jnp.zeros_like(dq_acc_ref)

    kb = k_ref[0].astype(jnp.float32)           # [bk, d]
    vb = v_ref[0].astype(jnp.float32)
    bias = bias_ref[0, 0][None, :]               # [1, bk]
    q = q_ref[0].astype(jnp.float32) * scale     # [Lq, d]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, None]
    delta = delta_ref[0, 0][:, None]

    s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + bias
    p = jnp.exp(s - lse)                         # [Lq, bk]
    dv = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, vb, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta)

    dq_acc_ref[...] += jax.lax.dot_general(
        ds, kb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _():
        dq_ref[0] = (dq_acc_ref[...] * scale).astype(dq_ref.dtype)

    dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_bwd(block_k, res, g):
    q, k, v, bias, out, lse = res
    do = g
    BH, Lq, D = q.shape
    Lk = k.shape[1]
    Dv = v.shape[-1]
    scale = 1.0 / math.sqrt(D)
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)[:, None, :]  # [BH, 1, Lq]

    from jax.experimental.pallas import tpu as pltpu
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(BH, Lk // block_k),
        in_specs=[
            pl.BlockSpec((1, Lq, D), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, Dv), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, j: (b, 0, j)),
            pl.BlockSpec((1, Lq, Dv), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, 1, Lq), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, 1, Lq), lambda b, j: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Lq, D), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, Dv), lambda b, j: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((Lq, D), jnp.float32)],
        interpret=INTERPRET,
    )(q, k, v, bias, do, lse, delta)
    # bias is the constant validity mask; a zero cotangent satisfies
    # custom_vjp's structure requirement without computing it
    return dq, dk, dv, jnp.zeros_like(bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_attention_3d(q, k, v, bias, block_k):
    out, _ = _flash_fwd(q, k, v, bias, block_k)
    return out


def _flash_attention_3d_fwd(q, k, v, bias, block_k):
    out, lse = _flash_fwd(q, k, v, bias, block_k)
    return out, (q, k, v, bias, out, lse)


def _flash_attention_3d_bwd(block_k, res, g):
    return _flash_bwd(block_k, res, g)


_flash_attention_3d.defvjp(_flash_attention_3d_fwd, _flash_attention_3d_bwd)


# ---------------------------------------------------------------------------
# Fused K-projection + RoPE variant (memory cross-attention training path).
#
# Profiling (round 3) showed the K materialization around the flash kernel —
# the [O, Lk, d_model] projected keys written by XLA, re-read by all three
# kernels, and the matching [O, Lk, d_model] dK chain in the backward
# (slice_multiply/pad_add fusions + [d_model] bias-grad re-reads) — cost more
# HBM traffic than the attention math itself. This variant never materializes
# K: the kernels stream the RAW kv_in_dim(=64) memory tokens and compute
# k = rope(kin @ Wk) per block in VMEM. The k-projection *bias* rides along
# as row 64 of the augmented weight (kin carries a constant 1.0 in lane 64),
# so the backward's single [128, d_model] accumulator yields dWk and dbk in
# one pass, and d_kin (64-dim) replaces the 256-dim dK as the only
# token-shaped backward output. RoPE cos/sin are generated in-kernel from
# iota (axial table, tiled per spatial slot; identity rows for pointer
# tokens), so no rope table streams from HBM either.
# ---------------------------------------------------------------------------


def _project_k(kin_ref, wk_ref, cos_ref, sin_ref):
    """k block [bk, D] f32 = rope_half(kin @ wk_aug), with the rope rotation
    applied from streamed compact half-tables ([bk, D//2] each; pointer/pad
    rows carry the identity cos=1/sin=0). An earlier variant generated the
    tables in-kernel from iota + cos/sin: the VPU transcendentals roughly
    doubled every kernel call (0.18 -> 0.35 ms measured) — streaming the
    bf16 tables rides the already-pipelined DMA instead."""
    kin = kin_ref[0].astype(jnp.float32)              # [bk, 128]
    wk = wk_ref[...].astype(jnp.float32)              # [128, D]
    kpre = jax.lax.dot_general(kin, wk, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    cos = cos_ref[...].astype(jnp.float32)            # [bk, D//2]
    sin = sin_ref[...].astype(jnp.float32)
    half = kpre.shape[1] // 2
    k1, k2 = kpre[:, :half], kpre[:, half:]
    return jnp.concatenate([k1 * cos - k2 * sin, k2 * cos + k1 * sin], axis=1)


def _fwd_kproj_kernel(q_ref, kin_ref, v_ref, bias_ref, wk_ref, cos_ref,
                      sin_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref, *,
                      scale: float):
    j = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32) * scale
    kb = _project_k(kin_ref, wk_ref, cos_ref, sin_ref)
    vb = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + bias_ref[0, 0][None, :]
    m_i = m_ref[...]
    m_new = jnp.maximum(m_i, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_i - m_new)
    l_ref[...] = alpha * l_ref[...] + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p, vb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[...] = m_new

    @pl.when(j == nk - 1)
    def _():
        o_ref[0] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)
        lse_ref[0, 0] = (m_ref[...] + jnp.log(l_ref[...]))[:, 0]


def _bwd_kproj_kernel(q_ref, kin_ref, v_ref, bias_ref, wk_ref, cos_ref,
                      sin_ref, do_ref, lse_ref, delta_ref,
                      dq_ref, dkin_ref, dv_ref, dwk_ref, dq_acc_ref, *,
                      scale: float):
    """SINGLE merged backward pass, grid (BH, k-blocks): dq, d_kin, dv and
    dwk come out of one streaming sweep. A dq-kernel/dkv-kernel split (the
    generic path's structure) would stream q/kin/v/do twice and recompute
    k and the probabilities per pass — measured ~3 ms/step slower at the
    training shape. dq accumulates in persistent f32 VMEM scratch and is
    flushed on the last k-block; dwk_ref maps every grid step to the same
    [128, D] block, stays VMEM-resident for the whole (sequential) grid,
    and accumulates kinᵀ·d(k_pre) across blocks AND batch — rows 0..63 are
    dWkᵀ, row 64 is dbk (kin lane 64 is the constant 1)."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when((b == 0) & (j == 0))
    def _():
        dwk_ref[...] = jnp.zeros_like(dwk_ref)

    @pl.when(j == 0)
    def _():
        dq_acc_ref[...] = jnp.zeros_like(dq_acc_ref)

    kin = kin_ref[0].astype(jnp.float32)
    vb = v_ref[0].astype(jnp.float32)
    q = q_ref[0].astype(jnp.float32) * scale
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, None]
    delta = delta_ref[0, 0][:, None]
    kb = _project_k(kin_ref, wk_ref, cos_ref, sin_ref)

    s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + bias_ref[0, 0][None, :]
    p = jnp.exp(s - lse)
    dv = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, vb, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta)

    dq_acc_ref[...] += jax.lax.dot_general(
        ds, kb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _():
        dq_ref[0] = (dq_acc_ref[...] * scale).astype(dq_ref.dtype)

    dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # rope adjoint (transpose of the per-position rotation)
    half = dk.shape[1] // 2
    cos = cos_ref[...].astype(jnp.float32)
    sin = sin_ref[...].astype(jnp.float32)
    g1, g2 = dk[:, :half], dk[:, half:]
    dpre = jnp.concatenate([g1 * cos + g2 * sin, g2 * cos - g1 * sin], axis=1)
    wk = wk_ref[...].astype(jnp.float32)
    dkin_ref[0] = jax.lax.dot_general(
        dpre, wk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dkin_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)
    dwk_ref[...] += jax.lax.dot_general(
        kin, dpre, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _kproj_specs(BH, Lq, D, Dk, Lk, block_k):
    """Input BlockSpecs shared by the three kproj kernels (q, kin, v, bias,
    wk, cos, sin)."""
    return [
        pl.BlockSpec((1, Lq, D), lambda b, j: (b, 0, 0)),
        pl.BlockSpec((1, block_k, Dk), lambda b, j: (b, j, 0)),
        pl.BlockSpec((1, block_k, Dk), lambda b, j: (b, j, 0)),
        pl.BlockSpec((1, 1, block_k), lambda b, j: (b, 0, j)),
        pl.BlockSpec((Dk, D), lambda b, j: (0, 0)),
        pl.BlockSpec((block_k, D // 2), lambda b, j: (j, 0)),
        pl.BlockSpec((block_k, D // 2), lambda b, j: (j, 0)),
    ]


def _flash_kproj_fwd_call(q, kin, v, wk, bias, cos, sin, block_k):
    BH, Lq, D = q.shape
    Lk = kin.shape[1]
    Dk = kin.shape[-1]
    scale = 1.0 / math.sqrt(D)
    from jax.experimental.pallas import tpu as pltpu
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kproj_kernel, scale=scale),
        grid=(BH, Lk // block_k),
        in_specs=_kproj_specs(BH, Lq, D, Dk, Lk, block_k),
        out_specs=[
            pl.BlockSpec((1, Lq, Dk), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, 1, Lq), lambda b, j: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Lq, Dk), q.dtype),
            jax.ShapeDtypeStruct((BH, 1, Lq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Lq, Dk), jnp.float32),
            pltpu.VMEM((Lq, 1), jnp.float32),
            pltpu.VMEM((Lq, 1), jnp.float32),
        ],
        interpret=INTERPRET,
    )(q, kin, v, bias, wk, cos, sin)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _flash_kproj_3d(q, kin, v, wk, bias, cos, sin, block_k):
    out, _ = _flash_kproj_fwd_call(q, kin, v, wk, bias, cos, sin, block_k)
    return out


def _flash_kproj_3d_fwd(q, kin, v, wk, bias, cos, sin, block_k):
    out, lse = _flash_kproj_fwd_call(q, kin, v, wk, bias, cos, sin, block_k)
    return out, (q, kin, v, wk, bias, cos, sin, out, lse)


def _flash_kproj_3d_bwd(block_k, res, g):
    q, kin, v, wk, bias, cos, sin, out, lse = res
    do = g
    BH, Lq, D = q.shape
    Lk = kin.shape[1]
    Dk = kin.shape[-1]
    scale = 1.0 / math.sqrt(D)
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)[:, None, :]
    from jax.experimental.pallas import tpu as pltpu
    specs = _kproj_specs(BH, Lq, D, Dk, Lk, block_k)
    tail = [
        pl.BlockSpec((1, Lq, Dk), lambda b, j: (b, 0, 0)),   # do
        pl.BlockSpec((1, 1, Lq), lambda b, j: (b, 0, 0)),    # lse
        pl.BlockSpec((1, 1, Lq), lambda b, j: (b, 0, 0)),    # delta
    ]
    dq, dkin, dv, dwk = pl.pallas_call(
        functools.partial(_bwd_kproj_kernel, scale=scale),
        grid=(BH, Lk // block_k),
        in_specs=specs + tail,
        out_specs=[
            pl.BlockSpec((1, Lq, D), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, block_k, Dk), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, Dk), lambda b, j: (b, j, 0)),
            pl.BlockSpec((Dk, D), lambda b, j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(kin.shape, kin.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
            jax.ShapeDtypeStruct((Dk, D), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Lq, D), jnp.float32)],
        interpret=INTERPRET,
    )(q, kin, v, bias, wk, cos, sin, do, lse, delta)
    return dq, dkin, dv, dwk.astype(wk.dtype), jnp.zeros_like(bias), \
        jnp.zeros_like(cos), jnp.zeros_like(sin)


_flash_kproj_3d.defvjp(_flash_kproj_3d_fwd, _flash_kproj_3d_bwd)


def _kproj_rope_tables(dim: int, gw: int, gh: int, num_spatial: int,
                       Lk: int, theta: float, dtype):
    """Compact half-layout cos/sin tables [Lk, dim//2]: the axial table of
    one gw x gh tile repeated over the spatial slots, identity rows
    (cos=1, sin=0) for pointer/pad tokens (``num_k_exclude_rope``). Constant
    under jit — XLA folds them once per program."""
    from .position_encoding import axial_rope_table
    cos, sin = axial_rope_table(dim, gw, gh, theta)   # [gw*gh, dim//2]
    reps = num_spatial // (gw * gh)
    tail = Lk - num_spatial
    cos = jnp.concatenate(
        [jnp.tile(cos, (reps, 1)),
         jnp.ones((tail, dim // 2), jnp.float32)], axis=0)
    sin = jnp.concatenate(
        [jnp.tile(sin, (reps, 1)),
         jnp.zeros((tail, dim // 2), jnp.float32)], axis=0)
    return cos.astype(dtype), sin.astype(dtype)


def flash_kproj_eligible(q, kin, num_spatial: int, grid_wh) -> bool:
    """True when the fused K-projection kernel can run (TPU, tileable)."""
    *lead, Lq, D = q.shape
    kv = kin.shape[-1]
    gw, gh = grid_wh
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    return bool(on_tpu and Lq <= MAX_LQ and Lq % 8 == 0 and D % 256 == 0
                and kv <= 120 and num_spatial % (gw * gh) == 0)


def flash_attention_kproj(q, kin, v, wk_weight, wk_bias, key_bias,
                          num_spatial: int, grid_wh, theta: float = 10000.0):
    """Memory cross-attention with the K-projection + axial RoPE fused into
    the flash kernel (see module comment above).

    q:         [..., Lq, D]    queries, already projected + rope'd
    kin:       [..., Lk, kv]   raw memory tokens + positional embeds (k input)
    v:         [..., Lk, kv]   raw memory tokens (the v-commute operand)
    wk_weight: [D, kv]         k_proj weight, torch [out, in] layout, rows
                               already de-interleave-permuted
    wk_bias:   [D]             k_proj bias (same permutation)
    key_bias:  [Lk] or [..., Lk] additive validity bias
    num_spatial: leading keys that receive the tiled axial RoPE
    grid_wh:   (w, h) of one spatial slot's feature grid
    Returns [..., Lq, 128] — the caller slices [..., :kv] (pad lanes are
    exact zeros because v's pad lanes are zero).

    Callers must check ``flash_kproj_eligible`` first; this function assumes
    a TPU backend and tileable shapes.
    """
    *lead, Lq, D = q.shape
    Lk = kin.shape[-2]
    kv = kin.shape[-1]
    gw, gh = grid_wh

    # pad keys to a 256-multiple (zero tokens, -inf bias, identity rope)
    pad_k = (-Lk) % 256
    kb_full = (jnp.broadcast_to(key_bias.astype(jnp.float32),
                                tuple(lead) + (Lk,))
               if key_bias is not None
               else jnp.zeros(tuple(lead) + (Lk,), jnp.float32))
    if pad_k:
        kin = jnp.concatenate(
            [kin, jnp.zeros(kin.shape[:-2] + (pad_k, kv), kin.dtype)],
            axis=-2)
        v = jnp.concatenate(
            [v, jnp.zeros(v.shape[:-2] + (pad_k, kv), v.dtype)], axis=-2)
        kb_full = jnp.concatenate(
            [kb_full, jnp.full(tuple(lead) + (pad_k,), -1e9, jnp.float32)],
            axis=-1)
        Lk += pad_k
    block_k = _pick_block(Lk, 1024, 128)
    if block_k is None:
        raise ValueError(f"flash_attention_kproj: Lk={Lk} does not tile")

    BH = 1
    for s in lead:
        BH *= s
    # augment: kin lane `kv` carries 1.0 so wk row `kv` acts as the bias
    pad = 128 - kv
    kin_aug = jnp.concatenate([
        kin.reshape(BH, Lk, kv),
        jnp.ones((BH, Lk, 1), kin.dtype),
        jnp.zeros((BH, Lk, pad - 1), kin.dtype)], axis=-1)
    v_pad = jnp.concatenate([
        v.reshape(BH, Lk, kv),
        jnp.zeros((BH, Lk, pad), v.dtype)], axis=-1)
    wk_aug = jnp.concatenate([
        wk_weight.T.astype(q.dtype),
        wk_bias[None, :].astype(q.dtype),
        jnp.zeros((pad - 1, D), q.dtype)], axis=0)
    bias3 = kb_full.reshape(BH, 1, Lk)
    cos, sin = _kproj_rope_tables(D, gw, gh, num_spatial, Lk, theta, q.dtype)
    out = _flash_kproj_3d(q.reshape(BH, Lq, D), kin_aug, v_pad, wk_aug,
                          bias3, cos, sin, block_k)
    return out.reshape(*lead, Lq, 128)


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
    # pad keys to a 256-multiple with -inf bias so any Lk tiles (512px has
    # Lk = 7232); padded keys get zero softmax weight
    pad_k = (-Lk) % 256
    if on_tpu and pad_k and Lq <= MAX_LQ and Lq % 8 == 0 \
            and D % 128 == 0 and Dv % 128 == 0:
        k = jnp.concatenate([k, jnp.zeros(k.shape[:-2] + (pad_k, D),
                                          k.dtype)], axis=-2)
        v = jnp.concatenate([v, jnp.zeros(v.shape[:-2] + (pad_k, Dv),
                                          v.dtype)], axis=-2)
        kb_full = (jnp.broadcast_to(key_bias.astype(jnp.float32),
                                    tuple(lead) + (Lk,))
                   if key_bias is not None
                   else jnp.zeros(tuple(lead) + (Lk,), jnp.float32))
        key_bias = jnp.concatenate(
            [kb_full, jnp.full(tuple(lead) + (pad_k,), -1e9, jnp.float32)],
            axis=-1)
        Lk = Lk + pad_k
    block_k = _pick_block(Lk, 1024, 128)
    ok = (on_tpu and block_k is not None and Lq <= MAX_LQ and Lq % 8 == 0
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
        bias3 = jnp.zeros((BH, 1, Lk), jnp.float32)
    else:
        bias3 = jnp.broadcast_to(key_bias.astype(jnp.float32),
                                 tuple(lead) + (Lk,)).reshape(BH, 1, Lk)
    out = _flash_attention_3d(q3, k3, v3, bias3, block_k)
    return out.reshape(*lead, Lq, Dv)
