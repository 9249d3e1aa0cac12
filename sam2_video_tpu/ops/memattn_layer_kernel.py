"""Fused memory-attention layer Pallas kernels (differentiable).

Why (round-4 profiling): after the trunk and memory-encoder fusions, the
largest remaining band of the training step is the per-frame memory-attention
XLA glue — the self-attention block, the projections around the flash
cross-attention, and the feed-forward run as ~250 separate sub-10 us ops per
frame (trace: ~9 ms of the 48.7 ms B=1 device step at avg ~6 us/op, each far
below MXU efficiency). Per frame per layer the activations are tiny
([O, 576, 256] bf16 = 0.3 MB/object), so the whole layer minus the
k/v-streaming flash cross-attention fits VMEM per object.

Two kernels per layer (the flash kernel stays between them):

- ``fused_self_block``: LN1 -> q/k/v -> RoPE(q,k) -> dense 576x576 attention
  -> out-proj -> +residual, PLUS the next stage's query formation
  LN2 -> cross-q-proj -> RoPE (its output feeds ``flash_attention_kproj``).
- ``fused_tail_block``: v-proj (on the v-commuted [.., 128] flash output) ->
  out-proj -> +residual -> LN3 -> linear1 -> ReLU -> linear2 -> +residual.
  The flash output is consumed UNSLICED at 128 lanes: the v-proj weight is
  augmented with zero input-columns for the pad lanes, so the XLA slice op
  (and its backward pad) disappears.

Both are custom-VJP with flash-attention-style in-kernel recompute: the
backward programs re-derive every intermediate from the block input(s) in
VMEM and accumulate weight grads in f32 across the (object) grid into
constant-index-map output blocks (TPU grids are sequential — each
accumulator block stays VMEM-resident for the sweep and is written once).

Numerics mirror the XLA path op for op: LN in f32 (eps=1e-5,
ops/common.py layer_norm), dots with f32 MXU accumulation rounded once,
f32 softmax with probabilities cast to the value dtype before PV
(ops/attention.py sdpa), RoPE in the compute dtype
(ops/position_encoding.py apply_rope_half), residual adds in the compute
dtype. Parity (values AND grads vs models/memory_attention.py) is pinned by
tests/test_memattn_fused.py in interpret mode.

Parity spec: /root/reference/sam2_video/model/modeling/memory_attention.py
MemoryAttentionLayer:17-99 (the torch stack relies on cuDNN + eager fusion
instead).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# set True in tests to run in interpreter mode regardless of backend (the
# CPU default already interprets)
INTERPRET = False

_EPS = 1e-5  # ops/common.py layer_norm default, used by all memattn norms
_HIDDEN_CHUNK = 512

_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=32 * 1024 * 1024)


def _run_interp(interpret):
    return interpret or INTERPRET or jax.default_backend() == "cpu"


def _ln32(x, w_ref, b_ref):
    """ops/common.py layer_norm walk: f32 moments, f32 scale/shift; caller
    casts once."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + _EPS)
            * w_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32))


def _ln_fwd_parts(x):
    """(xhat, r_inv) of LayerNorm in f32 for backward recompute."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    r_inv = jax.lax.rsqrt(var + _EPS)
    return xc * r_inv, r_inv


def _ln_bwd(dy, xhat, r_inv, w_ref):
    """dx of LayerNorm given upstream f32 dy (pre-scale grad handled by
    caller via dyln = dy * w)."""
    dxh = dy * w_ref[0].astype(jnp.float32)
    return r_inv * (dxh - jnp.mean(dxh, -1, keepdims=True)
                    - xhat * jnp.mean(dxh * xhat, -1, keepdims=True))


def _mm(x, w, bias, cdt):
    """[L, Ci] @ weight[Co, Ci] (+bias): f32 MXU accumulation rounded once,
    bias in the compute dtype (ops/common.py linear)."""
    y = jax.lax.dot_general(x, w, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(cdt)
    if bias is not None:
        y = y + bias[0].astype(cdt)
    return y


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _rope(x, cos, sin):
    """apply_rope_half in the compute dtype: x [L, D] with halves layout."""
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    return x * cos + rot * sin


def _rope_t(dy, cos, sin):
    """Transpose of _rope (it is linear): dx = dy*cos + rot^T(dy*sin), where
    rot^T(z) = concat(z[half:], -z[:half])."""
    half = dy.shape[-1] // 2
    ds = dy * sin
    return dy * cos + jnp.concatenate([ds[..., half:], -ds[..., :half]],
                                      axis=-1)


# ---------------------------------------------------------------------------
# Kernel S: LN1 + RoPE self-attention + out-proj + residual, and the next
# cross-attention's query formation (LN2 + q-proj + RoPE)
# ---------------------------------------------------------------------------


def _self_fwd_kernel(x_ref, cos_ref, sin_ref, ln1w_ref, ln1b_ref,
                     wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                     wo_ref, bo_ref, ln2w_ref, ln2b_ref, wqc_ref, bqc_ref,
                     out_ref, q3_ref):
    cdt = x_ref.dtype
    _, L, D = x_ref.shape
    scale = jnp.float32(1.0) / jnp.sqrt(jnp.float32(D))
    x = x_ref[0]
    cos = cos_ref[...].astype(cdt)
    sin = sin_ref[...].astype(cdt)

    xn = _ln32(x, ln1w_ref, ln1b_ref).astype(cdt)
    q = _rope(_mm(xn, wq_ref[...], bq_ref, cdt), cos, sin)
    k = _rope(_mm(xn, wk_ref[...], bk_ref, cdt), cos, sin)
    v = _mm(xn, wv_ref[...], bv_ref, cdt)

    logits = _dot(q, k, ((1,), (1,))) * scale            # [L, L] f32
    m = jnp.max(logits, -1, keepdims=True)
    e = jnp.exp(logits - m)
    p = (e / jnp.sum(e, -1, keepdims=True)).astype(cdt)
    o = _dot(p, v, ((1,), (0,))).astype(cdt)
    out = x + _mm(o, wo_ref[...], bo_ref, cdt)
    out_ref[0] = out

    y2 = _ln32(out, ln2w_ref, ln2b_ref).astype(cdt)
    q3_ref[0] = _rope(_mm(y2, wqc_ref[...], bqc_ref, cdt), cos, sin)


def _self_bwd_kernel(x_ref, cos_ref, sin_ref, ln1w_ref, ln1b_ref,
                     wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                     wo_ref, bo_ref, ln2w_ref, ln2b_ref, wqc_ref, bqc_ref,
                     dout_ref, dq3_ref,
                     dx_ref, dln1w_ref, dln1b_ref, dwq_ref, dbq_ref,
                     dwk_ref, dbk_ref, dwv_ref, dbv_ref, dwo_ref, dbo_ref,
                     dln2w_ref, dln2b_ref, dwqc_ref, dbqc_ref):
    cdt = x_ref.dtype
    _, L, D = x_ref.shape
    scale = jnp.float32(1.0) / jnp.sqrt(jnp.float32(D))
    accs = (dln1w_ref, dln1b_ref, dwq_ref, dbq_ref, dwk_ref, dbk_ref,
            dwv_ref, dbv_ref, dwo_ref, dbo_ref, dln2w_ref, dln2b_ref,
            dwqc_ref, dbqc_ref)

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in accs:
            r[...] = jnp.zeros(r.shape, r.dtype)

    x = x_ref[0]
    cos = cos_ref[...].astype(cdt)
    sin = sin_ref[...].astype(cdt)

    # ---- forward recompute
    xhat1, rinv1 = _ln_fwd_parts(x)
    xn = (xhat1 * ln1w_ref[0].astype(jnp.float32)
          + ln1b_ref[0].astype(jnp.float32)).astype(cdt)
    qpre = _mm(xn, wq_ref[...], bq_ref, cdt)
    kpre = _mm(xn, wk_ref[...], bk_ref, cdt)
    q = _rope(qpre, cos, sin)
    k = _rope(kpre, cos, sin)
    v = _mm(xn, wv_ref[...], bv_ref, cdt)
    logits = _dot(q, k, ((1,), (1,))) * scale
    m = jnp.max(logits, -1, keepdims=True)
    e = jnp.exp(logits - m)
    p32 = e / jnp.sum(e, -1, keepdims=True)
    pc = p32.astype(cdt)
    o = _dot(pc, v, ((1,), (0,))).astype(cdt)
    out = x + _mm(o, wo_ref[...], bo_ref, cdt)

    # ---- q3 = rope(qc_proj(LN2(out))) backward
    dq3 = dq3_ref[0]
    dqc = _rope_t(dq3, cos, sin).astype(cdt)
    xhat2, rinv2 = _ln_fwd_parts(out)
    y2 = (xhat2 * ln2w_ref[0].astype(jnp.float32)
          + ln2b_ref[0].astype(jnp.float32)).astype(cdt)
    dwqc_ref[...] += _dot(dqc, y2, ((0,), (0,)))
    dbqc_ref[...] += jnp.sum(dqc.astype(jnp.float32), 0, keepdims=True)
    dy2 = _dot(dqc, wqc_ref[...], ((1,), (0,)))          # [L, D] f32
    dln2w_ref[...] += jnp.sum(dy2 * xhat2, 0, keepdims=True)
    dln2b_ref[...] += jnp.sum(dy2, 0, keepdims=True)
    dout = dout_ref[0].astype(jnp.float32) \
        + _ln_bwd(dy2, xhat2, rinv2, ln2w_ref)
    doutc = dout.astype(cdt)

    # ---- out-proj + attention backward
    dbo_ref[...] += jnp.sum(dout, 0, keepdims=True)
    dwo_ref[...] += _dot(doutc, o, ((0,), (0,)))
    do = _dot(doutc, wo_ref[...], ((1,), (0,))).astype(cdt)
    dv32 = _dot(pc, do, ((0,), (0,)))                    # [L, D]
    dp = _dot(do, v, ((1,), (1,)))                       # [L, L] f32
    dlog = p32 * (dp - jnp.sum(dp * p32, -1, keepdims=True))
    dlogc = (dlog * scale).astype(cdt)
    dq32 = _dot(dlogc, k, ((1,), (0,)))
    dk32 = _dot(dlogc, q, ((0,), (0,)))
    dqpre = _rope_t(dq32.astype(cdt), cos, sin).astype(cdt)
    dkpre = _rope_t(dk32.astype(cdt), cos, sin).astype(cdt)

    dxn32 = jnp.zeros((L, D), jnp.float32)
    for dval, dw_ref, db_ref, w_ref in (
            (dqpre, dwq_ref, dbq_ref, wq_ref),
            (dkpre, dwk_ref, dbk_ref, wk_ref),
            (dv32.astype(cdt), dwv_ref, dbv_ref, wv_ref)):
        dw_ref[...] += _dot(dval, xn, ((0,), (0,)))
        db_ref[...] += jnp.sum(dval.astype(jnp.float32), 0, keepdims=True)
        dxn32 = dxn32 + _dot(dval, w_ref[...], ((1,), (0,)))

    # ---- LN1 backward + residual
    dln1w_ref[...] += jnp.sum(dxn32 * xhat1, 0, keepdims=True)
    dln1b_ref[...] += jnp.sum(dxn32, 0, keepdims=True)
    dx = dout + _ln_bwd(dxn32, xhat1, rinv1, ln1w_ref)
    dx_ref[0] = dx.astype(cdt)


# ---------------------------------------------------------------------------
# Kernel M: v-proj + out-proj + residual + LN3 + MLP (ReLU) + residual
# ---------------------------------------------------------------------------


def _tail_fwd_kernel(y_ref, a_ref, wv_ref, bv_ref, wo_ref, bo_ref,
                     ln3w_ref, ln3b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                     out_ref, *, hidden_chunk: int):
    cdt = y_ref.dtype
    y = y_ref[0]
    a = a_ref[0]                                         # [L, 128]
    t = _mm(a, wv_ref[...], bv_ref, cdt)                 # v-proj (augmented)
    z = y + _mm(t, wo_ref[...], bo_ref, cdt)
    h = _ln32(z, ln3w_ref, ln3b_ref).astype(cdt)
    L, D = z.shape
    Hd = w1_ref.shape[0]
    acc = jnp.zeros((L, D), jnp.float32)
    for lo in range(0, Hd, hidden_chunk):
        hi = min(lo + hidden_chunk, Hd)
        m1 = _mm(h, w1_ref[lo:hi, :], None, cdt) \
            + b1_ref[0, lo:hi].astype(cdt)
        # ReLU with the compare in f32 (Mosaic has no packed-bf16 cmpf);
        # exact: comparisons don't round, max(f32(x), 0) -> cdt == relu(x)
        r = jnp.maximum(m1.astype(jnp.float32), 0.0).astype(cdt)
        acc = acc + _dot(r, w2_ref[:, lo:hi], ((1,), (1,)))
    m2 = acc.astype(cdt) + b2_ref[0].astype(cdt)
    out_ref[0] = z + m2


def _tail_bwd_kernel(y_ref, a_ref, wv_ref, bv_ref, wo_ref, bo_ref,
                     ln3w_ref, ln3b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                     dout_ref,
                     dy_ref, da_ref, dwv_ref, dbv_ref, dwo_ref, dbo_ref,
                     dln3w_ref, dln3b_ref, dw1_ref, db1_ref, dw2_ref,
                     db2_ref, *, hidden_chunk: int):
    cdt = y_ref.dtype
    accs = (dwv_ref, dbv_ref, dwo_ref, dbo_ref, dln3w_ref, dln3b_ref,
            dw1_ref, db1_ref, dw2_ref, db2_ref)

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in accs:
            r[...] = jnp.zeros(r.shape, r.dtype)

    y = y_ref[0]
    a = a_ref[0]
    t = _mm(a, wv_ref[...], bv_ref, cdt)
    z = y + _mm(t, wo_ref[...], bo_ref, cdt)
    xhat3, rinv3 = _ln_fwd_parts(z)
    h = (xhat3 * ln3w_ref[0].astype(jnp.float32)
         + ln3b_ref[0].astype(jnp.float32)).astype(cdt)

    g = dout_ref[0]                                      # [L, D]
    g32 = g.astype(jnp.float32)
    L, D = z.shape
    Hd = w1_ref.shape[0]
    dh32 = jnp.zeros((L, D), jnp.float32)
    for lo in range(0, Hd, hidden_chunk):
        hi = min(lo + hidden_chunk, Hd)
        m1 = _mm(h, w1_ref[lo:hi, :], None, cdt) \
            + b1_ref[0, lo:hi].astype(cdt)
        m1f = m1.astype(jnp.float32)                     # f32 cmp (Mosaic)
        r = jnp.maximum(m1f, 0.0).astype(cdt)
        dr = _dot(g, w2_ref[:, lo:hi], ((1,), (0,)))     # [L, ch] f32
        dm1 = jnp.where(m1f > 0, dr, 0.0)
        dm1c = dm1.astype(cdt)
        db1_ref[:, lo:hi] += jnp.sum(dm1, 0, keepdims=True)
        dw1_ref[lo:hi, :] += _dot(dm1c, h, ((0,), (0,)))
        dw2_ref[:, lo:hi] += _dot(g, r, ((0,), (0,)))
        dh32 = dh32 + _dot(dm1c, w1_ref[lo:hi, :], ((1,), (0,)))
    db2_ref[...] += jnp.sum(g32, 0, keepdims=True)

    dln3w_ref[...] += jnp.sum(dh32 * xhat3, 0, keepdims=True)
    dln3b_ref[...] += jnp.sum(dh32, 0, keepdims=True)
    dz = g32 + _ln_bwd(dh32, xhat3, rinv3, ln3w_ref)
    dzc = dz.astype(cdt)

    dbo_ref[...] += jnp.sum(dz, 0, keepdims=True)
    dwo_ref[...] += _dot(dzc, t, ((0,), (0,)))
    dt = _dot(dzc, wo_ref[...], ((1,), (0,))).astype(cdt)
    dbv_ref[...] += jnp.sum(dt.astype(jnp.float32), 0, keepdims=True)
    dwv_ref[...] += _dot(dt, a, ((0,), (0,)))
    da_ref[0] = _dot(dt, wv_ref[...], ((1,), (0,))).astype(cdt)
    dy_ref[0] = dzc


# ---------------------------------------------------------------------------
# Drivers + custom VJPs
# ---------------------------------------------------------------------------


def _wrow(a):
    return a.astype(jnp.float32)[None]


def _wspec(a):
    return pl.BlockSpec(a.shape, lambda n, _nd=a.ndim: (0,) * _nd)


def _acc(shape):
    return (pl.BlockSpec(shape, lambda n, _nd=len(shape): (0,) * _nd),
            jax.ShapeDtypeStruct(shape, jnp.float32))


def _row_spec(L, D):
    return pl.BlockSpec((1, L, D), lambda n: (n, 0, 0))


def _self_operands(p_self, p_qc, ln1, ln2, cdt):
    """[ln1w, ln1b, wq, bq, wk, bk, wv, bv, wo, bo, ln2w, ln2b, wqc, bqc] —
    q/k/qc weights must already be de-interleave-row-permuted (the
    memory_attention `prepare` views)."""
    def wb(lin):
        return [lin["weight"].astype(cdt), _wrow(lin["bias"])]
    return ([_wrow(ln1["weight"]), _wrow(ln1["bias"])]
            + wb(p_self["q"]) + wb(p_self["k"]) + wb(p_self["v"])
            + wb(p_self["out"])
            + [_wrow(ln2["weight"]), _wrow(ln2["bias"])] + wb(p_qc))


@functools.lru_cache(maxsize=None)
def _make_self_block(interpret):
    @jax.custom_vjp
    def block(p_self, p_qc, ln1, ln2, x, cos, sin):
        return _self_fwd(p_self, p_qc, ln1, ln2, x, cos, sin)

    def fwd(p_self, p_qc, ln1, ln2, x, cos, sin):
        res = _self_fwd(p_self, p_qc, ln1, ln2, x, cos, sin)
        return res, (p_self, p_qc, ln1, ln2, x, cos, sin)

    def bwd(saved, cots):
        p_self, p_qc, ln1, ln2, x, cos, sin = saved
        dout, dq3 = cots
        return _self_bwd(p_self, p_qc, ln1, ln2, x, cos, sin, dout, dq3)

    def _self_fwd(p_self, p_qc, ln1, ln2, x, cos, sin):
        N, L, D = x.shape
        cdt = x.dtype
        operands = _self_operands(p_self, p_qc, ln1, ln2, cdt)
        out, q3 = pl.pallas_call(
            _self_fwd_kernel,
            grid=(N,),
            in_specs=[_row_spec(L, D), _wspec(cos), _wspec(sin)]
            + [_wspec(a) for a in operands],
            out_specs=(_row_spec(L, D), _row_spec(L, D)),
            out_shape=(jax.ShapeDtypeStruct((N, L, D), cdt),) * 2,
            interpret=_run_interp(interpret),
            compiler_params=_COMPILER_PARAMS,
        )(x, cos, sin, *operands)
        return out, q3

    def _self_bwd(p_self, p_qc, ln1, ln2, x, cos, sin, dout, dq3):
        N, L, D = x.shape
        cdt = x.dtype
        operands = _self_operands(p_self, p_qc, ln1, ln2, cdt)
        acc_shapes = [(1, D), (1, D)] \
            + [(D, D), (1, D)] * 4 \
            + [(1, D), (1, D), (D, D), (1, D)]
        accs = [_acc(s) for s in acc_shapes]
        outs = pl.pallas_call(
            _self_bwd_kernel,
            grid=(N,),
            in_specs=[_row_spec(L, D), _wspec(cos), _wspec(sin)]
            + [_wspec(a) for a in operands]
            + [_row_spec(L, D), _row_spec(L, D)],
            out_specs=(_row_spec(L, D),) + tuple(s for s, _ in accs),
            out_shape=(jax.ShapeDtypeStruct((N, L, D), cdt),)
            + tuple(sh for _, sh in accs),
            interpret=_run_interp(interpret),
            compiler_params=_COMPILER_PARAMS,
        )(x, cos, sin, *operands, dout, dq3)
        (dx, dln1w, dln1b, dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo,
         dln2w, dln2b, dwqc, dbqc) = outs

        def lin(dw, db, like):
            return {"weight": dw.astype(like["weight"].dtype),
                    "bias": db[0].astype(like["bias"].dtype)}

        dp_self = {"q": lin(dwq, dbq, p_self["q"]),
                   "k": lin(dwk, dbk, p_self["k"]),
                   "v": lin(dwv, dbv, p_self["v"]),
                   "out": lin(dwo, dbo, p_self["out"])}
        dln = lambda w, b, like: {  # noqa: E731
            "weight": w[0].astype(like["weight"].dtype),
            "bias": b[0].astype(like["bias"].dtype)}
        return (dp_self, lin(dwqc, dbqc, p_qc), dln(dln1w, dln1b, ln1),
                dln(dln2w, dln2b, ln2), dx,
                jnp.zeros_like(cos), jnp.zeros_like(sin))

    block.defvjp(fwd, bwd)
    return block


def fused_self_block(p_self, p_qc, ln1, ln2, x, cos, sin,
                     interpret: bool = False):
    """Differentiable fused self-attention block.

    p_self: {"q","k","v","out"} linear params — q/k rows PRE-PERMUTED
    (memory_attention._permed views). p_qc: the cross-attention q-proj
    (permuted). x: [N, L, D]. cos/sin: [L, D] f32 RoPE tables (halves
    layout). Returns (out, q3): the residual stream after self-attention
    and the rope'd cross-attention queries."""
    return _make_self_block(bool(interpret))(p_self, p_qc, ln1, ln2, x,
                                             cos, sin)


def _tail_operands(p_v, p_out, ln3, p_l1, p_l2, cdt, a_dim):
    """[wv_aug, bv, wo, bo, ln3w, ln3b, w1, b1, w2, b2]; the v-proj weight
    is augmented with zero input-columns to the flash output's padded lane
    count so the kernel consumes it unsliced."""
    wv = p_v["weight"]
    pad = a_dim - wv.shape[1]
    wv_aug = jnp.concatenate(
        [wv, jnp.zeros((wv.shape[0], pad), wv.dtype)], axis=1) if pad else wv
    return [wv_aug.astype(cdt), _wrow(p_v["bias"]),
            p_out["weight"].astype(cdt), _wrow(p_out["bias"]),
            _wrow(ln3["weight"]), _wrow(ln3["bias"]),
            p_l1["weight"].astype(cdt), _wrow(p_l1["bias"]),
            p_l2["weight"].astype(cdt), _wrow(p_l2["bias"])]


@functools.lru_cache(maxsize=None)
def _make_tail_block(interpret):
    @jax.custom_vjp
    def block(p_v, p_out, ln3, p_l1, p_l2, y, a):
        return _tail_fwd(p_v, p_out, ln3, p_l1, p_l2, y, a)

    def fwd(p_v, p_out, ln3, p_l1, p_l2, y, a):
        return (_tail_fwd(p_v, p_out, ln3, p_l1, p_l2, y, a),
                (p_v, p_out, ln3, p_l1, p_l2, y, a))

    def bwd(saved, g):
        return _tail_bwd(*saved, g)

    def _tail_fwd(p_v, p_out, ln3, p_l1, p_l2, y, a):
        N, L, D = y.shape
        Da = a.shape[-1]
        cdt = y.dtype
        operands = _tail_operands(p_v, p_out, ln3, p_l1, p_l2, cdt, Da)
        return pl.pallas_call(
            functools.partial(_tail_fwd_kernel, hidden_chunk=_HIDDEN_CHUNK),
            grid=(N,),
            in_specs=[_row_spec(L, D), _row_spec(L, Da)]
            + [_wspec(op) for op in operands],
            out_specs=_row_spec(L, D),
            out_shape=jax.ShapeDtypeStruct((N, L, D), cdt),
            interpret=_run_interp(interpret),
            compiler_params=_COMPILER_PARAMS,
        )(y, a, *operands)

    def _tail_bwd(p_v, p_out, ln3, p_l1, p_l2, y, a, g):
        N, L, D = y.shape
        Da = a.shape[-1]
        cdt = y.dtype
        Hd = p_l1["weight"].shape[0]
        operands = _tail_operands(p_v, p_out, ln3, p_l1, p_l2, cdt, Da)
        acc_shapes = [(D, Da), (1, D), (D, D), (1, D), (1, D), (1, D),
                      (Hd, D), (1, Hd), (D, Hd), (1, D)]
        accs = [_acc(s) for s in acc_shapes]
        outs = pl.pallas_call(
            functools.partial(_tail_bwd_kernel, hidden_chunk=_HIDDEN_CHUNK),
            grid=(N,),
            in_specs=[_row_spec(L, D), _row_spec(L, Da)]
            + [_wspec(op) for op in operands] + [_row_spec(L, D)],
            out_specs=(_row_spec(L, D), _row_spec(L, Da))
            + tuple(s for s, _ in accs),
            out_shape=(jax.ShapeDtypeStruct((N, L, D), cdt),
                       jax.ShapeDtypeStruct((N, L, Da), cdt))
            + tuple(sh for _, sh in accs),
            interpret=_run_interp(interpret),
            compiler_params=_COMPILER_PARAMS,
        )(y, a, *operands, g)
        (dy, da, dwv, dbv, dwo, dbo, dln3w, dln3b, dw1, db1, dw2,
         db2) = outs

        def lin(dw, db, like):
            return {"weight": dw.astype(like["weight"].dtype),
                    "bias": db[0].astype(like["bias"].dtype)}

        kv = p_v["weight"].shape[1]
        dp_v = {"weight": dwv[:, :kv].astype(p_v["weight"].dtype),
                "bias": dbv[0].astype(p_v["bias"].dtype)}
        dln3 = {"weight": dln3w[0].astype(ln3["weight"].dtype),
                "bias": dln3b[0].astype(ln3["bias"].dtype)}
        return (dp_v, lin(dwo, dbo, p_out), dln3, lin(dw1, db1, p_l1),
                lin(dw2, db2, p_l2), dy, da)

    block.defvjp(fwd, bwd)
    return block


def fused_tail_block(p_v, p_out, ln3, p_l1, p_l2, y, a,
                     interpret: bool = False):
    """Differentiable fused post-cross tail: v-proj on the (v-commuted,
    lane-padded) flash output ``a`` [N, L, Da], out-proj, +residual onto
    ``y``, LN3, linear1 -> ReLU -> linear2, +residual."""
    return _make_tail_block(bool(interpret))(p_v, p_out, ln3, p_l1, p_l2,
                                             y, a)


def fused_layer_eligible(cfg, L: int, interpret: bool = False) -> bool:
    """The fused layer path covers the reference memory-attention geometry:
    single-head (the v-commute precondition), ReLU feed-forward, the default
    pos-enc flags (queries/keys get no extra pos inside the fused blocks),
    and lane-aligned dims. The dense [L, L] f32 logits (+ their backward
    twin) must fit the VMEM budget."""
    if not (interpret or INTERPRET or jax.default_backend() == "tpu"):
        return False
    if cfg.num_heads != 1 or cfg.activation != "relu":
        return False
    if cfg.pos_enc_at_attn or cfg.pos_enc_at_cross_attn_queries:
        return False
    if cfg.d_model % 128 != 0 or L % 8 != 0:
        return False
    # bwd resident: ~3 [L, L] f32 (logits/p/dp) + qkv/activations. The
    # 26 MB bound admits the 512px query grid (L=1024 needs 25.2 MB) under
    # the 32 MB scoped-VMEM limit the round-5 kernels proved usable —
    # round 4's 18 MB bound was the 512px eligibility wall (DESIGN.md §3
    # round-4 re-sweep; VERDICT r4 item 4).
    return 3 * 4 * L * L + 12 * 4 * L * cfg.d_model <= 26 * 1024 * 1024
