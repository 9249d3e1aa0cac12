"""Fused two-way-transformer (mask decoder) block Pallas kernels.

Why (round-5 profiling, benchmarks/source_profile.py): after the memory
path and trunk were fused, the largest remaining XLA band of the headline
training step is the per-frame SAM head — the two-way transformer's four
attentions, norms and MLP lower to ~13 ms/step of sub-0.5 ms fusions
(mask_decoder 3.0 + shared-primitive fusions 7.8 + sdpa 2.2 of the 86 ms
B=2 device step), each far below MXU efficiency at 8-token queries. Per
frame the whole block state is tiny — tokens [O, 8, 256] and image keys
[O, 576, 256] ~ 2.4 MB bf16 — so one Pallas program runs a WHOLE two-way
block for all objects at once.

Object batching without gathers (the hiera dense-mask trick,
ops/hiera_block_kernel.py): tokens flatten to [O*N, C] rows and image
keys to [O*HW, C] rows; each cross-attention runs as ONE dense
[O*N, O*HW] (resp. transposed) logits matmul per head with a
block-diagonal object mask — exp(-1e30 - m) contributes exactly zero
probability and zero PV terms, so the result is bit-equivalent to
per-object softmax while every dot has 64-4608 rows for the MXU. The
off-diagonal FLOPs are noise (<1 GFLOP/frame vs the step's 6.5 TFLOP).

Multi-head at tiny head dims (self 32, cross 16) uses per-head weight
stacks ([H, hd, C] qkv, [H, C, hd] out-projection columns) so the kernel
never lane-slices activations at non-128 offsets; the output projection
accumulates sum_h o_h @ Wo_h in one f32 accumulator — the same
single-rounding reduction as XLA's concat-then-project.

Differentiable: custom VJP with flash-attention-style in-kernel recompute.
The backward splits into two programs to stay inside the scoped-VMEM
budget (each re-derives its stages from the block inputs):

- ``B1``: recompute self/t2i/MLP, then backward of the image->token
  cross-attention and the MLP (i2t + mlp + ln3/ln4 weight grads).
- ``B2``: recompute self/t2i, then backward of the token->image
  cross-attention and the self-attention (self + t2i + ln1/ln2 grads).

Weight grads accumulate in f32 across the (vmapped batch) grid into
constant-index-map output blocks (TPU grids are sequential; each
accumulator stays VMEM-resident for the sweep, one HBM write). The
query-pe (= the decoder's token embedding, used as pe in every stage) and
the shared image-pe receive full cotangents: dqpe per sample, dkpe as an
object- and grid-reduced f32 accumulator.

Numerics mirror models/mask_decoder.py op for op: LN in f32 (eps 1e-5),
dots with f32 MXU accumulation rounded once, f32 softmax with
probabilities cast to the value dtype before PV (ops/attention.py sdpa),
residual adds and pe adds in the compute dtype. Parity (values AND grads)
is pinned by tests/test_twoway_fused.py in interpret mode.

Parity spec: /root/reference/sam2_video/model/modeling/sam/transformer.py
TwoWayAttentionBlock:112-187, Attention:190-248 (the torch stack leans on
cuDNN SDPA + eager fusion instead).
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

_EPS = 1e-5  # ops/common.py layer_norm default
_NEG_INF = -1e30
_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=32 * 1024 * 1024)


def _run_interp(interpret):
    return interpret or INTERPRET or jax.default_backend() == "cpu"


def _ln32(x, w_ref, b_ref):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + _EPS)
            * w_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32))


def _ln_fwd_parts(x):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    r_inv = jax.lax.rsqrt(var + _EPS)
    return xc * r_inv, r_inv


def _ln_bwd(dy, xhat, r_inv, w_ref):
    dxh = dy * w_ref[0].astype(jnp.float32)
    return r_inv * (dxh - jnp.mean(dxh, -1, keepdims=True)
                    - xhat * jnp.mean(dxh * xhat, -1, keepdims=True))


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _mm(x, w, bias, cdt):
    """[L, Ci] @ w[Co, Ci] (+bias in cdt) — ops/common.py linear walk."""
    y = _dot(x, w, ((1,), (1,))).astype(cdt)
    if bias is not None:
        y = y + bias.astype(cdt)
    return y


def _obj_mask(rows, cols, per_row, per_col):
    """[rows, cols] bool: row r (object r // per_row) may attend col c
    (object c // per_col)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    return (ri // per_row) == (ci // per_col)


class _MHA:
    """Multi-head attention over per-head weight stacks, dense masked.

    q_in: [Lq, C], k_in: [Lk, C], v_in: [Lk, C]; wq/wk/wv [H, hd, C],
    bq/bk/bv [H, 1, hd] f32, wo [H, C, hd], bo [1, C] f32."""

    def __init__(self, refs, heads):
        (self.wq, self.bq, self.wk, self.bk, self.wv, self.bv,
         self.wo, self.bo) = refs
        self.heads = heads

    def fwd(self, q_in, k_in, v_in, allow, cdt):
        hd = self.wq.shape[1]
        scale = jnp.float32(1.0) / jnp.sqrt(jnp.float32(hd))
        acc = None
        for h in range(self.heads):
            qh = _mm(q_in, self.wq[h], self.bq[h], cdt)
            kh = _mm(k_in, self.wk[h], self.bk[h], cdt)
            vh = _mm(v_in, self.wv[h], self.bv[h], cdt)
            sl = _dot(qh, kh, ((1,), (1,))) * scale
            if allow is not None:
                sl = jnp.where(allow, sl, _NEG_INF)
            m = jnp.max(sl, -1, keepdims=True)
            e = jnp.exp(sl - m)
            p = (e / jnp.sum(e, -1, keepdims=True)).astype(cdt)
            oh = _dot(p, vh, ((1,), (0,))).astype(cdt)
            part = _dot(oh, self.wo[h], ((1,), (1,)))
            acc = part if acc is None else acc + part
        return acc.astype(cdt) + self.bo[0].astype(cdt)

    def bwd(self, q_in, k_in, v_in, allow, cdt, dout,
            dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo):
        """Recompute-and-backward. dout: [Lq, C] f32. Returns
        (dq_in, dk_in, dv_in) f32 and accumulates weight grads."""
        hd = self.wq.shape[1]
        scale = jnp.float32(1.0) / jnp.sqrt(jnp.float32(hd))
        doutc = dout.astype(cdt)
        dbo[...] += jnp.sum(dout, 0, keepdims=True)
        dq_in = jnp.zeros(q_in.shape, jnp.float32)
        dk_in = jnp.zeros(k_in.shape, jnp.float32)
        dv_in = jnp.zeros(v_in.shape, jnp.float32)
        for h in range(self.heads):
            qh = _mm(q_in, self.wq[h], self.bq[h], cdt)
            kh = _mm(k_in, self.wk[h], self.bk[h], cdt)
            vh = _mm(v_in, self.wv[h], self.bv[h], cdt)
            sl = _dot(qh, kh, ((1,), (1,))) * scale
            if allow is not None:
                sl = jnp.where(allow, sl, _NEG_INF)
            m = jnp.max(sl, -1, keepdims=True)
            e = jnp.exp(sl - m)
            p32 = e / jnp.sum(e, -1, keepdims=True)
            pc = p32.astype(cdt)
            oh = _dot(pc, vh, ((1,), (0,))).astype(cdt)
            dwo[h] += _dot(doutc, oh, ((0,), (0,)))
            do = _dot(doutc, self.wo[h], ((1,), (0,))).astype(cdt)  # [Lq,hd]
            dvh = _dot(pc, do, ((0,), (0,)))                        # [Lk,hd]
            dp = _dot(do, vh, ((1,), (1,)))                         # [Lq,Lk]
            dlog = p32 * (dp - jnp.sum(dp * p32, -1, keepdims=True))
            dlogc = (dlog * scale).astype(cdt)
            dqh = _dot(dlogc, kh, ((1,), (0,))).astype(cdt)
            dkh = _dot(dlogc, qh, ((0,), (0,))).astype(cdt)
            dvhc = dvh.astype(cdt)
            dwq[h] += _dot(dqh, q_in, ((0,), (0,)))
            dbq[h] += jnp.sum(dqh.astype(jnp.float32), 0, keepdims=True)
            dwk[h] += _dot(dkh, k_in, ((0,), (0,)))
            dbk[h] += jnp.sum(dkh.astype(jnp.float32), 0, keepdims=True)
            dwv[h] += _dot(dvhc, v_in, ((0,), (0,)))
            dbv[h] += jnp.sum(dvh, 0, keepdims=True)
            dq_in = dq_in + _dot(dqh, self.wq[h], ((1,), (0,)))
            dk_in = dk_in + _dot(dkh, self.wk[h], ((1,), (0,)))
            dv_in = dv_in + _dot(dvhc, self.wv[h], ((1,), (0,)))
        return dq_in, dk_in, dv_in


# operand order shared by the kernels (B2 takes only the first _N_W2 —
# it never touches the MLP/i2t weights, and dropping them from its specs
# saves ~2.4 MB of scoped VMEM):
# self(8) + ln1(2) + t2i(8) + ln2(2) + mlp(4) + ln3(2) + i2t(8) + ln4(2)
_N_W = 36
_N_W2 = 20


def _unpack_w(w, heads):
    out = {
        "self": _MHA(w[0:8], heads), "ln1": (w[8], w[9]),
        "t2i": _MHA(w[10:18], heads), "ln2": (w[18], w[19]),
    }
    if len(w) > _N_W2:
        out.update({
            "mlp": (w[20], w[21], w[22], w[23]), "ln3": (w[24], w[25]),
            "i2t": _MHA(w[26:34], heads), "ln4": (w[34], w[35]),
        })
    return out


def _load_inputs(x_ref, k0_ref, qpe_ref, kpe_ref, O, N, HW):
    cdt = x_ref.dtype
    C = x_ref.shape[-1]
    x = x_ref[0].reshape(O * N, C)
    K0 = k0_ref[0].reshape(O * HW, C)
    qpe = qpe_ref[0].reshape(O * N, C)
    kpe = jnp.broadcast_to(kpe_ref[None], (O,) + kpe_ref.shape) \
        .reshape(O * HW, C)
    return x, K0, qpe, K0 + kpe.astype(cdt), cdt


def _twoway_fwd_kernel(x_ref, k0_ref, qpe_ref, kpe_ref, *refs,
                       O: int, N: int, HW: int, heads: int, first: bool):
    w = _unpack_w(refs[:_N_W], heads)
    xout_ref, kout_ref = refs[_N_W], refs[_N_W + 1]
    T, S = O * N, O * HW
    x, K0, qpe, k_in, cdt = _load_inputs(x_ref, k0_ref, qpe_ref, kpe_ref,
                                         O, N, HW)
    allow_tt = _obj_mask(T, T, N, N) if O > 1 else None
    allow_ts = _obj_mask(T, S, N, HW) if O > 1 else None
    allow_st = _obj_mask(S, T, HW, N) if O > 1 else None

    # stage A: self-attention (first layer REPLACES queries, no pe)
    if first:
        pre1 = w["self"].fwd(x, x, x, allow_tt, cdt)
    else:
        q0 = x + qpe
        pre1 = x + w["self"].fwd(q0, q0, x, allow_tt, cdt)
    x1 = _ln32(pre1, *w["ln1"]).astype(cdt)

    # stage B: token -> image cross-attention
    pre2 = x1 + w["t2i"].fwd(x1 + qpe, k_in, K0, allow_ts, cdt)
    x2 = _ln32(pre2, *w["ln2"]).astype(cdt)

    # stage C: ReLU MLP
    w1, b1, w2, b2 = w["mlp"]
    h1 = _mm(x2, w1[...], b1[0], cdt)
    r = jnp.maximum(h1.astype(jnp.float32), 0.0).astype(cdt)
    pre3 = x2 + _mm(r, w2[...], b2[0], cdt)
    x3 = _ln32(pre3, *w["ln3"]).astype(cdt)

    # stage D: image -> token cross-attention (updates keys)
    pre4 = K0 + w["i2t"].fwd(k_in, x3 + qpe, x3, allow_st, cdt)
    K1 = _ln32(pre4, *w["ln4"]).astype(cdt)

    xout_ref[0] = x3.reshape(O, N, -1)
    kout_ref[0] = K1.reshape(O, HW, -1)


def _first_program():
    return (pl.program_id(0) == 0) & (pl.program_id(1) == 0)


def _twoway_bwd1_kernel(x_ref, k0_ref, qpe_ref, kpe_ref, *refs,
                        O: int, N: int, HW: int, heads: int, first: bool):
    """B1: recompute A/B/C; backward stage D (i2t) + stage C (MLP+LN3).
    Outputs: dx2_total, dk0 partial, dqpe partial, dkpe accumulator, and
    i2t/mlp/ln3/ln4 weight-grad accumulators."""
    w = _unpack_w(refs[:_N_W], heads)
    dx3_ref, dk1_ref = refs[_N_W], refs[_N_W + 1]
    (dx2_ref, dk0_ref, dqpe_ref, dkpe_acc,
     dwq4, dbq4, dwk4, dbk4, dwv4, dbv4, dwo4, dbo4,
     dw1, db1, dw2, db2, dln3w, dln3b, dln4w, dln4b) = refs[_N_W + 2:]
    accs = (dkpe_acc, dwq4, dbq4, dwk4, dbk4, dwv4, dbv4, dwo4, dbo4,
            dw1, db1, dw2, db2, dln3w, dln3b, dln4w, dln4b)

    @pl.when(_first_program())
    def _():
        for r_ in accs:
            r_[...] = jnp.zeros(r_.shape, r_.dtype)

    T, S = O * N, O * HW
    C = x_ref.shape[-1]
    x, K0, qpe, k_in, cdt = _load_inputs(x_ref, k0_ref, qpe_ref, kpe_ref,
                                         O, N, HW)
    allow_tt = _obj_mask(T, T, N, N) if O > 1 else None
    allow_ts = _obj_mask(T, S, N, HW) if O > 1 else None
    allow_st = _obj_mask(S, T, HW, N) if O > 1 else None

    # ---- recompute forward through C
    if first:
        pre1 = w["self"].fwd(x, x, x, allow_tt, cdt)
    else:
        q0 = x + qpe
        pre1 = x + w["self"].fwd(q0, q0, x, allow_tt, cdt)
    x1 = _ln32(pre1, *w["ln1"]).astype(cdt)
    pre2 = x1 + w["t2i"].fwd(x1 + qpe, k_in, K0, allow_ts, cdt)
    x2 = _ln32(pre2, *w["ln2"]).astype(cdt)
    w1, b1, w2, b2 = w["mlp"]
    h1 = _mm(x2, w1[...], b1[0], cdt)
    h1f = h1.astype(jnp.float32)
    r = jnp.maximum(h1f, 0.0).astype(cdt)
    pre3 = x2 + _mm(r, w2[...], b2[0], cdt)
    xhat3, rinv3 = _ln_fwd_parts(pre3)
    x3 = (xhat3 * w["ln3"][0][0].astype(jnp.float32)
          + w["ln3"][1][0].astype(jnp.float32)).astype(cdt)

    # ---- stage D backward: K1 = LN4(K0 + attn(q=k_in, k=x3+qpe, v=x3))
    q = x3 + qpe
    pre4 = K0 + w["i2t"].fwd(k_in, q, x3, allow_st, cdt)
    xhat4, rinv4 = _ln_fwd_parts(pre4)
    dk1 = dk1_ref[0].reshape(S, C).astype(jnp.float32)
    dln4w[...] += jnp.sum(dk1 * xhat4, 0, keepdims=True)
    dln4b[...] += jnp.sum(dk1, 0, keepdims=True)
    dpre4 = _ln_bwd(dk1, xhat4, rinv4, w["ln4"][0])
    dkin_d, dq_d, dx3_attn = w["i2t"].bwd(
        k_in, q, x3, allow_st, cdt, dpre4,
        dwq4, dbq4, dwk4, dbk4, dwv4, dbv4, dwo4, dbo4)
    dk0 = dpre4 + dkin_d
    dkpe_acc[...] += jnp.sum(dkin_d.reshape(O, HW, C), axis=0)
    dx3 = dx3_ref[0].reshape(T, C).astype(jnp.float32) + dq_d + dx3_attn

    # ---- stage C backward (MLP + LN3)
    dln3w[...] += jnp.sum(dx3 * xhat3, 0, keepdims=True)
    dln3b[...] += jnp.sum(dx3, 0, keepdims=True)
    dpre3 = _ln_bwd(dx3, xhat3, rinv3, w["ln3"][0])
    dpre3c = dpre3.astype(cdt)
    db2[...] += jnp.sum(dpre3, 0, keepdims=True)
    dw2[...] += _dot(dpre3c, r, ((0,), (0,)))
    dr = _dot(dpre3c, w2[...], ((1,), (0,)))
    dh1 = jnp.where(h1f > 0, dr, 0.0)
    dh1c = dh1.astype(cdt)
    db1[...] += jnp.sum(dh1, 0, keepdims=True)
    dw1[...] += _dot(dh1c, x2, ((0,), (0,)))
    dx2 = dpre3 + _dot(dh1c, w1[...], ((1,), (0,)))

    dx2_ref[0] = dx2.astype(dx2_ref.dtype).reshape(O, N, C)
    dk0_ref[0] = dk0.astype(dk0_ref.dtype).reshape(O, HW, C)
    dqpe_ref[0] = dq_d.reshape(O, N, C)


def _twoway_bwd2_kernel(x_ref, k0_ref, qpe_ref, kpe_ref, *refs,
                        O: int, N: int, HW: int, heads: int, first: bool):
    """B2: recompute A; backward stage B (t2i+LN2) + stage A (self+LN1)
    from dx2_total; adds its dK0/dkpe/dqpe contributions."""
    w = _unpack_w(refs[:_N_W2], heads)
    dx2_ref, dk0in_ref, dqpe_in_ref = (refs[_N_W2], refs[_N_W2 + 1],
                                       refs[_N_W2 + 2])
    (dx_ref, dk0_ref, dqpe_ref, dkpe_acc,
     dwqs, dbqs, dwks, dbks, dwvs, dbvs, dwos, dbos,
     dwq2, dbq2, dwk2, dbk2, dwv2, dbv2, dwo2, dbo2,
     dln1w, dln1b, dln2w, dln2b) = refs[_N_W2 + 3:]
    accs = (dkpe_acc, dwqs, dbqs, dwks, dbks, dwvs, dbvs, dwos, dbos,
            dwq2, dbq2, dwk2, dbk2, dwv2, dbv2, dwo2, dbo2,
            dln1w, dln1b, dln2w, dln2b)

    @pl.when(_first_program())
    def _():
        for r_ in accs:
            r_[...] = jnp.zeros(r_.shape, r_.dtype)

    T, S = O * N, O * HW
    C = x_ref.shape[-1]
    x, K0, qpe, k_in, cdt = _load_inputs(x_ref, k0_ref, qpe_ref, kpe_ref,
                                         O, N, HW)
    allow_tt = _obj_mask(T, T, N, N) if O > 1 else None
    allow_ts = _obj_mask(T, S, N, HW) if O > 1 else None

    # ---- recompute stage A
    if first:
        pre1 = w["self"].fwd(x, x, x, allow_tt, cdt)
    else:
        q0 = x + qpe
        pre1 = x + w["self"].fwd(q0, q0, x, allow_tt, cdt)
    xhat1, rinv1 = _ln_fwd_parts(pre1)
    x1 = (xhat1 * w["ln1"][0][0].astype(jnp.float32)
          + w["ln1"][1][0].astype(jnp.float32)).astype(cdt)

    # ---- stage B backward (t2i + LN2)
    q = x1 + qpe
    pre2 = x1 + w["t2i"].fwd(q, k_in, K0, allow_ts, cdt)
    xhat2, rinv2 = _ln_fwd_parts(pre2)
    dx2 = dx2_ref[0].reshape(T, C).astype(jnp.float32)
    dln2w[...] += jnp.sum(dx2 * xhat2, 0, keepdims=True)
    dln2b[...] += jnp.sum(dx2, 0, keepdims=True)
    dpre2 = _ln_bwd(dx2, xhat2, rinv2, w["ln2"][0])
    dq_b, dkin_b, dv_b = w["t2i"].bwd(
        q, k_in, K0, allow_ts, cdt, dpre2,
        dwq2, dbq2, dwk2, dbk2, dwv2, dbv2, dwo2, dbo2)
    dx1 = dpre2 + dq_b
    dqpe = dqpe_in_ref[0].reshape(T, C).astype(jnp.float32) + dq_b
    dk0 = dk0in_ref[0].reshape(S, C).astype(jnp.float32) + dkin_b + dv_b
    dkpe_acc[...] += jnp.sum(dkin_b.reshape(O, HW, C), axis=0)

    # ---- stage A backward (self + LN1)
    dln1w[...] += jnp.sum(dx1 * xhat1, 0, keepdims=True)
    dln1b[...] += jnp.sum(dx1, 0, keepdims=True)
    dpre1 = _ln_bwd(dx1, xhat1, rinv1, w["ln1"][0])
    if first:
        dq0, dk0q, dv0 = w["self"].bwd(
            x, x, x, allow_tt, cdt, dpre1,
            dwqs, dbqs, dwks, dbks, dwvs, dbvs, dwos, dbos)
        dx = dq0 + dk0q + dv0
    else:
        q0 = x + qpe
        dq0, dk0q, dv0 = w["self"].bwd(
            q0, q0, x, allow_tt, cdt, dpre1,
            dwqs, dbqs, dwks, dbks, dwvs, dbvs, dwos, dbos)
        dq0t = dq0 + dk0q
        dx = dpre1 + dq0t + dv0
        dqpe = dqpe + dq0t

    dx_ref[0] = dx.astype(dx_ref.dtype).reshape(O, N, C)
    dk0_ref[0] = dk0.astype(dk0_ref.dtype).reshape(O, HW, C)
    dqpe_ref[0] = dqpe.reshape(O, N, C)


# ---------------------------------------------------------------------------
# Drivers + custom VJP
# ---------------------------------------------------------------------------


def _f32row(a):
    return a.astype(jnp.float32)[None]


def _mha_operands(p, heads, cdt):
    """[wq, bq, wk, bk, wv, bv, wo, bo] per-head stacks from an _attn_init
    param dict."""
    def stack_in(lin):
        wgt = lin["weight"]  # [internal, C]
        internal, C = wgt.shape
        hd = internal // heads
        return [wgt.reshape(heads, hd, C).astype(cdt),
                lin["bias"].reshape(heads, 1, hd).astype(jnp.float32)]

    wo = p["out_proj"]["weight"]  # [C, internal]
    C, internal = wo.shape
    hd = internal // heads
    wo_stack = wo.reshape(C, heads, hd).transpose(1, 0, 2).astype(cdt)
    return (stack_in(p["q_proj"]) + stack_in(p["k_proj"])
            + stack_in(p["v_proj"])
            + [wo_stack, _f32row(p["out_proj"]["bias"])])


def _block_operands(p, heads, cdt):
    """The _N_W kernel weight operands from a _twoway_block_init dict."""
    return (
        _mha_operands(p["self_attn"], heads, cdt)
        + [_f32row(p["norm1"]["weight"]), _f32row(p["norm1"]["bias"])]
        + _mha_operands(p["cross_attn_token_to_image"], heads, cdt)
        + [_f32row(p["norm2"]["weight"]), _f32row(p["norm2"]["bias"])]
        + [p["mlp"]["layers"]["0"]["weight"].astype(cdt),
           _f32row(p["mlp"]["layers"]["0"]["bias"]),
           p["mlp"]["layers"]["1"]["weight"].astype(cdt),
           _f32row(p["mlp"]["layers"]["1"]["bias"])]
        + [_f32row(p["norm3"]["weight"]), _f32row(p["norm3"]["bias"])]
        + _mha_operands(p["cross_attn_image_to_token"], heads, cdt)
        + [_f32row(p["norm4"]["weight"]), _f32row(p["norm4"]["bias"])]
    )


def _unpack_mha_grads(grads, like, heads):
    """Per-head grad stacks -> _attn_init-shaped param grads."""
    wq, bq, wk, bk, wv, bv, wo, bo = grads

    def lin_in(w, b, like_lin):
        internal, C = like_lin["weight"].shape
        return {"weight": w.reshape(internal, C).astype(
                    like_lin["weight"].dtype),
                "bias": b.reshape(internal).astype(like_lin["bias"].dtype)}

    C = like["out_proj"]["weight"].shape[0]
    wo_g = wo.transpose(1, 0, 2).reshape(C, -1)
    return {
        "q_proj": lin_in(wq, bq, like["q_proj"]),
        "k_proj": lin_in(wk, bk, like["k_proj"]),
        "v_proj": lin_in(wv, bv, like["v_proj"]),
        "out_proj": {"weight": wo_g.astype(like["out_proj"]["weight"].dtype),
                     "bias": bo[0].astype(like["out_proj"]["bias"].dtype)},
    }


def _ln_grad(w, b, like):
    return {"weight": w[0].astype(like["weight"].dtype),
            "bias": b[0].astype(like["bias"].dtype)}


def _rows3(Og, L, D):
    return pl.BlockSpec((1, Og, L, D), lambda g, j: (g, j, 0, 0))


def _wspec(a):
    return pl.BlockSpec(a.shape, lambda g, j, _nd=a.ndim: (0,) * _nd)


def _acc(shape):
    return (pl.BlockSpec(shape, lambda g, j, _nd=len(shape): (0,) * _nd),
            jax.ShapeDtypeStruct(shape, jnp.float32))


def _mha_acc_shapes(C, internal, heads):
    hd = internal // heads
    return [(heads, hd, C), (heads, 1, hd)] * 3 + [(heads, C, hd), (1, C)]


def _bwd_bytes(Og, N, HW, C, mlp_dim, downsample):
    """Rough resident-byte bound of the heavier backward program (B1):
    keys-side bf16 activations + f32 cotangents + dense logits (p/dp) +
    weights + f32 grad accumulators."""
    T, S = Og * N, Og * HW
    logits = 3 * 4 * T * S + T * S          # p32/dp f32 + bool mask
    keys_side = 10 * S * C                   # K0/k_in/dk1/dk0/dkin_d mix
    wbytes = 2 * (4 * C * C + 2 * mlp_dim * C + 8 * C * C // downsample)
    accs = 4 * (2 * mlp_dim * C + 2 * C * C // downsample + HW * C + 8 * C)
    return logits + keys_side + wbytes + accs


def _pick_group(O, N, HW, C, mlp_dim, downsample,
                budget=15 * 1024 * 1024 + 512 * 1024):
    # budget calibrated on hardware: Og=8 at 384px measured 28.3 MB scoped
    # vmem in B2 (OOM over the 24 MB limit); Og=4 fits. The byte model
    # under-counts Mosaic's stack copies by ~20%, hence the conservative
    # budget.
    """Largest divisor of O whose backward program fits the VMEM budget
    (the dense-mask trick wants as many objects per program as possible —
    more rows per dot)."""
    for og in range(O, 0, -1):
        if O % og:
            continue
        if _bwd_bytes(og, N, HW, C, mlp_dim, downsample) <= budget:
            return og
    return 0


@functools.lru_cache(maxsize=None)
def _make_block(heads, first, interpret):
    @jax.custom_vjp
    def block(p, queries, keys, qpe, kpe):
        return _fwd(p, queries, keys, qpe, kpe)

    def fwd(p, queries, keys, qpe, kpe):
        return _fwd(p, queries, keys, qpe, kpe), (p, queries, keys, qpe, kpe)

    def bwd(saved, cots):
        return _bwd(*saved, *cots)

    def _specs(p, queries, keys, qpe, kpe, bwd=False):
        G, O, N, C = queries.shape
        HW = keys.shape[2]
        cdt = queries.dtype
        mlp_dim = p["mlp"]["layers"]["0"]["weight"].shape[0]
        ds = C // p["cross_attn_token_to_image"]["q_proj"]["weight"].shape[0]
        # the backward programs hold ~3x the forward's S-sized f32 state
        # (LN xhats, cotangents, input-grad accumulators) — measured on
        # hardware: B1 at Og=4 hit 36.6 MB inside the full step, Og=2 fits
        budget = ((11 * 1024 + 512) * 1024 if bwd
                  else 15 * 1024 * 1024 + 512 * 1024)
        Og = _pick_group(O, N, HW, C, mlp_dim, max(ds, 1), budget=budget)
        operands = _block_operands(p, heads, cdt)
        in_specs = [_rows3(Og, N, C), _rows3(Og, HW, C), _rows3(Og, N, C),
                    _wspec(kpe)] + [_wspec(a) for a in operands]
        kw = dict(O=Og, N=N, HW=HW, heads=heads, first=first)
        grid = (G, O // Og)
        return G, O, Og, N, C, HW, cdt, operands, in_specs, kw, grid

    def _fwd(p, queries, keys, qpe, kpe):
        (G, O, Og, N, C, HW, cdt, operands, in_specs, kw,
         grid) = _specs(p, queries, keys, qpe, kpe)
        out, kout = pl.pallas_call(
            functools.partial(_twoway_fwd_kernel, **kw),
            grid=grid,
            in_specs=in_specs,
            out_specs=(_rows3(Og, N, C), _rows3(Og, HW, C)),
            out_shape=(jax.ShapeDtypeStruct((G, O, N, C), cdt),
                       jax.ShapeDtypeStruct((G, O, HW, C), cdt)),
            interpret=_run_interp(interpret),
            compiler_params=_COMPILER_PARAMS,
        )(queries, keys, qpe, kpe, *operands)
        return out, kout

    def _bwd(p, queries, keys, qpe, kpe, dx3, dk1):
        (G, O, Og, N, C, HW, cdt, operands, in_specs, kw,
         grid) = _specs(p, queries, keys, qpe, kpe, bwd=True)
        internal_s = p["self_attn"]["q_proj"]["weight"].shape[0]
        internal_x = \
            p["cross_attn_token_to_image"]["q_proj"]["weight"].shape[0]
        Hd = p["mlp"]["layers"]["0"]["weight"].shape[0]

        # ---- B1: i2t + mlp (+ln3/ln4) grads, dx2/dk0/dqpe partials
        accs1 = [_acc(s) for s in
                 [(HW, C)] + _mha_acc_shapes(C, internal_x, heads)
                 + [(Hd, C), (1, Hd), (C, Hd), (1, C),
                    (1, C), (1, C), (1, C), (1, C)]]
        outs1 = pl.pallas_call(
            functools.partial(_twoway_bwd1_kernel, **kw),
            grid=grid,
            in_specs=in_specs + [_rows3(Og, N, C), _rows3(Og, HW, C)],
            out_specs=(_rows3(Og, N, C), _rows3(Og, HW, C),
                       _rows3(Og, N, C))
            + tuple(s for s, _ in accs1),
            out_shape=(jax.ShapeDtypeStruct((G, O, N, C), jnp.float32),
                       jax.ShapeDtypeStruct((G, O, HW, C), cdt),
                       jax.ShapeDtypeStruct((G, O, N, C), jnp.float32))
            + tuple(sh for _, sh in accs1),
            interpret=_run_interp(interpret),
            compiler_params=_COMPILER_PARAMS,
        )(queries, keys, qpe, kpe, *operands, dx3, dk1)
        dx2, dk0_part, dqpe_part = outs1[0], outs1[1], outs1[2]
        dkpe1 = outs1[3]
        g_i2t = outs1[4:12]
        dw1, db1, dw2, db2, dln3w, dln3b, dln4w, dln4b = outs1[12:20]

        # ---- B2: self + t2i (+ln1/ln2) grads, final dx/dk0/dqpe
        accs2 = [_acc(s) for s in
                 [(HW, C)] + _mha_acc_shapes(C, internal_s, heads)
                 + _mha_acc_shapes(C, internal_x, heads)
                 + [(1, C), (1, C), (1, C), (1, C)]]
        outs2 = pl.pallas_call(
            functools.partial(_twoway_bwd2_kernel, **kw),
            grid=grid,
            in_specs=in_specs[:4 + _N_W2]
            + [_rows3(Og, N, C), _rows3(Og, HW, C), _rows3(Og, N, C)],
            out_specs=(_rows3(Og, N, C), _rows3(Og, HW, C),
                       _rows3(Og, N, C))
            + tuple(s for s, _ in accs2),
            out_shape=(jax.ShapeDtypeStruct((G, O, N, C), cdt),
                       jax.ShapeDtypeStruct((G, O, HW, C), cdt),
                       jax.ShapeDtypeStruct((G, O, N, C), jnp.float32))
            + tuple(sh for _, sh in accs2),
            interpret=_run_interp(interpret),
            compiler_params=_COMPILER_PARAMS,
        )(queries, keys, qpe, kpe, *operands[:_N_W2],
          dx2, dk0_part, dqpe_part)
        dx, dk0, dqpe = outs2[0], outs2[1], outs2[2]
        dkpe2 = outs2[3]
        g_self = outs2[4:12]
        g_t2i = outs2[12:20]
        dln1w, dln1b, dln2w, dln2b = outs2[20:24]

        dp = {
            "self_attn": _unpack_mha_grads(g_self, p["self_attn"], heads),
            "cross_attn_token_to_image": _unpack_mha_grads(
                g_t2i, p["cross_attn_token_to_image"], heads),
            "cross_attn_image_to_token": _unpack_mha_grads(
                g_i2t, p["cross_attn_image_to_token"], heads),
            "mlp": {"layers": {
                "0": {"weight": dw1.astype(
                          p["mlp"]["layers"]["0"]["weight"].dtype),
                      "bias": db1[0].astype(
                          p["mlp"]["layers"]["0"]["bias"].dtype)},
                "1": {"weight": dw2.astype(
                          p["mlp"]["layers"]["1"]["weight"].dtype),
                      "bias": db2[0].astype(
                          p["mlp"]["layers"]["1"]["bias"].dtype)},
            }},
            "norm1": _ln_grad(dln1w, dln1b, p["norm1"]),
            "norm2": _ln_grad(dln2w, dln2b, p["norm2"]),
            "norm3": _ln_grad(dln3w, dln3b, p["norm3"]),
            "norm4": _ln_grad(dln4w, dln4b, p["norm4"]),
        }
        return (dp, dx, dk0, dqpe.astype(qpe.dtype),
                (dkpe1 + dkpe2).astype(kpe.dtype))

    block.defvjp(fwd, bwd)
    return block


def fused_twoway_block(p, queries, keys, qpe, kpe, first: bool,
                       heads: int = 8, interpret: bool = False):
    """Differentiable fused two-way attention block.

    p: models/mask_decoder._twoway_block_init param dict.
    queries [G, O, N, C], keys [G, O, HW, C], qpe [G, O, N, C] (the
    original point embedding, re-added as pe at every stage),
    kpe [HW, C] (image PE, shared across objects and batch).
    Returns (queries' [G, O, N, C], keys' [G, O, HW, C])."""
    return _make_block(heads, bool(first), bool(interpret))(
        p, queries, keys, qpe, kpe)


def fused_twoway_eligible(cfg, O: int, N: int, HW: int,
                          interpret: bool = False) -> bool:
    """The fused block covers the SAM decoder geometry: lane-aligned
    transformer dim, head-divisible internal dims, and SOME object group
    size whose backward program fits the VMEM budget (the driver tiles the
    object axis across the grid, so even Og=1 must fit)."""
    if not (interpret or INTERPRET
            or jax.default_backend() in ("tpu", "axon")):
        return False
    C = cfg.transformer_dim
    if C % 128 != 0:
        return False
    h = cfg.transformer_num_heads
    internal = C // cfg.attention_downsample_rate
    if h < 1 or C % h != 0 or internal % h != 0:
        return False
    return _pick_group(O, N, HW, C, cfg.transformer_mlp_dim,
                       cfg.attention_downsample_rate) > 0
