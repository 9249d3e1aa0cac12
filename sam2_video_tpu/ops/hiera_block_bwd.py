"""Backward pass for the fused Hiera transformer-block kernel — makes the
fused trunk differentiable so encoder-trainable fine-tuning combos (the
reference's ``md+pe+ie`` / ``mem+md+pe+ie`` sets,
/root/reference/notebooks/performance_table_report.md:14-17) run the fast
trunk in BOTH directions instead of falling back to the XLA path.

Design (flash-attention style in-kernel recompute, split in two programs so
each stays inside VMEM):

- The forward (``hiera_block_kernel.fused_block(save_residual=True)``) saves
  ONE extra tensor per block: the post-attention residual ``x1`` on the
  padded pooled grid. That is the cheapest cut point — everything after it
  (LN2 + MLP) and everything before it (LN1 + windowed attention + shortcut)
  can each be recomputed band-locally from a single saved activation.
- Kernel B1 (``_mlp_bwd_kernel``): from (x1, dy) recompute LN2/MLP forward
  in VMEM and emit dx1 plus the LN2/MLP weight grads.
- Kernel B2 (``_attn_bwd_kernel``): from (x, dx1) recompute LN1 + per-head
  windowed attention and emit dx plus the LN1/qkv/proj/shortcut grads.

Weight gradients accumulate in f32 across the whole (image, band) grid into
outputs whose index map is constant — the TPU grid is sequential, so the
accumulator block lives in VMEM for the entire sweep and is written to HBM
once (Pallas revisited-block semantics). dy is zero-padded to the padded
grid, which reproduces the XLA semantics exactly: pad *queries* contribute
nothing anywhere, pad *keys* (k = bias, v = bias after the in-kernel re-zero
of normalized pads) receive dk/dv from real queries and flow into the qkv
bias grads, exactly as autodiff through the reference's post-norm F.pad
(hieradet.py window_partition) does. Max-pool (q-pool + dim-change shortcut)
backward routes to the first maximal element of each 2x2 cell; ties are
measure-zero on real activations and pad-region routing is invisible (the
sum over a cell is conserved and pad dx is discarded).

Parity: tests/test_hiera_fused.py compares values AND grads (w.r.t. params
and input) against XLA autodiff of models/hiera.py _block in interpret mode
per geometry class.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import hiera_block_kernel as hbk
from .hiera_block_kernel import (_NEG_INF, _f32row, _geometry, _ln_f32, _mm,
                                 _pack_operands, _pool2x2_rows_cols)
from .memory_encoder_kernel import _erf_f32, _gelu_f32

# resident-byte ceiling for the attention-backward program (VMEM is ~16 MB;
# leave headroom for Mosaic's own double-buffering of the banded refs)
_BWD_VMEM_BUDGET = 13 * 1024 * 1024

# the MLP backward holds ~6 chunk-sized f32/bf16 intermediates at once
# (a/af/h/dh/da/dac) on top of the w1/w2 residents and the f32 dw1/dw2
# accumulators — at the forward's 512 chunk the global stage-3 blocks
# overflow the 16 MB scoped VMEM by ~150 KB, so the backward halves it
_BWD_HIDDEN_CHUNK = 256

# XLA's default scoped-VMEM cap is 16 MB — a reservation policy, not the
# hardware (v5e VMEM is 128 MB/core). The stage-3 MLP backward sits at
# ~16.1 MB resident (f32 dw1+dw2 accumulators + w1/w2 + chunk
# intermediates), so both backward programs get an explicit 24 MB cap.
_BWD_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=24 * 1024 * 1024)

_INV_SQRT2 = np.float32(1.0 / np.sqrt(2.0))
_INV_SQRT2PI = np.float32(1.0 / np.sqrt(2.0 * np.pi))


def _gelu_grad_f32(x):
    """d/dx of exact-erf GELU: Phi(x) + x * phi(x), f32."""
    phi_cdf = 0.5 * (1.0 + _erf_f32(x * _INV_SQRT2))
    return phi_cdf + x * jnp.exp(-0.5 * x * x) * _INV_SQRT2PI


def _unpool2x2_rows_cols(vals, d_pooled):
    """VJP of _pool2x2_rows_cols. vals [H, W, C] (pre-pool values, compute
    dtype), d_pooled [H/2, W/2, C] f32 -> routed [H, W, C] f32. Gradient goes
    to the first maximal element of each pair (row pair, then column pair) —
    all-equal 2x2 cells route to (0, 0), like XLA select_and_scatter.
    Comparisons run in f32 — Mosaic has no packed-bf16 cmpf."""
    H, W, C = vals.shape
    a = vals.astype(jnp.float32).reshape(H // 2, 2, W, C)
    a0, a1 = a[:, 0], a[:, 1]
    rmax = jnp.maximum(a0, a1)                       # [H/2, W, C]
    t = jnp.swapaxes(rmax, 0, 1)                     # [W, H/2, C]
    b = t.reshape(W // 2, 2, H // 2, C)
    b0, b1 = b[:, 0], b[:, 1]
    d_sw = jnp.swapaxes(d_pooled, 0, 1)              # [W/2, H/2, C]
    db0 = jnp.where(b0 >= b1, d_sw, 0.0)
    db1 = d_sw - db0
    dt = jnp.concatenate([db0[:, None], db1[:, None]], 1).reshape(
        W, H // 2, C)
    dr = jnp.swapaxes(dt, 0, 1)                      # [H/2, W, C]
    da0 = jnp.where(a0 >= a1, dr, 0.0)
    da1 = dr - da0
    return jnp.concatenate([da0[:, None], da1[:, None]], 1).reshape(H, W, C)


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Kernel B1: LN2 + MLP backward (pooled-grid bands)
# ---------------------------------------------------------------------------


def _mlp_bwd_kernel(x1_ref, g_ref, ln2w_ref, ln2b_ref, w1_ref, b1_ref, w2_ref,
                    dx1_ref, dlnw_ref, dlnb_ref, dw1_ref, db1_ref, dw2_ref,
                    db2_ref, *, hidden_chunk: int):
    cdt = x1_ref.dtype
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        for r in (dlnw_ref, dlnb_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
            r[...] = jnp.zeros(r.shape, r.dtype)

    _, bh2, ow, C = x1_ref.shape
    T2 = bh2 * ow
    x1 = x1_ref[0].reshape(T2, C)
    g = g_ref[0].reshape(T2, C)

    # LN2 forward recompute (f32 moments, matching models/hiera layer_norm)
    xf = x1.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, -1, keepdims=True)
    r_inv = jax.lax.rsqrt(var + 1e-6)
    xhat = xc * r_inv
    wln = ln2w_ref[0].astype(jnp.float32)
    y = (xhat * wln + ln2b_ref[0].astype(jnp.float32)).astype(cdt)

    Hd = w1_ref.shape[0]
    dyln = jnp.zeros((T2, C), jnp.float32)
    for lo in range(0, Hd, hidden_chunk):
        hi = min(lo + hidden_chunk, Hd)
        a = _mm(y, w1_ref[lo:hi, :], None, cdt) \
            + b1_ref[0, lo:hi].astype(cdt)                     # [T2, ch]
        af = a.astype(jnp.float32)
        h = _gelu_f32(af).astype(cdt)
        dh = _dot(g, w2_ref[:, lo:hi], ((1,), (0,)))           # [T2, ch] f32
        da = dh * _gelu_grad_f32(af)
        dac = da.astype(cdt)
        db1_ref[:, lo:hi] += jnp.sum(da, 0, keepdims=True)
        dw1_ref[lo:hi, :] += _dot(dac, y, ((0,), (0,)))        # [ch, C]
        dw2_ref[:, lo:hi] += _dot(g, h, ((0,), (0,)))          # [C, ch]
        dyln = dyln + _dot(dac, w1_ref[lo:hi, :], ((1,), (0,)))
    db2_ref[...] += jnp.sum(g.astype(jnp.float32), 0, keepdims=True)

    dlnw_ref[...] += jnp.sum(dyln * xhat, 0, keepdims=True)
    dlnb_ref[...] += jnp.sum(dyln, 0, keepdims=True)
    dxh = dyln * wln
    dx1_ln = r_inv * (dxh - jnp.mean(dxh, -1, keepdims=True)
                      - xhat * jnp.mean(dxh * xhat, -1, keepdims=True))
    dx1 = (g.astype(jnp.float32) + dx1_ln).astype(cdt)
    dx1_ref[0] = dx1.reshape(bh2, ow, C)


# ---------------------------------------------------------------------------
# Kernel B2: LN1 + attention + shortcut backward (input-grid bands)
# ---------------------------------------------------------------------------


def _attn_bwd_kernel(x_ref, dz_ref, ln1w_ref, ln1b_ref, wq_ref, bq_ref,
                     wk_ref, bk_ref, wv_ref, bv_ref, wp_ref, sc_refs,
                     dx_ref, dlnw_ref, dlnb_ref, dwq_ref, dbq_ref,
                     dwk_ref, dbk_ref, dwv_ref, dbv_ref, dwp_ref, dbp_ref,
                     dsc_refs, *, ws: int, heads: int, q_pool: bool,
                     H: int, W: int):
    cdt = x_ref.dtype
    j = pl.program_id(1)
    _, bh, Wp, Cin = x_ref.shape
    hd = wq_ref.shape[1]
    Cout = wp_ref.shape[1]
    scale = jnp.float32(1.0 / math.sqrt(hd))

    accs = (dlnw_ref, dlnb_ref, dwq_ref, dbq_ref, dwk_ref, dbk_ref,
            dwv_ref, dbv_ref, dwp_ref, dbp_ref) + tuple(dsc_refs)

    @pl.when((pl.program_id(0) == 0) & (j == 0))
    def _():
        for r in accs:
            r[...] = jnp.zeros(r.shape, r.dtype)

    # ---- forward recompute up to q/k/v (same walk as _block_kernel)
    x = x_ref[0]                                      # [bh, Wp, Cin]
    xn32 = _ln_f32(x, ln1w_ref[0], ln1b_ref[0])
    padded = (H % bh != 0) or (Wp != W)
    if padded:
        row0 = j * bh
        gr = row0 + jax.lax.broadcasted_iota(jnp.int32, (bh, Wp, 1), 0)
        gc = jax.lax.broadcasted_iota(jnp.int32, (bh, Wp, 1), 1)
        keep = (gr < H) & (gc < W)
        xn32 = jnp.where(keep, xn32, 0.0)
    xn = xn32.astype(cdt)
    flat = xn.reshape(bh * Wp, Cin)

    if q_pool:
        bh_out, out_w, wq_sz = bh // 2, Wp // 2, ws // 2
    else:
        bh_out, out_w, wq_sz = bh, Wp, ws
    T = bh * Wp
    Tq = bh_out * out_w

    gz = dz_ref[0]                                    # [bh_out, out_w, Cout]
    gp = gz.reshape(Tq, Cout)
    dbp_ref[...] += jnp.sum(gp.astype(jnp.float32), 0, keepdims=True)

    masked = (bh > ws) or (Wp > ws)
    if masked:
        tq = jax.lax.broadcasted_iota(jnp.int32, (Tq, T), 0)
        tk = jax.lax.broadcasted_iota(jnp.int32, (Tq, T), 1)
        qwin = (tq // out_w // wq_sz) * (out_w // wq_sz) \
            + (tq % out_w) // wq_sz
        kwin = (tk // Wp // ws) * (Wp // ws) + (tk % Wp) // ws
        allow = qwin == kwin

    dxn32 = jnp.zeros((T, Cin), jnp.float32)
    for h in range(heads):
        qh = _mm(flat, wq_ref[h], bq_ref[h], cdt)     # [T, hd]
        kh = _mm(flat, wk_ref[h], bk_ref[h], cdt)
        vh = _mm(flat, wv_ref[h], bv_ref[h], cdt)
        if q_pool:
            qfull = qh.reshape(bh, Wp, hd)
            qp = _pool2x2_rows_cols(qfull).reshape(Tq, hd)
        else:
            qp = qh
        sl = _dot(qp, kh, ((1,), (1,))) * scale       # [Tq, T] f32
        if masked:
            sl = jnp.where(allow, sl, _NEG_INF)
        m = jnp.max(sl, -1, keepdims=True)
        e = jnp.exp(sl - m)
        p32 = e / jnp.sum(e, -1, keepdims=True)
        pc = p32.astype(cdt)

        oh = _dot(pc, vh, ((1,), (0,))).astype(cdt)   # [Tq, hd]
        dwp_ref[h] += _dot(gp, oh, ((0,), (0,)))      # [Cout, hd]
        doh = _dot(gp, wp_ref[h], ((1,), (0,))).astype(cdt)   # [Tq, hd]
        dv32 = _dot(pc, doh, ((0,), (0,)))            # [T, hd]
        dp = _dot(doh, vh, ((1,), (1,)))              # [Tq, T] f32
        dsl = p32 * (dp - jnp.sum(dp * p32, -1, keepdims=True))
        dslc = (dsl * scale).astype(cdt)
        dqp32 = _dot(dslc, kh, ((1,), (0,)))          # [Tq, hd]
        dk32 = _dot(dslc, qp, ((0,), (0,)))           # [T, hd]
        if q_pool:
            dq32 = _unpool2x2_rows_cols(
                qfull, dqp32.reshape(bh_out, out_w, hd)).reshape(T, hd)
        else:
            dq32 = dqp32
        for dval, dw_ref, db_ref, w_ref in (
                (dq32, dwq_ref, dbq_ref, wq_ref),
                (dk32, dwk_ref, dbk_ref, wk_ref),
                (dv32, dwv_ref, dbv_ref, wv_ref)):
            dc = dval.astype(cdt)
            dw_ref[h] += _dot(dc, flat, ((0,), (0,)))  # [hd, Cin]
            db_ref[h] += jnp.sum(dval, 0, keepdims=True)
            dxn32 = dxn32 + _dot(dc, w_ref[h], ((1,), (0,)))

    # ---- shortcut path
    dres = None
    if sc_refs:
        wsc_ref, bsc_ref = sc_refs
        dwsc_ref, dbsc_ref = dsc_refs
        spre = _mm(flat, wsc_ref[...], bsc_ref[0], cdt).reshape(bh, Wp, Cout)
        if q_pool:
            dsp32 = _unpool2x2_rows_cols(
                spre, gz.astype(jnp.float32)).reshape(T, Cout)
        else:
            dsp32 = gp.astype(jnp.float32)
        dspc = dsp32.astype(cdt)
        dwsc_ref[...] += _dot(dspc, flat, ((0,), (0,)))  # [Cout, Cin]
        dbsc_ref[...] += jnp.sum(dsp32, 0, keepdims=True)
        dxn32 = dxn32 + _dot(dspc, wsc_ref[...], ((1,), (0,)))
    else:
        dres = gz                                     # same grid, Cin == Cout

    # ---- LN1 backward
    dxn = dxn32.reshape(bh, Wp, Cin)
    if padded:
        dxn = jnp.where(keep, dxn, 0.0)
    dxn = dxn.reshape(T, Cin)
    xf = x.reshape(T, Cin).astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, -1, keepdims=True)
    r_inv = jax.lax.rsqrt(var + 1e-6)
    xhat = xc * r_inv
    wln = ln1w_ref[0].astype(jnp.float32)
    dlnw_ref[...] += jnp.sum(dxn * xhat, 0, keepdims=True)
    dlnb_ref[...] += jnp.sum(dxn, 0, keepdims=True)
    dxh = dxn * wln
    dx32 = r_inv * (dxh - jnp.mean(dxh, -1, keepdims=True)
                    - xhat * jnp.mean(dxh * xhat, -1, keepdims=True))
    if dres is not None:
        dx32 = dx32 + dres.reshape(T, Cin).astype(jnp.float32)
    dx_ref[0] = dx32.astype(cdt).reshape(bh, Wp, Cin)


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


def _acc_spec(shape):
    """Constant-index accumulator output: one block covering the array,
    revisited by every grid program (TPU grids are sequential)."""
    return (pl.BlockSpec(shape, lambda b, j, _nd=len(shape): (0,) * _nd),
            jax.ShapeDtypeStruct(shape, jnp.float32))


def _bwd_pallas(spec, q_stride, mlp_ratio, interpret, p, x, x1, g):
    """dy -> (param-grad tree, dx) via the B1 + B2 kernels."""
    B, H, W, Cin = x.shape
    heads = spec["num_heads"]
    q_pool = spec["q_pool"]
    Cout = spec["dim_out"]
    hd = Cout // heads
    cdt = x.dtype
    run_interp = (interpret or hbk.INTERPRET
                  or jax.default_backend() == "cpu")

    (ws_eff, Hp, Wp, band_rows, n_bands,
     bh_out, out_w, H_out_p) = _geometry(spec, H, W)
    if Hp != H or Wp != W:
        x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
    if g.shape[1] != H_out_p or g.shape[2] != out_w:
        g = jnp.pad(g, ((0, 0), (0, H_out_p - g.shape[1]),
                        (0, out_w - g.shape[2]), (0, 0)))

    operands, n_sc = _pack_operands(p, spec, cdt)
    mlp_p = p["mlp"]["layers"]
    Hd = mlp_p["0"]["weight"].shape[0]

    def wspec(a):
        return pl.BlockSpec(a.shape, lambda b, j, _nd=a.ndim: (0,) * _nd)

    pooled_spec = pl.BlockSpec((1, bh_out, out_w, Cout),
                               lambda b, j: (b, j, 0, 0))

    # ---- B1: LN2 + MLP (b2 is not needed — its grad is just sum(dy))
    ops1 = operands[10:15]                 # ln2w, ln2b, w1, b1, w2
    acc1 = [_acc_spec(s) for s in
            ((1, Cout), (1, Cout), (Hd, Cout), (1, Hd), (Cout, Hd),
             (1, Cout))]
    outs1 = pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, hidden_chunk=_BWD_HIDDEN_CHUNK),
        grid=(B, n_bands),
        in_specs=[pooled_spec, pooled_spec] + [wspec(a) for a in ops1],
        out_specs=(pooled_spec,) + tuple(s for s, _ in acc1),
        out_shape=(jax.ShapeDtypeStruct((B, H_out_p, out_w, Cout), cdt),)
        + tuple(sh for _, sh in acc1),
        interpret=run_interp,
        compiler_params=_BWD_COMPILER_PARAMS,
    )(x1, g, *ops1)
    dx1, dln2w, dln2b, dw1, db1, dw2, db2 = outs1

    # ---- B2: LN1 + attention + shortcut
    ops2 = operands[:9] + operands[16:16 + n_sc]   # ln1, qkv stacks, wp, sc
    acc_shapes = [(1, Cin), (1, Cin),
                  (heads, hd, Cin), (heads, 1, hd),
                  (heads, hd, Cin), (heads, 1, hd),
                  (heads, hd, Cin), (heads, 1, hd),
                  (heads, Cout, hd), (1, Cout)]
    if n_sc:
        acc_shapes += [(Cout, Cin), (1, Cout)]
    acc2 = [_acc_spec(s) for s in acc_shapes]
    band_spec = pl.BlockSpec((1, band_rows, Wp, Cin),
                             lambda b, j: (b, j, 0, 0))

    def kernel2(x_ref, dz_ref, *refs):
        w_refs = refs[:9 + n_sc]
        sc_refs = tuple(w_refs[9:9 + n_sc])
        o_refs = refs[9 + n_sc:]
        dsc_refs = tuple(o_refs[11:11 + n_sc])
        _attn_bwd_kernel(x_ref, dz_ref, *w_refs[:9], sc_refs,
                         o_refs[0], *o_refs[1:11], dsc_refs,
                         ws=ws_eff, heads=heads, q_pool=q_pool, H=H, W=W)

    outs2 = pl.pallas_call(
        kernel2,
        grid=(B, n_bands),
        in_specs=[band_spec, pooled_spec] + [wspec(a) for a in ops2],
        out_specs=(band_spec,) + tuple(s for s, _ in acc2),
        out_shape=(jax.ShapeDtypeStruct((B, Hp, Wp, Cin), cdt),)
        + tuple(sh for _, sh in acc2),
        interpret=run_interp,
        compiler_params=_BWD_COMPILER_PARAMS,
    )(x, dx1, *ops2)
    dx = outs2[0]
    (dln1w, dln1b, dwq, dbq, dwk, dbk, dwv, dbv, dwp, dbp) = outs2[1:11]
    if dx.shape[1] != H or dx.shape[2] != W:
        dx = dx[:, :H, :W]

    # ---- repack grads into the block param-tree layout
    dqkv_w = jnp.concatenate([dwq.reshape(Cout, Cin), dwk.reshape(Cout, Cin),
                              dwv.reshape(Cout, Cin)], 0)
    dproj_w = dwp.transpose(1, 0, 2).reshape(Cout, Cout)
    dp = {
        "norm1": {"weight": dln1w[0], "bias": dln1b[0]},
        "attn": {"proj": {"weight": dproj_w, "bias": dbp[0]}},
        "norm2": {"weight": dln2w[0], "bias": dln2b[0]},
        "mlp": {"layers": {"0": {"weight": dw1, "bias": db1[0]},
                           "1": {"weight": dw2, "bias": db2[0]}}},
    }
    dqkv = {"weight": dqkv_w}
    if "bias" in p["attn"]["qkv"]:
        dqkv["bias"] = jnp.concatenate(
            [dbq.reshape(Cout), dbk.reshape(Cout), dbv.reshape(Cout)])
    dp["attn"]["qkv"] = dqkv
    if n_sc:
        dwsc, dbsc = outs2[11], outs2[12]
        dp["proj"] = {"weight": dwsc, "bias": dbsc[0]}

    # match primal leaf dtypes (params are stored f32; x may be bf16)
    dp = jax.tree.map(lambda grad, prm: grad.astype(prm.dtype), dp,
                      {k: p[k] for k in dp})
    return dp, dx.astype(x.dtype)


def fused_block_bwd_eligible(spec, H: int, W: int, mlp_ratio: float = 4.0,
                             interpret: bool = False) -> bool:
    """Forward-eligible AND the attention-backward program's resident bytes
    (weights + f32 grad accumulators + band activations + per-head f32
    logits) fit the VMEM budget."""
    if not hbk.fused_block_eligible(spec, H, W, mlp_ratio, interpret):
        return False
    if spec["dim_out"] == 768:
        # the round-5 forward bound admits stage-4 blocks, but their
        # BACKWARD stack is measured at 36.74 MB scoped VMEM (f32 MLP
        # weight-grad accumulators alone are ~28 MB at 768 channels) —
        # past even the proven 32 MB limit. Forward fuses; backward XLA.
        return False
    ci, co, heads = spec["dim"], spec["dim_out"], spec["num_heads"]
    hd = co // heads
    _, _, Wp, band_rows, _, bh_out, out_w, _ = _geometry(spec, H, W)
    T = band_rows * Wp
    Tq = bh_out * out_w
    n_sc = 2 if ci != co else 0
    wbytes = 2 * (3 * co * ci + co * co + (ci * co if n_sc else 0))
    attn_bytes = (wbytes // 2) * 3                     # bf16 w + f32 grads
    act = 4 * T * ci * 2                               # xn32 + dxn32
    logits = 4 * Tq * T * 2                            # p + dp per head
    bands = 2 * 2 * (2 * T * ci + Tq * co)             # x, dx, dz (dbuf)
    misc = 4 * T * (max(co, 4 * hd) + (co if n_sc else 0))
    return attn_bytes + act + logits + bands + misc <= _BWD_VMEM_BUDGET


@functools.lru_cache(maxsize=None)
def _make_trainable_block(spec_key, q_stride, mlp_ratio, interpret):
    spec = dict(spec_key)

    @jax.custom_vjp
    def block(p, x):
        y, _ = hbk.fused_block(p, x, spec, q_stride, mlp_ratio, interpret,
                               save_residual=True)
        return y

    def fwd(p, x):
        y, x1 = hbk.fused_block(p, x, spec, q_stride, mlp_ratio, interpret,
                                save_residual=True)
        return y, (p, x, x1)

    def bwd(res, g):
        p, x, x1 = res
        return _bwd_pallas(spec, q_stride, mlp_ratio, interpret, p, x, x1, g)

    block.defvjp(fwd, bwd)
    return block


def fused_block_trainable(p, x, spec, q_stride, mlp_ratio: float = 4.0,
                          interpret: bool = False):
    """Differentiable fused Hiera block: fused forward + custom-VJP Pallas
    backward. Same contract as hiera._block; caller must have checked
    ``fused_block_bwd_eligible``."""
    fn = _make_trainable_block(tuple(sorted(spec.items())),
                               tuple(q_stride), float(mlp_ratio),
                               bool(interpret))
    return fn(p, x)
