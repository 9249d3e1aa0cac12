"""Fused Hiera transformer-block Pallas kernel (forward only).

Why a kernel (round-3 continuation profiling): the Hiera trunk forward
measured 18.4 ms of the 95.5 ms B=2 headline step — ~10% MXU utilization for
~0.66 TFLOP — because every block round-trips its activation through HBM
half a dozen times: LN1 (f32 up/down), the window partition/unpartition
transposes (real HBM copies), the f32 softmax materialization, the residual
adds, LN2, and the 4C-wide MLP hidden. Per image the per-block activation is
0.1-35 MB — the whole block fits in VMEM — so one Pallas program runs the
entire block (LN1 -> qkv -> windowed/global attention -> proj -> +shortcut ->
LN2 -> MLP -> +residual) for one window-row band of one image, touching HBM
exactly once per tensor.

Windowed attention WITHOUT a window loop: a first version looped over the
band's windows with [ws^2, hd] dots and was latency-bound (ws=4 blocks ran
1.8x SLOWER than XLA: 24 sequential 16-token attentions per program). The
fused form instead runs ONE dense attention over the whole band per head and
adds a block-diagonal window mask (-inf off-window logits) built from token
iotas: exp(-inf) contributes exactly zero probability and zero PV terms, so
the result is bit-equivalent to per-window softmax while every dot has
hundreds of rows for the MXU. The extra off-window logit FLOPs are noise
(~30 GFLOP across the trunk vs the step's ~3.3 TFLOP).

Per-head weight slices are passed PRE-PACKED ([heads, hd, Cin] qkv stacks,
[heads, Cout, hd] proj stack) so the kernel never lane-slices activations at
non-128 offsets: q/k/v are computed per head directly at [T, hd], and the
output projection accumulates sum_h o_h @ Wp_h in one f32 accumulator —
the same single-rounding reduction as the XLA concat-then-project.

Scope and gating:
- Forward only, no VJP. The caller enables it exactly when no cotangent can
  reach the trunk: the image encoder is frozen (the reference's default
  fine-tuning combos, sam2model.py:550-565) or the model runs in eval mode.
  Differentiated configs keep the XLA path (models/hiera.py).
- Stage-4 (768-channel) blocks stay on XLA: their qkv+MLP weights alone are
  ~14 MB bf16, over the scoped-VMEM budget; their 12x12 activations cost
  little anyway.
- Zero-padding to window multiples is done by the caller (one XLA pad) and
  the pad region of the *normalized* input is re-zeroed in-kernel,
  reproducing the reference's window_partition F.pad semantics exactly
  (pad tokens enter attention as keys with k = k_bias, v = v_bias —
  hieradet.py pads AFTER norm1).

Numerics mirror the XLA path's dtype walk op for op: LN in f32 with a single
cast back to the compute dtype, dots with f32 MXU accumulation rounded once
at the output, softmax in f32 with the probabilities cast to the value dtype
before PV (ops/attention.py sdpa), exact-erf GELU (A&S 7.1.26 — ``lax.erf``
has no Mosaic lowering, same inline as ops/memory_encoder_kernel.py).

Parity spec: /root/reference/sam2_video/model/modeling/backbones/hieradet.py
(MultiScaleAttention:39-81, MultiScaleBlock:84-166) via models/hiera.py;
equivalence is pinned by tests/test_hiera_fused.py (interpret mode per
geometry + full trunk).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .memory_encoder_kernel import _gelu_f32

# set True in tests to run the kernel in interpreter mode regardless of
# backend (the CPU default already interprets)
INTERPRET = False

# skip blocks whose resident weights would blow the scoped-VMEM budget.
# 15 MB admits the stage-4 (768-channel) blocks — 14.2 MB of bf16 weights —
# under the 32 MB scoped-VMEM limit the round-5 kernels proved usable;
# their 12x12 (384px) / 16x16 (512px) activations are small. This was one
# of the two 512px eligibility walls (VERDICT r4 item 4).
_MAX_WEIGHT_BYTES = 15 * 1024 * 1024
_TARGET_BAND_TOKENS = 768
_HIDDEN_CHUNK = 512
_NEG_INF = -1e30


def _ln_f32(x, w, b, eps=1e-6):
    """models/hiera.py layer_norm walk: f32 moments, one output cast later."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32) \
        + b.astype(jnp.float32)


def _mm(x, w_t, bias, cdt):
    """[T, Ci] @ weight[Co, Ci] (+bias) with the XLA linear dtype walk:
    f32 MXU accumulation rounded once to the compute dtype, bias added in
    the compute dtype (ops/common.py linear)."""
    y = jax.lax.dot_general(x, w_t, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(cdt)
    if bias is not None:
        y = y + bias.astype(cdt)
    return y


def _pool2x2_rows_cols(x):
    """Max-pool 2x2 stride 2 over the two leading (spatial) dims of
    [H, W, C]. Stride-2 access is expressed as a leading-axis pair split +
    static index (Mosaic has no strided gather); the column pool transposes
    the (small) array so its pair split is also leading."""
    H, W, C = x.shape
    t = x.reshape(H // 2, 2, W, C)
    t = jnp.maximum(t[:, 0], t[:, 1])            # [H/2, W, C]
    t = jnp.swapaxes(t, 0, 1)                    # [W, H/2, C]
    t = t.reshape(W // 2, 2, H // 2, C)
    t = jnp.maximum(t[:, 0], t[:, 1])            # [W/2, H/2, C]
    return jnp.swapaxes(t, 0, 1)                 # [H/2, W/2, C]


def _block_kernel(x_ref, ln1w_ref, ln1b_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                  wv_ref, bv_ref, wp_ref, bp_ref, ln2w_ref, ln2b_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref, sc_refs, o_ref, *,
                  ws: int, heads: int, q_pool: bool, H: int, W: int,
                  hidden_chunk: int, x1_ref=None):
    """One (image, band) program. Band = ``band_rows`` input rows x padded
    width Wp; ws == band covers the global blocks (single window).
    sc_refs is () or (wsc_ref, bsc_ref) for dim-change blocks."""
    cdt = x_ref.dtype
    j = pl.program_id(1)
    _, bh, Wp, Cin = x_ref.shape
    hd = wq_ref.shape[1]
    Cout = wp_ref.shape[1]
    scale = jnp.float32(1.0 / math.sqrt(hd))

    x = x_ref[0]                                     # [bh, Wp, Cin]
    xn32 = _ln_f32(x, ln1w_ref[0], ln1b_ref[0])      # [bh, Wp, Cin] f32

    # re-zero the pad region of the NORMALIZED input (window_partition pads
    # zeros after norm1 in the XLA path). Row pads only exist in the last
    # band; col pads in the trailing columns.
    if H % bh != 0 or Wp != W:
        row0 = j * bh
        gr = row0 + jax.lax.broadcasted_iota(jnp.int32, (bh, Wp, 1), 0)
        gc = jax.lax.broadcasted_iota(jnp.int32, (bh, Wp, 1), 1)
        keep = (gr < H) & (gc < W)
        xn32 = jnp.where(keep, xn32, 0.0)
    xn = xn32.astype(cdt)
    flat = xn.reshape(bh * Wp, Cin)

    # shortcut path
    if sc_refs:
        wsc_ref, bsc_ref = sc_refs
        s = _mm(flat, wsc_ref[...], bsc_ref[0], cdt).reshape(bh, Wp, Cout)
        s = _pool2x2_rows_cols(s)                    # [bh/2, Wp/2, Cout]
    else:
        s = x                                        # dims match (Cin==Cout)

    if q_pool:
        bh_out, out_w, wq_sz = bh // 2, Wp // 2, ws // 2
    else:
        bh_out, out_w, wq_sz = bh, Wp, ws
    T = bh * Wp
    Tq = bh_out * out_w

    # block-diagonal window mask over the dense band logits; the single
    # whole-band window (global blocks) needs none. Query token t sits at
    # (t // out_w, t % out_w) of the (pooled) band grid; its window index is
    # (row // wq_sz) * nW + col // wq_sz, and likewise for keys on the
    # unpooled grid — equal indices attend.
    masked = (bh > ws) or (Wp > ws)
    if masked:
        tq = jax.lax.broadcasted_iota(jnp.int32, (Tq, T), 0)
        tk = jax.lax.broadcasted_iota(jnp.int32, (Tq, T), 1)
        qwin = (tq // out_w // wq_sz) * (out_w // wq_sz) \
            + (tq % out_w) // wq_sz
        kwin = (tk // Wp // ws) * (Wp // ws) + (tk % Wp) // ws
        allow = qwin == kwin

    # per-head attention, projection accumulated in f32 (one rounding at
    # the end — the same reduction the XLA concat-then-project performs)
    acc = None
    for h in range(heads):
        qh = _mm(flat, wq_ref[h], bq_ref[h], cdt)    # [T, hd]
        kh = _mm(flat, wk_ref[h], bk_ref[h], cdt)
        vh = _mm(flat, wv_ref[h], bv_ref[h], cdt)
        if q_pool:
            qh = _pool2x2_rows_cols(qh.reshape(bh, Wp, hd)).reshape(Tq, hd)
        sl = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        if masked:
            sl = jnp.where(allow, sl, _NEG_INF)
        m = jnp.max(sl, axis=-1, keepdims=True)
        p = jnp.exp(sl - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(cdt)
        oh = jax.lax.dot_general(p, vh, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        part = jax.lax.dot_general(oh.astype(cdt), wp_ref[h],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    proj = acc.astype(cdt).reshape(bh_out, out_w, Cout) \
        + bp_ref[0].astype(cdt)
    x1 = s.astype(cdt) + proj                      # bf16 add == XLA residual
    if x1_ref is not None:
        # save the post-attention residual for the backward pass
        # (ops/hiera_block_bwd.py) — its MLP stage restarts from x1
        x1_ref[0] = x1

    # MLP with the hidden dim processed in chunks to bound the f32 footprint
    y32 = _ln_f32(x1, ln2w_ref[0], ln2b_ref[0])
    y = y32.astype(cdt).reshape(Tq, Cout)
    Hd = w1_ref.shape[0]
    out = None
    for lo in range(0, Hd, hidden_chunk):
        hi = min(lo + hidden_chunk, Hd)
        hdn = jax.lax.dot_general(
            y, w1_ref[lo:hi, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cdt)
        hdn = hdn + b1_ref[0, lo:hi].astype(cdt)
        hdn = _gelu_f32(hdn.astype(jnp.float32)).astype(cdt)
        part = jax.lax.dot_general(
            hdn, w2_ref[:, lo:hi], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = part if out is None else out + part
    mlp = (out.astype(cdt) + b2_ref[0].astype(cdt)).reshape(
        bh_out, out_w, Cout)
    o_ref[0] = x1 + mlp


def _weight_bytes(spec, mlp_ratio: float) -> int:
    ci, co = spec["dim"], spec["dim_out"]
    hid = int(co * mlp_ratio)
    n = 3 * co * ci + co * co + 2 * hid * co + (ci * co if ci != co else 0)
    return 2 * n  # bf16


def _band_rows(ws_eff: int, Hp: int, Wp: int) -> int:
    """Rows per band: a multiple of the window size dividing Hp whose token
    count lands near the target (enough dot rows to feed the MXU, small
    enough that the dense [T, T] f32 logits stay a few MB)."""
    r = max(1, _TARGET_BAND_TOKENS // (ws_eff * Wp))
    while r > 1 and Hp % (ws_eff * r) != 0:
        r -= 1
    return ws_eff * r


def fused_block_eligible(spec, H: int, W: int, mlp_ratio: float = 4.0,
                         interpret: bool = False) -> bool:
    """True when this block can run fused: supported backend, VMEM-safe
    weights, even pooling geometry, and a band that fits the logits budget."""
    if not (interpret or INTERPRET
            or jax.default_backend() in ("tpu", "axon")):
        return False
    if _weight_bytes(spec, mlp_ratio) > _MAX_WEIGHT_BYTES:
        return False

    # Mosaic shape-cast support: the kernel flattens/unflattens
    # [rows, width, C] bands; those casts only lower when the width being
    # merged into the sublane dim is 8-aligned or the lane dim is a full
    # 128 tile (measured: (bh,28,384)->(bh*28,384) lowers, (7,21,96)->
    # (147,96) is "unsupported shape cast" — the stage-4 q_pool block).
    def _cast_ok(width, lane):
        return width % 8 == 0 or lane % 128 == 0

    ws = spec["window_size"]
    if ws == 0:
        # global attention: one window over the whole grid; dense [HW, HW]
        # f32 logits must stay inside VMEM alongside the weights
        return H * W <= 2048 and _cast_ok(W, spec["dim"]) \
            and _cast_ok(W, spec["dim_out"])
    if spec["q_pool"] and (ws % 2 or H % 2 or W % 2):
        return False
    if spec["dim"] != spec["dim_out"] and not spec["q_pool"]:
        return False  # dim change without pooling: not in any SAM2 preset
    Wp = -(-W // ws) * ws
    out_w = Wp // 2 if spec["q_pool"] else Wp
    hd = spec["dim_out"] // spec["num_heads"]
    if not (_cast_ok(Wp, spec["dim"]) and _cast_ok(out_w, spec["dim_out"])):
        return False
    if spec["q_pool"] and not (_cast_ok(Wp, hd) and _cast_ok(out_w, hd)):
        return False
    band = _band_rows(ws, -(-H // ws) * ws, Wp)
    return band * Wp <= 2048


def _f32row(a):
    return a.astype(jnp.float32)[None]


def _pack_operands(p, spec, cdt):
    """Kernel weight operands in a fixed order (shared fwd/bwd):
    [ln1w, ln1b, wq, bq, wk, bk, wv, bv, wp, bp, ln2w, ln2b, w1, b1, w2, b2]
    + [wsc, bsc] for dim-change blocks. qkv stacks are [heads, hd, Cin] with
    [heads, 1, hd] f32 biases; wp is [heads, Cout, hd] (per-head columns of
    the output projection)."""
    Cin, Cout, heads = spec["dim"], spec["dim_out"], spec["num_heads"]
    hd = Cout // heads
    ap = p["attn"]
    wqkv, bqkv = ap["qkv"]["weight"], ap["qkv"].get("bias")

    def head_stack(i):
        wpart = wqkv[i * Cout:(i + 1) * Cout].reshape(
            heads, hd, Cin).astype(cdt)
        if bqkv is not None:
            bpart = bqkv[i * Cout:(i + 1) * Cout].reshape(
                heads, 1, hd).astype(jnp.float32)
        else:
            bpart = jnp.zeros((heads, 1, hd), jnp.float32)
        return wpart, bpart

    wq, bq = head_stack(0)
    wk, bk = head_stack(1)
    wv, bv = head_stack(2)
    wp = ap["proj"]["weight"].reshape(Cout, heads, hd).transpose(
        1, 0, 2).astype(cdt)

    operands = [
        _f32row(p["norm1"]["weight"]), _f32row(p["norm1"]["bias"]),
        wq, bq, wk, bk, wv, bv,
        wp, _f32row(ap["proj"]["bias"]),
        _f32row(p["norm2"]["weight"]), _f32row(p["norm2"]["bias"]),
        p["mlp"]["layers"]["0"]["weight"].astype(cdt),
        _f32row(p["mlp"]["layers"]["0"]["bias"]),
        p["mlp"]["layers"]["1"]["weight"].astype(cdt),
        _f32row(p["mlp"]["layers"]["1"]["bias"]),
    ]
    n_sc = 0
    if Cin != Cout:
        operands += [p["proj"]["weight"].astype(cdt),
                     _f32row(p["proj"]["bias"])]
        n_sc = 2
    return operands, n_sc


def _geometry(spec, H: int, W: int):
    """Static band geometry shared by the forward and backward kernels:
    (ws_eff, Hp, Wp, band_rows, n_bands, bh_out, out_w, H_out_p)."""
    ws = spec["window_size"]
    q_pool = spec["q_pool"]
    if ws == 0:
        ws_eff = max(H, W)  # one window over the whole (square) grid
        Hp = Wp = ws_eff
    else:
        ws_eff = ws
        Hp = -(-H // ws) * ws
        Wp = -(-W // ws) * ws
    band_rows = _band_rows(ws_eff, Hp, Wp)
    n_bands = Hp // band_rows
    bh_out = band_rows // 2 if q_pool else band_rows
    out_w = Wp // 2 if q_pool else Wp
    H_out_p = Hp // 2 if q_pool else Hp
    return ws_eff, Hp, Wp, band_rows, n_bands, bh_out, out_w, H_out_p


def fused_block(p, x, spec, q_stride, mlp_ratio: float = 4.0,
                interpret: bool = False, save_residual: bool = False):
    """Fused forward of one Hiera block; same contract as hiera._block.

    x: [B, H, W, Cin] -> [B, H', W', Cout]. Caller must have checked
    ``fused_block_eligible``. With ``save_residual`` also returns the
    post-attention residual x1 on the PADDED pooled grid
    [B, H_out_p, out_w, Cout] for the backward pass."""
    B, H, W, Cin = x.shape
    ws = spec["window_size"]
    heads = spec["num_heads"]
    q_pool = spec["q_pool"]
    Cout = spec["dim_out"]
    hd = Cout // heads
    cdt = x.dtype

    (ws_eff, Hp, Wp, band_rows, n_bands,
     bh_out, out_w, H_out_p) = _geometry(spec, H, W)
    if Hp != H or Wp != W:
        x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))

    operands, n_sc = _pack_operands(p, spec, cdt)

    x_spec = pl.BlockSpec((1, band_rows, Wp, Cin),
                          lambda b, j: (b, j, 0, 0))
    w_specs = [pl.BlockSpec(a.shape, lambda b, j, _nd=a.ndim: (0,) * _nd)
               for a in operands]

    def kernel(x_ref, *refs):
        core = refs[:16 + n_sc]
        sc_refs = tuple(core[16:16 + n_sc])
        if save_residual:
            o_ref, x1_ref = refs[-2], refs[-1]
        else:
            o_ref, x1_ref = refs[-1], None
        _block_kernel(x_ref, *core[:16], sc_refs, o_ref,
                      ws=ws_eff, heads=heads, q_pool=q_pool, H=H, W=W,
                      hidden_chunk=_HIDDEN_CHUNK, x1_ref=x1_ref)

    out_shape = jax.ShapeDtypeStruct((B, H_out_p, out_w, Cout), cdt)
    out_spec = pl.BlockSpec((1, bh_out, out_w, Cout), lambda b, j: (b, j, 0, 0))
    if save_residual:
        out_shape = (out_shape, jax.ShapeDtypeStruct(
            (B, H_out_p, out_w, Cout), cdt))
        out_spec = (out_spec, pl.BlockSpec((1, bh_out, out_w, Cout),
                                           lambda b, j: (b, j, 0, 0)))

    from jax.experimental.pallas import tpu as pltpu
    y = pl.pallas_call(
        kernel,
        grid=(B, n_bands),
        in_specs=[x_spec] + w_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=(interpret or INTERPRET
                   or jax.default_backend() == "cpu"),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(x, *operands)
    x1 = None
    if save_residual:
        y, x1 = y

    H_real = H // 2 if q_pool else H
    W_real = W // 2 if q_pool else W
    if y.shape[1] != H_real or y.shape[2] != W_real:
        y = y[:, :H_real, :W_real]
    return (y, x1) if save_residual else y
