"""Fused memory-encoder Pallas kernel: the whole downsampler-pyramid + fuser
stack in one VMEM-resident program per object.

Why a kernel (round-3 profiling, docs/DESIGN.md §3b follow-up): the memory
encoder runs once per tracked frame inside the recurrence and measured
7.7 ms/step of the B=2 headline trace even after the space-to-depth rewrite —
not in the convs (those hit ~75 TFLOP/s) but in the seams between them: the
packed-LayerNorm f32 moment passes, the GELU round trips, and the CXBlock
dwconv/LN/pwconv chain each re-reading the [N, 24, 24, 256] activation from
HBM. Per object that activation is only ~0.3 MB — the entire encoder fits in
VMEM — so one kernel runs the full chain touching HBM exactly once per tensor:

  in:  s2d-packed mask  [N, h, w, 256]   (space-to-depth outside, free reshape)
       projected pixels [N, h, w, 256]   (pix_feat_proj outside: one batched
                                          MXU matmul XLA already does well)
  body: 4x [ 2x2 phase-routed conv (4 shifted matmuls) -> packed LN -> GELU ]
        -> 1x1 conv -> (+pix) -> 2x CXBlock(dwconv7x7 + LN + pw1 + GELU + pw2)
  out: out_proj         [N, h, w, out_dim]

TPU-native tricks:
- The packed LayerNorm (normalize over the channel group of a phase-packed
  lane dim) is computed WITHOUT lane regrouping: the group-mean is a matmul
  with a constant [256, 256] block matrix M (M[i,j] = 1/C if phase(i) ==
  phase(j)), so mu = x @ M and E[x^2] = x^2 @ M — two tiny MXU ops instead of
  a lane relayout + strided reduction.
- The depthwise 7x7 conv is 49 shifted VPU multiply-adds over a zero-padded
  VMEM copy (0.015 GFLOP — VPU noise).
- The 2x2 phase-routed convs (docs/DESIGN.md §3b) become 4 shifted
  [h*w, 256] @ [256, 256] matmuls; the (h, w) -> (h*w) merge is
  layout-preserving because h % 8 == 0 keeps sublane tiles intact.

Gradients: the memory-encoder output is consumed ONLY through the detached
memory bank (reference parity: sam2model.py:345-358 stores `.detach()`ed
features), so under ``detach_memory_bank=True`` (and always at eval) no
cotangent ever reaches this kernel and no VJP is needed; the caller falls
back to the XLA path for full-BPTT training (``detach_memory_bank=False``).

Parity spec: /root/reference/sam2_video/model/modeling/memory_encoder.py
(MaskDownSampler:17-58, CXBlock:62-117, Fuser:120-135, MemoryEncoder:138-181);
numerical equivalence with the XLA path is pinned by
tests/test_ops.py::test_memory_encoder_kernel_matches_xla.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# geometry of the stride-16 pyramid in packed-phase form:
# (channels, in-phase grid, out channels, out-phase grid) per conv layer
_GEOMETRY = ((1, 16, 4, 8), (4, 8, 16, 4), (16, 4, 64, 2), (64, 2, 256, 1))


def _erf_f32(x):
    """erf for the kernel (``lax.erf`` has no Mosaic lowering): Abramowitz &
    Stegun 7.1.26, max abs error 1.5e-7 — below f32 erf's own rounding noise
    for GELU purposes and invisible after the bf16 activation cast (the
    XLA-path equivalence test pins the tolerance)."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + jnp.float32(0.3275911) * a)
    poly = t * (jnp.float32(0.254829592)
                + t * (jnp.float32(-0.284496736)
                       + t * (jnp.float32(1.421413741)
                              + t * (jnp.float32(-1.453152027)
                                     + t * jnp.float32(1.061405429)))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_f32(x):
    """Exact (erf) GELU in f32 — matches jax.nn.gelu(approximate=False)."""
    return 0.5 * x * (1.0 + _erf_f32(x * np.float32(1.0 / np.sqrt(2.0))))


def _group_mean_mat(channels: int, phases: int) -> np.ndarray:
    """M[i, j] = 1/channels if lane i and lane j share a phase (lane order is
    channel-major: lane = c * phases + p). x @ M == per-phase channel mean."""
    lanes = channels * phases
    i = np.arange(lanes)
    same = (i[:, None] % phases) == (i[None, :] % phases)
    return same.astype(np.float32) / float(channels)


def _shift2d(xp, di: int, dj: int, h: int, w: int):
    """Static [G, h, w, C] window of the zero-padded [G, h+p, w+p, C] plane."""
    G, _, _, C = xp.shape
    return jax.lax.slice(
        xp, (0, di, dj, 0), (G, di + h, dj + w, C))


def _zero_pad2d(x, before: int, after: int):
    """Zero-pad the two spatial dims of [G, h, w, C] (Mosaic-friendly:
    concatenations of zero blocks — dynamic_update_slice has no TPU
    lowering)."""
    G, h, w, C = x.shape
    rows = [jnp.zeros((G, before, w, C), x.dtype), x]
    if after:
        rows.append(jnp.zeros((G, after, w, C), x.dtype))
    xp = jnp.concatenate(rows, axis=1)
    hp = before + h + after
    cols = [jnp.zeros((G, hp, before, C), x.dtype), xp]
    if after:
        cols.append(jnp.zeros((G, hp, after, C), x.dtype))
    return jnp.concatenate(cols, axis=2)


def _mm(x4, W, precision=None, out_dtype=jnp.float32):
    """[G, h, w, Ci] @ [Ci, Co] -> [G, h, w, Co]. The (G, h, w) merge is
    layout-preserving (G and h ride above the (w, C) tile; w % 8 == 0).
    out_dtype=bf16 rounds the f32 MXU accumulator once at the output —
    the same rounding point as the XLA path's plain einsum."""
    G, h, w, Ci = x4.shape
    y = jax.lax.dot_general(x4.reshape(G * h * w, Ci), W,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=out_dtype,
                            precision=precision)
    return y.reshape(G, h, w, W.shape[-1])


def _conv2x2(x, weff, bias):
    """2x2 conv with padding ((1,0),(1,0)) as 4 shifted matmuls.

    x: [G, h, w, 256] bf16; weff: [2, 2, 256, 256]; out [G, h, w, 256] f32."""
    G, h, w, C = x.shape
    xp = _zero_pad2d(x, 1, 0)
    acc = None
    for a in range(2):
        for b in range(2):
            y = _mm(_shift2d(xp, a, b, h, w), weff[a, b])
            acc = y if acc is None else acc + y
    return acc + bias.astype(jnp.float32)


def _packed_ln_gelu(y32, mean_mat, scale, shift, eps=1e-6, fast=False):
    """Packed-phase LayerNorm (+GELU) via the group-mean matmul.

    y32: [h, w, 256] f32; mean_mat: [256, 256] f32; scale/shift: [256]
    lane-expanded LN weight/bias.

    Two formulations by compute dtype:
    - f32 mode (``fast=False``): E[x^2]-mu^2 with HIGHEST-precision dots —
      the MXU's single-pass bf16 rounding loses ~1e-3 through the variance
      cancellation, which normalization amplifies layer over layer; this is
      the strict-equivalence reference path (CPU interpret test).
    - bf16 mode (``fast=True``): subtract-then-square, var = E[(x-mu)^2],
      so there IS no cancellation and both moment dots run at bf16 MXU rate
      (HIGHEST f32 dots cost ~6 passes each, ~40 us/program measured).
      A mu rounding error eps only biases var by eps^2 (~1e-6 relative),
      and the bf16 rounding of (x-mu)^2 averages down over the C-channel
      mean — both invisible under the output's own bf16 cast."""
    if fast:
        mm_bf = mean_mat.astype(jnp.bfloat16)
        mu = _mm(y32.astype(jnp.bfloat16), mm_bf)
        d = y32 - mu
        var = jnp.maximum(_mm(jnp.square(d).astype(jnp.bfloat16), mm_bf), 0.0)
        yn = d * jax.lax.rsqrt(var + eps)
    else:
        mu = _mm(y32, mean_mat, precision=jax.lax.Precision.HIGHEST)
        ex2 = _mm(jnp.square(y32), mean_mat,
                  precision=jax.lax.Precision.HIGHEST)
        var = jnp.maximum(ex2 - jnp.square(mu), 0.0)
        yn = (y32 - mu) * jax.lax.rsqrt(var + eps)
    yn = yn * scale.astype(jnp.float32) + shift.astype(jnp.float32)
    return _gelu_f32(yn)


def _ln_full(y32, weight, bias, eps=1e-6):
    """Plain channel LayerNorm over the full lane dim, f32 in/out."""
    mu = jnp.mean(y32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y32 - mu), axis=-1, keepdims=True)
    yn = (y32 - mu) * jax.lax.rsqrt(var + eps)
    return yn * weight.astype(jnp.float32) + bias.astype(jnp.float32)


def _kernel(ms_ref, pix_ref,
            w0_ref, b0_ref, m0_ref, s0_ref, t0_ref,
            w1_ref, b1_ref, m1_ref, s1_ref, t1_ref,
            w2_ref, b2_ref, m2_ref, s2_ref, t2_ref,
            w3_ref, b3_ref, m3_ref, s3_ref, t3_ref,
            wf_ref, bf_ref,
            dw0_ref, db0_ref, n0w_ref, n0b_ref, p10_ref, q10_ref,
            p20_ref, q20_ref, g0_ref,
            dw1_ref, db1_ref, n1w_ref, n1b_ref, p11_ref, q11_ref,
            p21_ref, q21_ref, g1_ref,
            wo_ref, bo_ref, o_ref, *, h, w, fk, out_dim):
    cdt = ms_ref.dtype
    x = ms_ref[:]                                # [G, h, w, 256] compute dt

    # ---- downsampler pyramid (packed-phase domain) ----
    for wr, br, mr, sr, tr in ((w0_ref, b0_ref, m0_ref, s0_ref, t0_ref),
                               (w1_ref, b1_ref, m1_ref, s1_ref, t1_ref),
                               (w2_ref, b2_ref, m2_ref, s2_ref, t2_ref),
                               (w3_ref, b3_ref, m3_ref, s3_ref, t3_ref)):
        # conv output drops to the compute dtype before the LN upcast —
        # exactly the XLA path's dtype walk (conv bf16 -> LN f32 -> bf16)
        y = _conv2x2(x, wr[:], br[0]).astype(cdt)
        x = _packed_ln_gelu(y.astype(jnp.float32),
                            mr[:], sr[0], tr[0],
                            fast=(cdt == jnp.bfloat16)).astype(cdt)

    # final 1x1 conv to fuser_dim, then add the projected pixel features
    x = (_mm(x, wf_ref[:]) + bf_ref[0].astype(jnp.float32)
         + pix_ref[:].astype(jnp.float32)).astype(cdt)

    # ---- fuser: 2x ConvNeXt block ----
    pad = fk // 2
    for dwr, dbr, nwr, nbr, p1r, q1r, p2r, q2r, gr in (
            (dw0_ref, db0_ref, n0w_ref, n0b_ref, p10_ref, q10_ref,
             p20_ref, q20_ref, g0_ref),
            (dw1_ref, db1_ref, n1w_ref, n1b_ref, p11_ref, q11_ref,
             p21_ref, q21_ref, g1_ref)):
        inp = x
        # depthwise fk x fk conv: fk^2 shifted VPU multiply-adds, f32 acc
        G, _, _, C = x.shape
        xp = _zero_pad2d(x, pad, pad)
        dw = dwr[:]                                   # [fk, fk, C]
        acc = jnp.zeros((G, h, w, C), jnp.float32)
        for a in range(fk):
            for b in range(fk):
                acc += (_shift2d(xp, a, b, h, w).astype(jnp.float32)
                        * dw[a, b].astype(jnp.float32))
        y32 = acc + dbr[0].astype(jnp.float32)
        y32 = _ln_full(y32, nwr[0], nbr[0])
        # pointwise MLP: 256 -> 1024 -> GELU -> 256, then layer scale.
        # the 1024-wide hidden is processed in two 512-column halves so the
        # f32 hidden never exceeds half its full footprint — the difference
        # between G=2 and G=4 fitting in VMEM
        y2 = y32.astype(cdt)
        H = p1r.shape[-1]
        # chunk so the f32 hidden footprint (G*h*w*chunk) stays ~constant
        # across G — the budget that let G=2 fit in scoped VMEM
        chunk = max(256, H // G)
        out = None
        for lo in range(0, H, chunk):
            hdn = _mm(y2, p1r[:, lo:lo + chunk])
            hdn = _gelu_f32(
                hdn + q1r[0, lo:lo + chunk].astype(jnp.float32)).astype(cdt)
            part = _mm(hdn, p2r[lo:lo + chunk, :])
            out = part if out is None else out + part
        out = (out + q2r[0].astype(jnp.float32)) * gr[0].astype(jnp.float32)
        x = (inp.astype(jnp.float32) + out).astype(cdt)

    # ---- out projection 256 -> out_dim ----
    yo = _mm(x, wo_ref[:]) + bo_ref[0].astype(jnp.float32)
    o_ref[:] = yo.astype(cdt)


@functools.partial(jax.jit, static_argnames=("h", "w", "fk", "out_dim"))
def _call(ms, pix, flat, h, w, fk, out_dim):
    N = ms.shape[0]
    C = ms.shape[-1]
    # G objects per program: one object leaves the op chain latency-bound
    # (~60 small sequential MXU/VPU ops); batching rows amortizes each op's
    # pipeline latency. G=4 measured 17.8M of scoped VMEM — over the old
    # 16 MB default but comfortably inside the 32 MB limit the round-5
    # twoway kernel proved usable on this chip; G=4 halves the program
    # count vs G=2 (round-5 A/B: see DESIGN.md §3c addendum).
    G = 1
    for cand in (4, 2):
        if N % cand == 0 and cand * h * w <= 4608:
            G = cand
            break
    per_n = [pl.BlockSpec((G, h, w, C), lambda n: (n, 0, 0, 0)),
             pl.BlockSpec((G, h, w, C), lambda n: (n, 0, 0, 0))]
    w_specs = [pl.BlockSpec(a.shape, lambda n, _nd=a.ndim: (0,) * _nd)
               for a in flat]
    return pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, fk=fk, out_dim=out_dim),
        grid=(N // G,),
        in_specs=per_n + w_specs,
        out_specs=pl.BlockSpec((G, h, w, out_dim), lambda n: (n, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, h, w, out_dim), ms.dtype),
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(ms, pix, *flat)


def _lane_expand(v, channels: int, phases: int):
    """[channels] LN param -> [channels*phases] lane vector (channel-major)."""
    return jnp.repeat(v, phases)


def fused_memory_encoder_eligible(cfg, masks_hw, feat_hw) -> bool:
    """Default SAM2 geometry only; any other falls back to the XLA path."""
    try:
        h, w = feat_hw
    except Exception:
        return False
    return (cfg.mask_downsampler_stride == 2
            and cfg.mask_downsampler_kernel == 3
            and cfg.mask_downsampler_padding == 1
            and cfg.mask_downsampler_total_stride == 16
            and cfg.fuser_num_layers == 2
            and cfg.fuser_dim == 256
            and cfg.fuser_kernel == 7
            and cfg.fuser_padding == 3
            and masks_hw[0] == 16 * h and masks_hw[1] == 16 * w
            and h % 8 == 0 and w % 8 == 0
            # real TPU only: on CPU the interpret-mode kernel would run the
            # whole suite through a per-frame Python interpreter (the
            # dedicated equivalence test calls fused_memory_encoder directly)
            and jax.default_backend() in ("tpu", "axon"))


def fused_memory_encoder(p, cfg, pix_proj, masks):
    """Run the fused kernel. pix_proj: [N, h, w, 256] ALREADY through
    pix_feat_proj; masks: [N, H, W, 1] scaled-sigmoid mask at image res.
    Returns [N, h, w, out_dim] in masks.dtype."""
    from ..models.memory_encoder import _effective_weight

    N, H, W, _ = masks.shape
    h, w = H // 16, W // 16
    dt = masks.dtype
    # space-to-depth outside the kernel (sublane-clean reshape/transpose)
    ms = masks.reshape(N, h, 16, w, 16).transpose(0, 1, 3, 2, 4)
    ms = ms.reshape(N, h, w, 256)

    enc = p["mask_downsampler"]["encoder"]
    flat = []
    idx = 0
    for ci, gi, co, go in _GEOMETRY:
        cp, ln = enc[str(idx)], enc[str(idx + 1)]
        phases = go * go
        flat += [
            _effective_weight(cp["weight"], gi, go).astype(dt),
            jnp.repeat(cp["bias"], phases).astype(jnp.float32)[None],
            jnp.asarray(_group_mean_mat(co, phases)),
            _lane_expand(ln["weight"], co, phases).astype(jnp.float32)[None],
            _lane_expand(ln["bias"], co, phases).astype(jnp.float32)[None],
        ]
        idx += 3
    fin = enc[str(idx)]
    flat += [fin["weight"][0, 0].astype(dt),
             fin["bias"].astype(jnp.float32)[None]]

    for i in range(cfg.fuser_num_layers):
        cx = p["fuser"]["layers"][str(i)]
        flat += [
            cx["dwconv"]["weight"][:, :, 0, :].astype(dt),   # [fk, fk, C]
            cx["dwconv"]["bias"].astype(jnp.float32)[None],
            cx["norm"]["weight"].astype(jnp.float32)[None],
            cx["norm"]["bias"].astype(jnp.float32)[None],
            cx["pwconv1"]["weight"].T.astype(dt),
            cx["pwconv1"]["bias"].astype(jnp.float32)[None],
            cx["pwconv2"]["weight"].T.astype(dt),
            cx["pwconv2"]["bias"].astype(jnp.float32)[None],
            cx["gamma"].astype(jnp.float32)[None],
        ]

    if "out_proj" in p:
        wo = p["out_proj"]["weight"][0, 0].astype(dt)
        bo = p["out_proj"]["bias"].astype(jnp.float32)[None]
    else:
        wo = jnp.eye(cfg.fuser_dim, dtype=dt)
        bo = jnp.zeros((1, cfg.fuser_dim), jnp.float32)
    out_dim = wo.shape[-1]
    flat += [wo, bo]

    return _call(ms, pix_proj, tuple(flat), h, w, cfg.fuser_kernel, out_dim)
