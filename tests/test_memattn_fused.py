"""Parity tests for the fused memory-attention layer kernels
(ops/memattn_layer_kernel.py): values AND grads vs the XLA path of
models/memory_attention.py, in interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sam2_video_tpu.models import memory_attention as ma
from sam2_video_tpu.ops import common as nn
from sam2_video_tpu.ops import flash_attention as fa
from sam2_video_tpu.ops import memattn_layer_kernel as mlk
from sam2_video_tpu.ops.position_encoding import (apply_rope_half,
                                                  axial_rope_table_half,
                                                  deinterleave_perm)

CFG = ma.MemoryAttentionConfig()          # d_model 256, 1 head, ff 2048
H = W = 8
L = H * W


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _layer_params(rng):
    key = jax.random.PRNGKey(7)
    return ma.init(key, CFG)


def _rope():
    return axial_rope_table_half(CFG.d_model, W, H, CFG.rope_theta)


def _ref_self(lp, x, rope_q, perm):
    out = ma._self_attn(lp, CFG, x, None, rope_q, perm)
    y2 = nn.layer_norm(lp["norm2"], out)
    qc = nn.linear(ma._permed(lp["cross_attn_image"], "q_proj", perm), y2)
    return out, apply_rope_half(qc, *rope_q)


def _fused_self(lp, x, rope_q, perm):
    sp, cp = lp["self_attn"], lp["cross_attn_image"]
    p_self = {"q": ma._permed(sp, "q_proj", perm),
              "k": ma._permed(sp, "k_proj", perm),
              "v": sp["v_proj"], "out": sp["out_proj"]}
    return mlk.fused_self_block(
        p_self, ma._permed(cp, "q_proj", perm), lp["norm1"], lp["norm2"],
        x, rope_q[0].astype(jnp.float32), rope_q[1].astype(jnp.float32),
        interpret=True)


def _ref_tail(lp, y, a128):
    cp = lp["cross_attn_image"]
    attn = nn.linear(cp["v_proj"], a128[..., :CFG.kv_in_dim])
    out = y + nn.linear(cp["out_proj"], attn)
    t2 = nn.layer_norm(lp["norm3"], out)
    t2 = nn.linear(lp["linear2"], jax.nn.relu(nn.linear(lp["linear1"], t2)))
    return out + t2


def _fused_tail(lp, y, a128):
    cp = lp["cross_attn_image"]
    return mlk.fused_tail_block(cp["v_proj"], cp["out_proj"], lp["norm3"],
                                lp["linear1"], lp["linear2"], y, a128,
                                interpret=True)


def _assert_close(a, b, atol):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    tol = atol * (np.abs(a).max() + 1)
    assert np.abs(a - b).max() <= tol, np.abs(a - b).max()


def _assert_tree_close(ta, tb, atol):
    fb = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_leaves_with_path(tb)}
    for k, va in jax.tree_util.tree_leaves_with_path(ta):
        _assert_close(va, fb[jax.tree_util.keystr(k)], atol)


def test_self_block_values(rng):
    p = _layer_params(rng)
    lp = p["layers"]["0"]
    perm = deinterleave_perm(CFG.d_model, 1)
    x = jnp.asarray(rng.standard_normal((3, L, CFG.d_model), np.float32))
    ro, rq = _ref_self(lp, x, _rope(), perm)
    fo, fq = _fused_self(lp, x, _rope(), perm)
    _assert_close(ro, fo, 2e-5)
    _assert_close(rq, fq, 2e-5)


def test_self_block_grads(rng):
    p = _layer_params(rng)
    lp = p["layers"]["0"]
    perm = deinterleave_perm(CFG.d_model, 1)
    x = jnp.asarray(rng.standard_normal((2, L, CFG.d_model), np.float32))
    co = jnp.asarray(rng.standard_normal((2, L, CFG.d_model), np.float32))
    cq = jnp.asarray(rng.standard_normal((2, L, CFG.d_model), np.float32))

    def loss(fn):
        def f(lpp, xx):
            out, q3 = fn(lpp, xx, _rope(), perm)
            return jnp.vdot(out, co) + jnp.vdot(q3, cq)
        return f

    g_ref = jax.grad(loss(_ref_self), (0, 1))(lp, x)
    g_fus = jax.grad(loss(_fused_self), (0, 1))(lp, x)
    # compare the leaves the self block touches (the rest are zero in both)
    used = ["self_attn", "norm1", "norm2"]
    sub_ref = ({k: g_ref[0][k] for k in used},
               g_ref[0]["cross_attn_image"]["q_proj"], g_ref[1])
    sub_fus = ({k: g_fus[0][k] for k in used},
               g_fus[0]["cross_attn_image"]["q_proj"], g_fus[1])
    _assert_tree_close(sub_ref, sub_fus, 5e-4)


def test_self_block_vmap(rng):
    """The kernels run under jax.vmap in batched_loss_fn — values and the
    weight-grad batch reduction must survive the prepended batch grid dim."""
    p = _layer_params(rng)
    lp = p["layers"]["0"]
    perm = deinterleave_perm(CFG.d_model, 1)
    xb = jnp.asarray(rng.standard_normal((2, 2, L, CFG.d_model), np.float32))

    def f(fn, lpp, xx):
        out, q3 = fn(lpp, xx, _rope(), perm)
        return jnp.sum(out ** 2) + jnp.sum(q3 ** 2)

    def batched(fn):
        return lambda lpp, xx: jnp.mean(
            jax.vmap(lambda q: f(fn, lpp, q))(xx))

    v_ref, g_ref = jax.value_and_grad(batched(_ref_self))(lp, xb)
    v_fus, g_fus = jax.value_and_grad(batched(_fused_self))(lp, xb)
    _assert_close(v_ref, v_fus, 2e-5)
    _assert_tree_close(g_ref["self_attn"], g_fus["self_attn"], 5e-4)


def test_tail_block_values_and_grads(rng):
    p = _layer_params(rng)
    lp = p["layers"]["0"]
    y = jnp.asarray(rng.standard_normal((2, L, CFG.d_model), np.float32))
    a = jnp.asarray(rng.standard_normal((2, L, 128), np.float32))
    _assert_close(_ref_tail(lp, y, a), _fused_tail(lp, y, a), 2e-5)

    co = jnp.asarray(rng.standard_normal((2, L, CFG.d_model), np.float32))

    def loss(fn):
        return lambda lpp, yy, aa: jnp.vdot(fn(lpp, yy, aa), co)

    g_ref = jax.grad(loss(_ref_tail), (0, 1, 2))(lp, y, a)
    g_fus = jax.grad(loss(_fused_tail), (0, 1, 2))(lp, y, a)
    used = ["norm3", "linear1", "linear2"]
    cross = ["v_proj", "out_proj"]
    sub = lambda g: ({k: g[0][k] for k in used},  # noqa: E731
                     {k: g[0]["cross_attn_image"][k] for k in cross},
                     g[1], g[2])
    _assert_tree_close(sub(g_ref), sub(g_fus), 5e-4)
    # pad-lane cotangents must be exactly zero (they feed zero weights)
    assert np.abs(np.asarray(g_fus[2][..., CFG.kv_in_dim:])).max() == 0.0


def test_full_apply_fused_matches_xla(rng, monkeypatch):
    """memory_attention.apply with the fused layer path vs the pure-XLA
    (use_flash=False) path: values and grads w.r.t. params and inputs,
    including masked (invalid) memory slots."""
    monkeypatch.setattr(mlk, "INTERPRET", True)
    monkeypatch.setattr(fa, "INTERPRET", True)
    monkeypatch.setattr(
        fa, "flash_kproj_eligible",
        lambda q, kin, num_spatial, grid_wh: q.shape[-1] % 256 == 0)
    p = _layer_params(rng)
    M = 2
    num_spatial = M * L
    Lk = num_spatial + 8
    curr = jnp.asarray(rng.standard_normal((2, L, CFG.d_model), np.float32))
    mem = jnp.asarray(rng.standard_normal((2, Lk, CFG.kv_in_dim),
                                          np.float32))
    mem_pos = jnp.asarray(rng.standard_normal((2, Lk, CFG.kv_in_dim),
                                              np.float32))
    curr_pos = jnp.asarray(rng.standard_normal((1, L, CFG.d_model),
                                               np.float32))
    valid = jnp.asarray(
        np.r_[np.ones(num_spatial - L, bool), np.zeros(L, bool),
              np.ones(4, bool), np.zeros(4, bool)])

    cfg_ref = ma.MemoryAttentionConfig(use_flash=False)

    def run(cfg, pp, cu, me):
        return ma.apply(pp, cfg, cu, me, curr_pos, mem_pos, (H, W),
                        num_spatial, key_valid=valid)

    out_ref = run(cfg_ref, p, curr, mem)
    out_fus = run(CFG, p, curr, mem)
    assert out_fus.shape == (2, L, CFG.d_model)
    _assert_close(out_ref, out_fus, 5e-5)

    co = jnp.asarray(rng.standard_normal(out_ref.shape, np.float32))

    def loss(cfg):
        return lambda pp, cu, me: jnp.vdot(run(cfg, pp, cu, me), co)

    g_ref = jax.grad(loss(cfg_ref), (0, 1, 2))(p, curr, mem)
    g_fus = jax.grad(loss(CFG), (0, 1, 2))(p, curr, mem)
    _assert_tree_close(g_ref, g_fus, 1e-3)


def test_eligibility():
    assert not mlk.fused_layer_eligible(CFG, L)  # CPU backend, no interpret
    assert mlk.fused_layer_eligible(CFG, 576, interpret=True)
    assert mlk.fused_layer_eligible(CFG, L, interpret=True)
    # 512px query grids (L=1024, 25.2 MB resident) fit the round-5 26 MB
    # bound under the proven 32 MB scoped-VMEM limit; 2x that does not
    assert mlk.fused_layer_eligible(CFG, 1024, interpret=True)
    assert not mlk.fused_layer_eligible(CFG, 2048, interpret=True)
    import dataclasses
    for bad in (dataclasses.replace(CFG, num_heads=4),
                dataclasses.replace(CFG, activation="gelu"),
                dataclasses.replace(CFG, pos_enc_at_attn=True)):
        assert not mlk.fused_layer_eligible(bad, 576, interpret=True)
