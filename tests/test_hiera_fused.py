"""Equivalence tests for the fused Hiera block kernel
(ops/hiera_block_kernel.py) against the XLA path (models/hiera.py _block),
in Pallas interpret mode on CPU — per geometry and for the full trunk.

The kernel is forward-only and gated to frozen-encoder training / eval
(SAM2Config.fused_backbone); the gating wiring is covered here too.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam2_video_tpu.models import hiera
from sam2_video_tpu.ops import hiera_block_kernel as hbk

CFG = hiera.HIERA_PRESETS["tiny"]


def _tiny_params():
    return hiera.init(jax.random.PRNGKey(0), CFG)


def _block_geometries(image_size=384):
    """(index, spec, grid) walk of the tiny trunk at the given image size."""
    H = image_size // 4
    out = []
    for i, spec in enumerate(CFG.block_specs()):
        out.append((i, spec, H))
        if spec["q_pool"]:
            H //= 2
    return out


@pytest.mark.parametrize("idx", [0, 1, 2, 3, 4, 5, 11])
def test_fused_block_matches_xla(idx, rng):
    """Every distinct geometry class: plain ws8, pooled ws8, plain ws4,
    pooled ws4, padded ws14, global, and the round-5-eligible stage-4
    768-channel padded-ws7 block."""
    p = _tiny_params()
    i, spec, H = _block_geometries()[idx]
    assert hbk.fused_block_eligible(spec, H, H, CFG.mlp_ratio,
                                    interpret=True)
    x = jnp.asarray(rng.standard_normal((2, H, H, spec["dim"]),
                                        dtype=np.float32))
    ref = hiera._block(p["blocks"][str(i)], x, spec, CFG.q_stride)
    out = hbk.fused_block(p["blocks"][str(i)], x, spec, CFG.q_stride,
                          CFG.mlp_ratio, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=5e-4)


def test_stage4_eligibility():
    """Round-5 rules: the 15 MB weight bound (under the proven 32 MB
    scoped-VMEM limit) admits the 768-channel stage-4 blocks, EXCEPT the
    q_pool dim-change block whose per-head [7, 21, 96] band cast Mosaic
    cannot lower (width not 8-aligned, lane not a 128 tile) — that one
    must stay on XLA at every image size."""
    for size in (384, 512):
        for i, spec, H in _block_geometries(size):
            got = hbk.fused_block_eligible(spec, H, H, CFG.mlp_ratio,
                                           interpret=True)
            want = not (spec["q_pool"] and spec["dim_out"] == 768)
            assert got == want, (size, i, spec, H)


def test_fused_trunk_matches_xla(rng, monkeypatch):
    monkeypatch.setattr(hbk, "INTERPRET", True)
    p = _tiny_params()
    x = jnp.asarray(rng.standard_normal((1, 192, 192, 3), dtype=np.float32))
    ref = hiera.apply(p, x, CFG, allow_fused=False)
    out = hiera.apply(p, x, CFG, allow_fused=True)
    assert len(ref) == len(out)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-3, rtol=3e-3)


def test_fused_gating_wiring():
    """make_train_step flips fused_backbone on exactly when the image
    encoder is frozen, and fused_backbone_vjp on exactly when it is
    trainable (incl. the all-trainable default)."""
    import optax

    from sam2_video_tpu.models import VideoModelConfig
    from sam2_video_tpu.models.sam2 import SAM2Config
    from sam2_video_tpu.training import loop as loop_mod

    captured = {}
    orig = loop_mod.batched_loss_fn

    def spy(mcfg, lcfg, training=True):
        captured["fused"] = mcfg.sam2.fused_backbone
        captured["vjp"] = mcfg.sam2.fused_backbone_vjp
        return orig(mcfg, lcfg, training=training)

    mcfg = VideoModelConfig(sam2=SAM2Config(backbone="tiny", image_size=64))
    tx = optax.sgd(1e-3)
    try:
        loop_mod.batched_loss_fn = spy
        loop_mod.make_train_step(
            mcfg, loop_mod.LossConfig(), tx,
            trainable_modules=["memory_attention", "memory_encoder"])
        assert captured["fused"] is True and captured["vjp"] is False
        loop_mod.make_train_step(
            mcfg, loop_mod.LossConfig(), tx,
            trainable_modules=["memory_attention", "image_encoder"])
        assert captured["fused"] is False and captured["vjp"] is True
        loop_mod.make_train_step(mcfg, loop_mod.LossConfig(), tx,
                                 trainable_modules=None)
        assert captured["fused"] is False and captured["vjp"] is True
    finally:
        loop_mod.batched_loss_fn = orig


def _grad_trees(f, p, x, cot):
    loss = lambda pp, xx: jnp.vdot(f(pp, xx), cot)
    return jax.grad(loss, (0, 1))(p, x)


def _assert_grads_close(ga, gb, atol, rtol, allow_pool_flips=False):
    """Leaf-wise comparison. ``allow_pool_flips`` tolerates max-pool tie
    routing divergence: when the two FORWARD paths disagree on a near-tied
    2x2 pooling cell (float accumulation order), the gradient routes to a
    different cell element in each path — a measure-zero discontinuity of
    max-pool, not a kernel error. One flipped routing decision moves one
    gradient contribution between rows of a downstream weight grad, so it
    corrupts up to a full row of elements; the right robustness measure is
    therefore fraction-of-elements + relative Frobenius norm, not a count."""
    flat_b = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gb)}
    for k, va in jax.tree_util.tree_leaves_with_path(ga):
        ks = jax.tree_util.keystr(k)
        va = np.asarray(va)
        vb = np.asarray(flat_b[ks])
        leaf_atol = atol * float(np.max(np.abs(va)) + 1)
        bad = ~np.isclose(vb, va, atol=leaf_atol, rtol=rtol)
        n_bad = int(bad.sum())
        if n_bad == 0:
            continue
        assert allow_pool_flips, (
            f"{ks}: {n_bad} mismatches; "
            f"max abs diff {np.abs(vb - va).max():.4g}")
        frac = n_bad / va.size
        rel_frob = np.linalg.norm(vb - va) / (np.linalg.norm(va) + 1e-12)
        assert frac <= 0.01 and rel_frob <= 2e-2, (ks, n_bad, frac, rel_frob)


@pytest.mark.parametrize("idx", [0, 1, 2, 3, 4, 5])
def test_fused_block_grads_match_xla(idx, rng):
    """Backward kernel parity (params AND input grads) vs XLA autodiff of
    hiera._block, per geometry class — plain ws8, pooled ws8 (dim-change
    shortcut + q-pool unpooling), plain ws4, pooled ws4, padded ws14,
    global. Stage-4 (768-channel) blocks are fwd-fused only: their
    backward stack is a measured 36.74 MB of scoped VMEM, past the 32 MB
    limit (see fused_block_bwd_eligible)."""
    from sam2_video_tpu.ops import hiera_block_bwd as hbb

    p = _tiny_params()
    i, spec, H = _block_geometries()[idx]
    assert hbb.fused_block_bwd_eligible(spec, H, H, CFG.mlp_ratio,
                                        interpret=True)
    bp = p["blocks"][str(i)]
    x = jnp.asarray(rng.standard_normal((2, H, H, spec["dim"]),
                                        dtype=np.float32))
    y_shape = jax.eval_shape(
        lambda q: hiera._block(bp, q, spec, CFG.q_stride), x).shape
    cot = jnp.asarray(rng.standard_normal(y_shape, dtype=np.float32))

    g_ref = _grad_trees(
        lambda pp, xx: hiera._block(pp, xx, spec, CFG.q_stride), bp, x, cot)
    g_fus = _grad_trees(
        lambda pp, xx: hbb.fused_block_trainable(
            pp, xx, spec, CFG.q_stride, CFG.mlp_ratio, interpret=True),
        bp, x, cot)
    _assert_grads_close(g_ref, g_fus, atol=2e-3, rtol=2e-3)


def test_fused_trunk_grads_match_xla(rng, monkeypatch):
    """Whole-trunk gradient parity: apply(fused_vjp=True) vs the XLA trunk,
    params and input, with the stage-4 q_pool block transparently on the
    XLA path (Mosaic shape-cast ineligibility)."""
    monkeypatch.setattr(hbk, "INTERPRET", True)
    p = _tiny_params()
    x = jnp.asarray(rng.standard_normal((1, 128, 128, 3), dtype=np.float32))

    def loss(fn_kwargs):
        def f(pp, xx):
            outs = hiera.apply(pp, xx, CFG, **fn_kwargs)
            return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)
        return f

    g_ref = jax.grad(loss({}), (0, 1))(p, x)
    g_fus = jax.grad(loss({"fused_vjp": True}), (0, 1))(p, x)
    # the two forward paths differ by accumulation order, so a near-tied
    # pooling cell may route its gradient to the other element (even in
    # XLA-path blocks downstream of a fused one)
    _assert_grads_close(g_ref, g_fus, atol=5e-3, rtol=5e-3,
                        allow_pool_flips=True)


def test_bwd_eligibility_gating():
    """Round-5 rules. Stage-4 (768-channel) blocks are NEVER bwd-eligible
    (36.74 MB measured backward stack > the 32 MB scoped-VMEM limit), at
    512px additionally the global-attention blocks (dense [1024, 1024]
    f32 logits x2) exceed the backward budget; everything else at 384px
    must be eligible."""
    from sam2_video_tpu.ops import hiera_block_bwd as hbb

    for i, spec, H in _block_geometries(384):
        want = spec["dim_out"] != 768
        got = hbb.fused_block_bwd_eligible(spec, H, H, CFG.mlp_ratio,
                                           interpret=True)
        assert got == want, (i, spec, H)
    for i, spec, H in _block_geometries(512):
        got = hbb.fused_block_bwd_eligible(spec, H, H, CFG.mlp_ratio,
                                           interpret=True)
        want = spec["window_size"] != 0 and spec["dim_out"] != 768
        assert got == want, (i, spec, H)


def test_cpu_backend_falls_back_to_xla():
    """On the CPU backend (tests), eligibility is False without the
    interpret override — apply(allow_fused=True) must be the XLA path."""
    for i, spec, H in _block_geometries():
        assert not hbk.fused_block_eligible(spec, H, H, CFG.mlp_ratio)


def test_fused_512px_geometries():
    """The CholecSeg8k setting (512px -> 128/64/32/16 grids) must stay
    eligible for every block but the stage-4 q_pool one, including the
    1024-token global attention and the round-5 stage-4 ws7 block."""
    for i, spec, H in _block_geometries(image_size=512):
        want = not (spec["q_pool"] and spec["dim_out"] == 768)
        got = hbk.fused_block_eligible(spec, H, H, CFG.mlp_ratio,
                                       interpret=True)
        assert got == want, (i, spec, H)


def test_fused_block_512_stage4(rng):
    """Value check at the 512px stage-4 geometry (16x16 grid, ws7 ->
    padded width 21, 768 channels) — newly eligible in round 5."""
    p = _tiny_params()
    geoms = _block_geometries(image_size=512)
    i, spec, H = geoms[11]
    x = jnp.asarray(rng.standard_normal((1, H, H, spec["dim"]),
                                        dtype=np.float32))
    ref = hiera._block(p["blocks"][str(i)], x, spec, CFG.q_stride)
    out = hbk.fused_block(p["blocks"][str(i)], x, spec, CFG.q_stride,
                          CFG.mlp_ratio, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=5e-4)


def test_fused_block_512_global(rng):
    """Value check at the 512px global-attention shape (1024 tokens)."""
    p = _tiny_params()
    geoms = _block_geometries(image_size=512)
    i, spec, H = next(g for g in geoms if g[1]["window_size"] == 0)
    x = jnp.asarray(rng.standard_normal((1, H, H, spec["dim"]),
                                        dtype=np.float32))
    ref = hiera._block(p["blocks"][str(i)], x, spec, CFG.q_stride)
    out = hbk.fused_block(p["blocks"][str(i)], x, spec, CFG.q_stride,
                          CFG.mlp_ratio, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=5e-4)
