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


@pytest.mark.parametrize("idx", [0, 1, 2, 3, 4, 5])
def test_fused_block_matches_xla(idx, rng):
    """Every distinct geometry class: plain ws8, pooled ws8, plain ws4,
    pooled ws4, padded ws14, global."""
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


def test_stage4_blocks_ineligible():
    """768-channel blocks must fall back to XLA (weights exceed the VMEM
    budget) — the full-trunk test still passes because apply() dispatches
    per block."""
    geoms = _block_geometries()
    for i, spec, H in geoms:
        if spec["dim_out"] == 768:
            assert not hbk.fused_block_eligible(spec, H, H, CFG.mlp_ratio,
                                                interpret=True)


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
    encoder is frozen."""
    import optax

    from sam2_video_tpu.models import VideoModelConfig
    from sam2_video_tpu.models.sam2 import SAM2Config
    from sam2_video_tpu.training import loop as loop_mod

    captured = {}
    orig = loop_mod.batched_loss_fn

    def spy(mcfg, lcfg, training=True):
        captured["fused"] = mcfg.sam2.fused_backbone
        return orig(mcfg, lcfg, training=training)

    mcfg = VideoModelConfig(sam2=SAM2Config(backbone="tiny", image_size=64))
    tx = optax.sgd(1e-3)
    try:
        loop_mod.batched_loss_fn = spy
        loop_mod.make_train_step(
            mcfg, loop_mod.LossConfig(), tx,
            trainable_modules=["memory_attention", "memory_encoder"])
        assert captured["fused"] is True
        loop_mod.make_train_step(
            mcfg, loop_mod.LossConfig(), tx,
            trainable_modules=["memory_attention", "image_encoder"])
        assert captured["fused"] is False
        loop_mod.make_train_step(mcfg, loop_mod.LossConfig(), tx,
                                 trainable_modules=None)
        assert captured["fused"] is False
    finally:
        loop_mod.batched_loss_fn = orig


def test_cpu_backend_falls_back_to_xla():
    """On the CPU backend (tests), eligibility is False without the
    interpret override — apply(allow_fused=True) must be the XLA path."""
    for i, spec, H in _block_geometries():
        assert not hbk.fused_block_eligible(spec, H, H, CFG.mlp_ratio)


def test_fused_512px_geometries():
    """The CholecSeg8k eval setting (512px -> 128/64/32 grids) must stay
    eligible for all non-stage4 blocks, including the 1024-token global
    attention."""
    for i, spec, H in _block_geometries(image_size=512):
        if spec["dim_out"] == 768:
            continue
        assert hbk.fused_block_eligible(spec, H, H, CFG.mlp_ratio,
                                        interpret=True), (i, spec, H)


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
