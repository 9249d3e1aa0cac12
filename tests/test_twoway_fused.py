"""Parity of the fused two-way decoder block kernels (interpret mode)
against the XLA path in models/mask_decoder.py — values AND gradients,
including under vmap (the training batch axis).

Covers VERDICT r4 item 1 (fuse the mask-decoder band) with the same test
discipline the round-4 kernels got (tests/test_memattn_fused.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam2_video_tpu.models import mask_decoder as md
from sam2_video_tpu.ops import twoway_kernel as twk


@pytest.fixture(autouse=True)
def _interp(monkeypatch):
    monkeypatch.setattr(twk, "INTERPRET", True)


def _cfg():
    return md.MaskDecoderConfig(fused_twoway=True)


def _block_params(key, cfg):
    return md._twoway_block_init(key, cfg)


def _xla_block(p, cfg, queries, keys, qpe, kpe2d, first):
    B = queries.shape[0]
    kpe = jnp.broadcast_to(kpe2d[None], keys.shape)
    return md._twoway_block(p, queries, keys, qpe, kpe,
                            cfg.transformer_num_heads, skip_first_pe=first)


@pytest.mark.parametrize("first", [True, False])
@pytest.mark.parametrize("O,N,HW", [(4, 8, 64), (2, 10, 144), (1, 8, 64)])
def test_block_values(first, O, N, HW):
    cfg = _cfg()
    key = jax.random.PRNGKey(0)
    p = _block_params(key, cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    C = cfg.transformer_dim
    queries = jax.random.normal(ks[0], (O, N, C), jnp.float32)
    keys = jax.random.normal(ks[1], (O, HW, C), jnp.float32)
    kpe = jax.random.normal(ks[2], (HW, C), jnp.float32)

    q_ref, k_ref = _xla_block(p, cfg, queries, keys, queries, kpe, first)
    q_f, k_f = twk.fused_twoway_block(p, queries[None], keys[None],
                                      queries[None], kpe, first,
                                      heads=cfg.transformer_num_heads,
                                      interpret=True)
    np.testing.assert_allclose(q_f[0], q_ref, rtol=0, atol=2e-5)
    np.testing.assert_allclose(k_f[0], k_ref, rtol=0, atol=2e-5)


@pytest.mark.parametrize("first", [True, False])
def test_block_grads(first):
    cfg = _cfg()
    O, N, HW, C = 3, 8, 64, cfg.transformer_dim
    p = _block_params(jax.random.PRNGKey(2), cfg)
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    queries = jax.random.normal(ks[0], (O, N, C), jnp.float32)
    keys = jax.random.normal(ks[1], (O, HW, C), jnp.float32)
    kpe = jax.random.normal(ks[2], (HW, C), jnp.float32)
    cq = jax.random.normal(ks[3], (O, N, C), jnp.float32)
    ck = jax.random.normal(ks[4], (O, HW, C), jnp.float32)

    def loss_ref(p, queries, keys, kpe):
        q, k = _xla_block(p, cfg, queries, keys, queries, kpe, first)
        return jnp.sum(q * cq) + jnp.sum(k * ck)

    def loss_fused(p, queries, keys, kpe):
        q, k = twk.fused_twoway_block(p, queries[None], keys[None],
                                      queries[None], kpe, first,
                                      heads=cfg.transformer_num_heads,
                                      interpret=True)
        return jnp.sum(q[0] * cq) + jnp.sum(k[0] * ck)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(p, queries, keys, kpe)
    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(p, queries, keys, kpe)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_f)
    for (path, r), (_, f) in zip(flat_r, flat_f):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        np.testing.assert_allclose(
            f, r, rtol=0, atol=3e-4 * scale,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_block_grads_under_vmap():
    """The training step vmaps the per-clip forward over the batch; the
    kernel's weight-grad accumulators must stay per-example under vmap so
    the outer sum matches XLA autodiff."""
    cfg = _cfg()
    G, O, N, HW, C = 2, 2, 8, 64, cfg.transformer_dim
    p = _block_params(jax.random.PRNGKey(4), cfg)
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    queries = jax.random.normal(ks[0], (G, O, N, C), jnp.float32)
    keys = jax.random.normal(ks[1], (G, O, HW, C), jnp.float32)
    kpe = jax.random.normal(ks[2], (HW, C), jnp.float32)
    cq = jax.random.normal(ks[3], (G, O, N, C), jnp.float32)

    def loss_ref(p, queries, keys):
        def per(qq, kk):
            q, k = _xla_block(p, cfg, qq, kk, qq, kpe, False)
            return q, k
        q, k = jax.vmap(per)(queries, keys)
        return jnp.sum(q * cq) + jnp.sum(k)

    def loss_fused(p, queries, keys):
        def per(qq, kk):
            q, k = twk.fused_twoway_block(p, qq[None], kk[None], qq[None],
                                          kpe, False,
                                          heads=cfg.transformer_num_heads,
                                          interpret=True)
            return q[0], k[0]
        q, k = jax.vmap(per)(queries, keys)
        return jnp.sum(q * cq) + jnp.sum(k)

    g_ref = jax.grad(loss_ref)(p, queries, keys)
    g_f = jax.grad(loss_fused)(p, queries, keys)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_f)
    for (path, r), (_, f) in zip(flat_r, flat_f):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        np.testing.assert_allclose(
            f, r, rtol=0, atol=3e-4 * scale,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_full_transformer_fused_matches_xla(monkeypatch):
    """The _transformer wrapper's fused path (both blocks + shared final
    attention) against the pure-XLA loop."""
    cfg = _cfg()
    O, N, HW, C = 4, 8, 64, cfg.transformer_dim
    p = md._transformer_init(jax.random.PRNGKey(6), cfg)
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    src = jax.random.normal(ks[0], (O, HW, C), jnp.float32)
    pe2d = jax.random.normal(ks[1], (HW, C), jnp.float32)
    tokens = jax.random.normal(ks[2], (O, N, C), jnp.float32)

    # fused path on (interpret forced by fixture)
    q_f, k_f = md._transformer(p, cfg, src, pe2d, tokens)

    # XLA path: force ineligibility
    monkeypatch.setattr(twk, "fused_twoway_eligible",
                        lambda *a, **k: False)
    q_ref, k_ref = md._transformer(p, cfg, src, pe2d, tokens)
    np.testing.assert_allclose(q_f, q_ref, rtol=0, atol=3e-5)
    np.testing.assert_allclose(k_f, k_ref, rtol=0, atol=3e-5)


def test_eligibility_and_grouping():
    cfg = _cfg()
    # both training resolutions are eligible
    assert twk.fused_twoway_eligible(cfg, 8, 8, 576, interpret=True)
    assert twk.fused_twoway_eligible(cfg, 8, 8, 1024, interpret=True)
    # the driver tiles objects: 512px picks a smaller group than 384px
    g384 = twk._pick_group(8, 8, 576, 256, 2048, 2)
    g512 = twk._pick_group(8, 8, 1024, 256, 2048, 2)
    assert g384 >= g512 >= 1
    # a geometry whose Og=1 backward exceeds the budget must fall back
    assert twk._pick_group(1, 8, 40000, 256, 2048, 2) == 0
    assert not twk.fused_twoway_eligible(cfg, 1, 8, 40000, interpret=True)


def test_group_tiled_values_match_whole():
    """Og < O (grid-tiled objects) must equal the single-program result."""
    cfg = _cfg()
    O, N, HW, C = 4, 8, 64, cfg.transformer_dim
    p = _block_params(jax.random.PRNGKey(8), cfg)
    ks = jax.random.split(jax.random.PRNGKey(9), 3)
    queries = jax.random.normal(ks[0], (1, O, N, C), jnp.float32)
    keys = jax.random.normal(ks[1], (1, O, HW, C), jnp.float32)
    kpe = jax.random.normal(ks[2], (HW, C), jnp.float32)

    q_w, k_w = twk.fused_twoway_block(p, queries, keys, queries, kpe,
                                      False, heads=cfg.transformer_num_heads,
                                      interpret=True)
    import unittest.mock as mock
    with mock.patch.object(twk, "_pick_group",
                           side_effect=lambda *a, **k: 2):
        twk._make_block.cache_clear()
        q_t, k_t = twk.fused_twoway_block(
            p, queries, keys, queries, kpe, False,
            heads=cfg.transformer_num_heads, interpret=True)
    twk._make_block.cache_clear()
    np.testing.assert_allclose(q_t, q_w, rtol=0, atol=2e-5)
    np.testing.assert_allclose(k_t, k_w, rtol=0, atol=2e-5)
