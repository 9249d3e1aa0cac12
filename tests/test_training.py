"""Training-loop tests: optimizer freezing, schedule parity, train-step smoke,
checkpoint save/restore, torch->jax converter roundtrip, GSPMD data-parallel
step on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from sam2_video_tpu.data.types import VideoClipBatch
from sam2_video_tpu.models import SAM2Config, VideoModelConfig
from sam2_video_tpu.models import sam2 as sam2_mod
from sam2_video_tpu.training.checkpoint import (Checkpointer, load_params_npz,
                                                save_params_npz)
from sam2_video_tpu.training.convert import convert_state_dict
from sam2_video_tpu.training.losses import CORE_LOSS_KEY, LossConfig
from sam2_video_tpu.training.loop import TrainState, make_train_step
from sam2_video_tpu.training.optimizer import (cosine_schedule_with_warmup,
                                               make_optimizer,
                                               trainable_labels)
from sam2_video_tpu.training.checkpoint import _flatten


def tiny_cfg(**kw):
    base = dict(image_size=64, compute_dtype="float32",
                use_activation_checkpoint=False)
    base.update(kw)
    return SAM2Config(**base)


def make_batch(rng, cfg, B=1, T=2, O=2, C=3):
    H = cfg.image_size
    images = rng.standard_normal((B, T, H, H, 3)).astype(np.float32)
    cat_masks = np.zeros((B, T, C, H, H), bool)
    cat_masks[:, :, 0, 8:24, 8:24] = True
    cat_masks[:, :, 1, 36:56, 36:56] = True
    obj_masks = np.zeros((B, O, H, H), np.float32)
    obj_masks[:, 0, 8:24, 8:24] = 1.0
    obj_masks[:, 1, 36:56, 36:56] = 1.0
    obj_to_cat = np.tile(np.array([0, 1], np.int32), (B, 1))
    coords = np.tile(np.array([[[16, 16]], [[45, 45]]], np.float32), (B, 1, 1, 1))
    labels = np.ones((B, O, 1), np.int32)
    return VideoClipBatch(
        images=jnp.asarray(images), cat_masks=jnp.asarray(cat_masks),
        obj_masks=jnp.asarray(obj_masks), obj_to_cat=jnp.asarray(obj_to_cat),
        point_coords=jnp.asarray(coords), point_labels=jnp.asarray(labels))


def test_cosine_schedule_matches_transformers():
    try:
        import torch
        from transformers import get_cosine_schedule_with_warmup
    except Exception:
        pytest.skip("transformers unavailable")
    total, warm = 100, 10
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
    sch = get_cosine_schedule_with_warmup(opt, warm, total)
    ours = cosine_schedule_with_warmup(1.0, warm, total)
    for step in [0, 1, 5, 10, 11, 50, 99]:
        want = sch.lr_lambdas[0](step)
        np.testing.assert_allclose(float(ours(step)), want, atol=1e-6,
                                   err_msg=f"step {step}")


def test_trainable_labels():
    cfg = tiny_cfg()
    params = sam2_mod.init(jax.random.PRNGKey(0), cfg)
    labels = trainable_labels(params, ["memory_attention", "memory_encoder"])
    assert set(jax.tree.leaves(labels)) <= {"train", "freeze"}
    la = labels["memory_attention"]["layers"]["0"]["linear1"]["weight"]
    assert la == "train"
    assert labels["image_encoder"]["trunk"]["patch_embed"]["proj"]["weight"] \
        == "freeze"
    assert labels["sam_mask_decoder"]["iou_token"]["weight"] == "freeze"
    # bare params stay trainable (reference quirk, model_utils.py:38-50)
    assert labels["maskmem_tpos_enc"] == "train"


def test_frozen_params_do_not_move(rng):
    cfg = tiny_cfg()
    params = sam2_mod.init(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(params, {"lr": 1e-2, "type": "AdamW"},
                        {"enabled": False}, total_steps=10,
                        trainable_modules=["memory_attention"])
    mcfg = VideoModelConfig(sam2=cfg, prompt_type="mask")
    step = make_train_step(mcfg, LossConfig(), tx)
    state = TrainState.create(params, tx)
    before = jax.device_get(state.params)
    batch = make_batch(rng, cfg)
    state, metrics = step(state, batch)
    after = jax.device_get(state.params)
    assert np.isfinite(float(metrics[CORE_LOSS_KEY]))
    # frozen: image encoder unchanged
    np.testing.assert_array_equal(
        before["image_encoder"]["trunk"]["patch_embed"]["proj"]["weight"],
        after["image_encoder"]["trunk"]["patch_embed"]["proj"]["weight"])
    # trainable: memory attention moved
    a = before["memory_attention"]["layers"]["0"]["linear1"]["weight"]
    b = after["memory_attention"]["layers"]["0"]["linear1"]["weight"]
    assert np.abs(a - b).max() > 0


def test_grad_accumulation_steps_every_k(rng):
    cfg = tiny_cfg()
    params = sam2_mod.init(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(params, {"lr": 1e-2}, {"enabled": False}, 10,
                        ["memory_attention"], accumulate_grad_batches=2)
    mcfg = VideoModelConfig(sam2=cfg, prompt_type="mask")
    step = make_train_step(mcfg, LossConfig(), tx)
    state = TrainState.create(params, tx)
    batch = make_batch(rng, cfg)
    p0 = np.asarray(
        state.params["memory_attention"]["layers"]["0"]["linear1"]["weight"])
    state, _ = step(state, batch)
    p1 = np.asarray(
        state.params["memory_attention"]["layers"]["0"]["linear1"]["weight"])
    np.testing.assert_array_equal(p0, p1)  # first micro-step: accumulated only
    state, _ = step(state, batch)
    p2 = np.asarray(
        state.params["memory_attention"]["layers"]["0"]["linear1"]["weight"])
    assert np.abs(p2 - p1).max() > 0       # second micro-step applies


def test_data_parallel_step_on_cpu_mesh(rng):
    from sam2_video_tpu.parallel import mesh as mesh_mod
    assert len(jax.devices()) == 8
    mesh = mesh_mod.make_mesh(num_data=8)
    cfg = tiny_cfg()
    params = sam2_mod.init(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(params, {"lr": 1e-3}, {"enabled": False}, 10,
                        ["memory_attention"])
    mcfg = VideoModelConfig(sam2=cfg, prompt_type="mask")
    step = make_train_step(mcfg, LossConfig(), tx, mesh=mesh)
    state = TrainState.create(params, tx)
    state = mesh_mod.replicate(mesh, state)
    batch = mesh_mod.shard_batch(mesh, make_batch(rng, cfg, B=8))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics[CORE_LOSS_KEY]))
    # sharded-batch mean == local mean of identical clips' losses
    state2, metrics2 = step(state, batch)
    assert np.isfinite(float(metrics2[CORE_LOSS_KEY]))


def test_checkpointer_topk_and_restore(tmp_path):
    cfg = tiny_cfg()
    params = sam2_mod.init(jax.random.PRNGKey(0), cfg)
    tx = optax.sgd(1e-3)
    state = TrainState.create(params, tx)
    ck = Checkpointer(tmp_path, save_top_k=2)
    ck.save(state, metric=3.0, epoch=0)
    state2 = TrainState(params=state.params, opt_state=state.opt_state,
                        step=state.step + 1)
    ck.save(state2, metric=1.0, epoch=1)
    state3 = TrainState(params=state.params, opt_state=state.opt_state,
                        step=state.step + 2)
    ck.save(state3, metric=2.0, epoch=2)
    assert len(ck._records) == 2
    assert ck._records[0]["metric"] == 1.0
    restored = ck.restore()
    assert int(restored["step"]) == 1  # best = metric 1.0 at step 1
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["no_mem_embed"]),
        np.asarray(params["no_mem_embed"]))


def test_npz_roundtrip(tmp_path):
    cfg = tiny_cfg()
    params = sam2_mod.init(jax.random.PRNGKey(0), cfg)
    save_params_npz(params, tmp_path / "p.npz")
    loaded = load_params_npz(tmp_path / "p.npz")
    flat_a = _flatten(jax.device_get(params))
    flat_b = _flatten(loaded)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])


def test_converter_layout_roundtrip():
    """Build a synthetic torch-layout state dict from our template via the
    inverse layout transforms, convert, and check exact recovery."""
    cfg = tiny_cfg()
    template = sam2_mod.init(jax.random.PRNGKey(0), cfg)
    flat = _flatten(jax.device_get(template))
    rng = np.random.default_rng(0)
    sd = {}
    for name, v in flat.items():
        x = rng.standard_normal(v.shape).astype(np.float32)
        if v.ndim == 4 and ("pos_embed" in name):
            sd[name] = np.transpose(x, (0, 3, 1, 2))      # NHWC -> NCHW
        elif v.ndim == 4 and "output_upscaling" in name:
            sd[name] = np.transpose(x, (2, 3, 0, 1))      # HWIO -> IOHW
        elif v.ndim == 4 and "maskmem_tpos_enc" not in name:
            sd[name] = np.transpose(x, (3, 2, 0, 1))      # HWIO -> OIHW
        else:
            sd[name] = x
        flat[name] = x
    params, report = convert_state_dict(sd, template, strict=True)
    got = _flatten(params)
    for name in flat:
        np.testing.assert_array_equal(got[name], flat[name], err_msg=name)
    assert not report["missing"] and not report["unexpected"]


def test_data_parallel_eval_step_on_cpu_mesh(rng):
    from sam2_video_tpu.parallel import mesh as mesh_mod
    from sam2_video_tpu.training.loop import make_eval_step
    mesh = mesh_mod.make_mesh(num_data=8)
    cfg = tiny_cfg()
    params = sam2_mod.init(jax.random.PRNGKey(0), cfg)
    params = mesh_mod.replicate(mesh, params)
    mcfg = VideoModelConfig(sam2=cfg, prompt_type="mask")
    estep = make_eval_step(mcfg, LossConfig(), mesh=mesh)
    batch = mesh_mod.shard_batch(mesh, make_batch(rng, cfg, B=8))
    metrics = estep(params, batch)
    assert np.isfinite(float(metrics[CORE_LOSS_KEY]))


def test_amsgrad_torch_parity():
    """scale_by_amsgrad + decoupled decay must reproduce
    torch.optim.AdamW(amsgrad=True) step-for-step (reference
    configs/best.yaml:83 sets amsgrad: true)."""
    import torch

    from sam2_video_tpu.training.optimizer import scale_by_amsgrad

    rng = np.random.default_rng(0)
    p0 = rng.standard_normal((5, 3)).astype(np.float32)
    grads = [rng.standard_normal((5, 3)).astype(np.float32) * (10.0 ** (i % 3))
             for i in range(12)]
    lr, b1, b2, eps, wd = 1e-2, 0.9, 0.99, 1e-8, 0.05

    # torch reference
    tp = torch.nn.Parameter(torch.tensor(p0))
    opt = torch.optim.AdamW([tp], lr=lr, betas=(b1, b2), eps=eps,
                            weight_decay=wd, amsgrad=True)
    for g in grads:
        opt.zero_grad()
        tp.grad = torch.tensor(g)
        opt.step()

    # ours (the make_optimizer amsgrad chain, constant lr)
    tx = optax.chain(scale_by_amsgrad(b1=b1, b2=b2, eps=eps),
                     optax.add_decayed_weights(wd),
                     optax.scale_by_learning_rate(lr))
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]),
                               tp.detach().numpy(), atol=1e-6)

    # amsgrad must actually differ from plain adam on this trajectory
    tx2 = optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=wd)
    params2 = {"w": jnp.asarray(p0)}
    state2 = tx2.init(params2)
    for g in grads:
        updates, state2 = tx2.update({"w": jnp.asarray(g)}, state2, params2)
        params2 = optax.apply_updates(params2, updates)
    assert np.abs(np.asarray(params["w"]) -
                  np.asarray(params2["w"])).max() > 1e-4


def test_make_optimizer_amsgrad_knob(rng):
    """opt_cfg amsgrad=true builds a working transform that moves trainable
    params and keeps frozen ones fixed."""
    cfg = tiny_cfg()
    params = sam2_mod.init(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(params, {"lr": 1e-3, "type": "AdamW",
                                 "amsgrad": True, "weight_decay": 0.01},
                        {"enabled": False}, total_steps=10,
                        trainable_modules=["memory_attention"])
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    ma_delta = max(float(jnp.abs(x).max())
                   for x in jax.tree.leaves(updates["memory_attention"]))
    ie_delta = max(float(jnp.abs(x).max())
                   for x in jax.tree.leaves(updates["image_encoder"]))
    assert ma_delta > 0.0 and ie_delta == 0.0


@pytest.mark.parametrize("remat", ["body", "body_dots", "modules"])
def test_remat_modes_match_no_remat(rng, remat):
    """Every rematerialization mode must reproduce the no-remat loss AND
    gradients exactly (remat re-runs the same ops; it may never change
    numerics) — guards the selective-remat policies used for B>1 training."""
    from functools import partial

    from sam2_video_tpu.models.video_model import forward_train
    from sam2_video_tpu.training.loop import batched_loss_fn
    from sam2_video_tpu.models import VideoModelConfig

    batch = make_batch(rng, tiny_cfg(), B=1, T=3)

    def loss_and_grads(remat_mode):
        cfg = tiny_cfg(use_activation_checkpoint=(remat_mode != "none"),
                       remat_mode=remat_mode)
        mcfg = VideoModelConfig(sam2=cfg, prompt_type="point")
        params = sam2_mod.init(jax.random.PRNGKey(1), cfg)
        loss_fn = batched_loss_fn(mcfg, LossConfig())
        (loss, _), grads = jax.jit(jax.value_and_grad(
            loss_fn, has_aux=True))(params, batch)
        return jax.device_get(loss), jax.device_get(grads)

    l0, g0 = loss_and_grads("none")
    l1, g1 = loss_and_grads(remat)
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    for (p0, a), (p1, b) in zip(sorted(_flatten(g0).items()),
                                sorted(_flatten(g1).items())):
        assert p0 == p1
        np.testing.assert_allclose(
            a, b, atol=1e-5, rtol=1e-4,
            err_msg=f"grad diverged under remat={remat} at {p0}")


def test_stacked_frame_grads_match(rng):
    """stacked_frame_grads restructures HOW per-frame weight cotangents are
    accumulated (one stacked buffer + one reduction per weight) — it may
    never change the loss or the gradients beyond reassociation noise."""
    from sam2_video_tpu.training.loop import batched_loss_fn

    batch = make_batch(rng, tiny_cfg(), B=1, T=4)

    def loss_and_grads(stacked):
        cfg = tiny_cfg(stacked_frame_grads=stacked)
        mcfg = VideoModelConfig(sam2=cfg, prompt_type="point")
        params = sam2_mod.init(jax.random.PRNGKey(1), cfg)
        loss_fn = batched_loss_fn(mcfg, LossConfig())
        (loss, _), grads = jax.jit(jax.value_and_grad(
            loss_fn, has_aux=True))(params, batch)
        return jax.device_get(loss), jax.device_get(grads)

    l0, g0 = loss_and_grads(False)
    l1, g1 = loss_and_grads(True)
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    for (p0, a), (p1, b) in zip(sorted(_flatten(g0).items()),
                                sorted(_flatten(g1).items())):
        assert p0 == p1
        np.testing.assert_allclose(
            a, b, atol=1e-5, rtol=1e-4,
            err_msg=f"grad diverged under stacked_frame_grads at {p0}")
