"""jit-compiled train/eval steps + the epoch loop (the Lightning-module
equivalent, reference training/trainer.py).

TPU-first: one XLA program per step — forward (batched backbone + scan
recurrence), loss, backward, optimizer update — with donated state, params
replicated and the clip batch sharded over the ``data`` mesh axis (GSPMD
data parallelism, SURVEY.md §5.8). Gradients all-reduce over ICI via the
sharded-autodiff mean; no explicit collectives."""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Callable

import chex
import jax
import jax.numpy as jnp
import optax

from ..data.types import VideoClip, VideoClipBatch
from ..models.video_model import VideoModelConfig, forward_train
from ..parallel import mesh as mesh_mod
from .losses import CORE_LOSS_KEY, LossConfig, compute_loss


@chex.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params, tx):
        return cls(params=params, opt_state=tx.init(params),
                   step=jnp.zeros((), jnp.int32))


def batched_loss_fn(mcfg: VideoModelConfig, lcfg: LossConfig,
                    training: bool = True) -> Callable:
    """params, VideoClipBatch -> (scalar loss, dict of scalar metrics).
    vmaps the per-clip forward over the batch axis; mean over clips matches
    the reference's per-step loss at B=1 and generalizes beyond it."""

    def per_clip(params, clip: VideoClip):
        _, per_cat = forward_train(params, mcfg, clip, training=training)
        return compute_loss(lcfg, per_cat, clip.cat_masks)

    def loss_fn(params, batch: VideoClipBatch):
        clip = VideoClip(
            images=batch.images, cat_masks=batch.cat_masks,
            obj_masks=batch.obj_masks, obj_to_cat=batch.obj_to_cat,
            point_coords=batch.point_coords, point_labels=batch.point_labels)
        losses = jax.vmap(partial(per_clip, params))(clip)
        losses = jax.tree.map(lambda x: jnp.mean(x), losses)
        return losses[CORE_LOSS_KEY], losses

    return loss_fn


def make_train_step(mcfg: VideoModelConfig, lcfg: LossConfig, tx,
                    mesh=None, trainable_modules=None) -> Callable:
    """When ``trainable_modules`` is given, gradients are computed ONLY with
    respect to those subtrees (plus bare params) — the reference's
    requires_grad=False equivalent. This prunes the entire backward pass of
    frozen modules (e.g. the Hiera encoder under the default mem-only
    fine-tuning combos) instead of computing and zeroing their grads."""
    from .optimizer import partition_params

    if (trainable_modules is not None
            and "image_encoder" not in trainable_modules
            and not mcfg.sam2.fused_backbone):
        # frozen encoder -> no cotangent ever reaches the trunk, so the
        # forward-only fused Hiera block kernel is legal during training
        mcfg = dataclasses.replace(
            mcfg, sam2=dataclasses.replace(mcfg.sam2, fused_backbone=True))
    elif ((trainable_modules is None or "image_encoder" in trainable_modules)
          and not mcfg.sam2.fused_backbone
          and not mcfg.sam2.fused_backbone_vjp):
        # trainable encoder -> the trunk needs gradients; use the
        # differentiable fused kernel (custom-VJP Pallas backward)
        mcfg = dataclasses.replace(
            mcfg, sam2=dataclasses.replace(mcfg.sam2,
                                           fused_backbone_vjp=True))

    loss_fn = batched_loss_fn(mcfg, lcfg, training=True)

    def step_fn(state: TrainState, batch: VideoClipBatch):
        if trainable_modules is None:
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, batch)
        else:
            train_p, frozen_p = partition_params(state.params,
                                                 trainable_modules)
            frozen_p = jax.lax.stop_gradient(frozen_p)

            def loss_on_trainable(tp, batch):
                return loss_fn({**frozen_p, **tp}, batch)

            (_, metrics), grads_t = jax.value_and_grad(
                loss_on_trainable, has_aux=True)(train_p, batch)
            grads = {**jax.tree.map(jnp.zeros_like, frozen_p), **grads_t}
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))
    repl = mesh_mod.replicated(mesh)
    data = mesh_mod.data_sharded(mesh)
    return jax.jit(
        step_fn, donate_argnums=(0,),
        in_shardings=(repl, data), out_shardings=(repl, repl))


def make_eval_step(mcfg: VideoModelConfig, lcfg: LossConfig,
                   mesh=None) -> Callable:
    loss_fn = batched_loss_fn(mcfg, lcfg, training=False)

    def step_fn(params, batch: VideoClipBatch):
        _, metrics = loss_fn(params, batch)
        return metrics

    if mesh is None:
        return jax.jit(step_fn)
    repl = mesh_mod.replicated(mesh)
    data = mesh_mod.data_sharded(mesh)
    return jax.jit(step_fn, in_shardings=(repl, data), out_shardings=repl)


# ---------------------------------------------------------------------------
# Epoch-level fit loop (host orchestration)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class FitResult:
    state: TrainState
    history: list
    best_val: float


def fit(state: TrainState, train_step, eval_step, train_loader, val_loader,
        max_epochs: int, mesh=None, limit_train_batches: int | None = None,
        limit_val_batches: int | None = None, log_every: int = 20,
        logger=None, checkpointer=None, val_check_interval: float = 1.0,
        step_timer: list | None = None, viz_fn=None,
        viz_every_n_steps: int = 0, start_epoch: int = 0) -> FitResult:
    """Minimal deterministic fit loop: per-epoch train + val, metric logging,
    best-checkpoint tracking (monitor val/total_loss like the reference's
    ModelCheckpoint, configs/config.yaml:127-134), optional GIF-viz hook
    (trainer.py:205-252 parity) and epoch-resume via ``start_epoch``."""
    history = []
    best_val = float("inf")

    def log(split, step, metrics):
        rec = {"split": split, "step": int(step),
               **{k: float(v) for k, v in metrics.items()}}
        history.append(rec)
        if logger is not None:
            logger.log(rec)

    def put(batch):
        if mesh is not None:
            return mesh_mod.shard_batch(mesh, batch)
        return batch

    def run_val(epoch):
        nonlocal best_val
        if val_loader is None:
            return
        agg, n = {}, 0
        for bi, batch in enumerate(val_loader):
            if limit_val_batches is not None and bi >= limit_val_batches:
                break
            m = eval_step(state.params, put(batch))
            m = {k: float(v) for k, v in m.items()}
            for k, v in m.items():
                agg[k] = agg.get(k, 0.0) + v
            n += 1
        if n == 0:
            return
        m = {f"val/{k}": v / n for k, v in agg.items()}
        log("val", int(state.step), m)
        vloss = m.get(f"val/{CORE_LOSS_KEY}", float("inf"))
        if checkpointer is not None:
            checkpointer.save(state, metric=vloss, epoch=epoch)
        best_val = min(best_val, vloss)

    for epoch in range(start_epoch, max_epochs):
        nb = len(train_loader)
        if limit_train_batches is not None:
            nb = min(nb, limit_train_batches)
        val_every = (max(1, int(nb * val_check_interval))
                     if val_check_interval and val_check_interval < 1.0
                     else None)
        for bi, batch in enumerate(train_loader):
            if limit_train_batches is not None and bi >= limit_train_batches:
                break
            batch = put(batch)
            t0 = time.perf_counter()
            state, metrics = train_step(state, batch)
            if step_timer is not None:
                jax.device_get(metrics[CORE_LOSS_KEY])
                step_timer.append(time.perf_counter() - t0)
            step_i = int(state.step)
            if step_i % max(log_every, 1) == 0:
                log("train", step_i,
                    {f"train/{k}": v for k, v in metrics.items()})
            if (viz_fn is not None and viz_every_n_steps > 0
                    and step_i % viz_every_n_steps == 0):
                viz_fn(state.params, batch, step_i)
            if val_every and (bi + 1) % val_every == 0:
                run_val(epoch)
        if not val_every:
            run_val(epoch)
    return FitResult(state=state, history=history, best_val=best_val)
