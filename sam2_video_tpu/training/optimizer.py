"""Optimizer / schedule / module-freezing (the configure_optimizers
equivalent, reference trainer.py:118-177 + sam2model.py:567-575).

- AdamW/Adam via optax with the reference's hyperparameters (note: the
  reference sometimes sets ``amsgrad: true``; optax's adamw has no amsgrad —
  documented divergence, negligible for fine-tuning).
- Cosine-with-warmup schedule reproducing transformers'
  ``get_cosine_schedule_with_warmup`` arithmetic exactly.
- Freezing: ``optax.multi_transform`` labels each top-level module frozen or
  trainable. Reference quirk preserved: bare top-level params
  (maskmem_tpos_enc, no_mem_embed, no_obj_ptr, mask_downsample, ...) are not
  covered by the module mapping and therefore stay trainable regardless of
  ``trainable_modules`` (model_utils.py:38-50 only touches mapped modules).
- Gradient accumulation via optax.MultiSteps (reference
  ``accumulate_grad_batches``).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import optax

from ..models.sam2 import MODULE_MAPPING


def cosine_schedule_with_warmup(peak_lr: float, warmup_steps: int,
                                total_steps: int, num_cycles: float = 0.5):
    """transformers get_cosine_schedule_with_warmup parity."""
    warmup_steps = max(int(warmup_steps), 0)
    total_steps = max(int(total_steps), 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warmup_steps, 1)
        progress = (step - warmup_steps) / jnp.maximum(
            total_steps - warmup_steps, 1)
        cos_factor = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * num_cycles * 2.0 * progress)))
        return peak_lr * jnp.where(step < warmup_steps, warm, cos_factor)

    return schedule


def top_level_label(top_key: str, trainable_modules: Sequence[str]) -> str:
    mapped_keys = {v[0]: k for k, v in MODULE_MAPPING.items()}
    if top_key in mapped_keys:
        return ("train" if mapped_keys[top_key] in trainable_modules
                else "freeze")
    return "train"  # bare params: reference leaves them trainable


def partition_params(params, trainable_modules: Sequence[str]):
    """Split the param dict into (trainable, frozen) top-level subtrees."""
    train = {k: v for k, v in params.items()
             if top_level_label(k, trainable_modules) == "train"}
    frozen = {k: v for k, v in params.items() if k not in train}
    return train, frozen


def trainable_labels(params, trainable_modules: Sequence[str]):
    """Label tree: 'train' / 'freeze' per top-level entry."""
    return {
        k: jax.tree.map(lambda _: top_level_label(k, trainable_modules), v)
        for k, v in params.items()
    }


def make_optimizer(params, opt_cfg, sched_cfg, total_steps: int,
                   trainable_modules: Sequence[str],
                   gradient_clip_val: float = 1.0,
                   accumulate_grad_batches: int = 1):
    """Returns an optax GradientTransformation. ``opt_cfg``/``sched_cfg`` are
    config nodes with the reference's knob names."""
    lr = float(opt_cfg.get("lr", 1e-4))
    if bool(sched_cfg.get("enabled", True)):
        wf = opt_cfg.get("warmup_factor", None)
        warmup = (int(total_steps * float(wf)) if wf is not None
                  else int(sched_cfg.get("warmup_steps", 500)))
        warmup = min(warmup, max(total_steps - 1, 0))
        schedule = cosine_schedule_with_warmup(
            lr, warmup, total_steps,
            float(sched_cfg.get("num_cycles", 0.5)))
    else:
        schedule = lr

    betas = opt_cfg.get("betas", [0.9, 0.999])
    if str(opt_cfg.get("type", "AdamW")).lower() == "adamw":
        inner = optax.adamw(schedule, b1=float(betas[0]), b2=float(betas[1]),
                            eps=float(opt_cfg.get("eps", 1e-8)),
                            weight_decay=float(opt_cfg.get("weight_decay", 0.0)))
    else:
        inner = optax.chain(
            optax.adam(schedule, b1=float(betas[0]), b2=float(betas[1]),
                       eps=float(opt_cfg.get("eps", 1e-8))),
            optax.add_decayed_weights(
                -float(opt_cfg.get("weight_decay", 0.0))))

    tx = optax.chain(
        optax.clip_by_global_norm(float(gradient_clip_val)),
        inner,
    )
    labels = trainable_labels(params, trainable_modules)
    tx = optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels)
    if accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=int(accumulate_grad_batches))
    return tx
