"""Optimizer / schedule / module-freezing (the configure_optimizers
equivalent, reference trainer.py:118-177 + sam2model.py:567-575).

- AdamW/Adam via optax with the reference's hyperparameters, including
  ``amsgrad: true`` (configs/best.yaml:83) via the ``scale_by_amsgrad``
  transform below (optax has no built-in; torch-parity tested).
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


def scale_by_amsgrad(b1: float = 0.9, b2: float = 0.999,
                     eps: float = 1e-8) -> optax.GradientTransformation:
    """AMSGrad variant of scale_by_adam: the second moment used in the
    denominator is the running elementwise MAX of the EMA (torch
    optim.Adam(amsgrad=True) semantics, incl. bias correction):

        nu_max <- max(nu_max, nu);  update = (mu/bc1) / (sqrt(nu_max/bc2)+eps)

    Reference knob: configs/best.yaml:83 ``amsgrad: true``.
    """
    import chex

    @chex.dataclass
    class State:
        count: jnp.ndarray
        mu: object
        nu: object
        nu_max: object

    def init_fn(params):
        z = lambda: jax.tree.map(jnp.zeros_like, params)
        return State(count=jnp.zeros((), jnp.int32), mu=z(), nu=z(),
                     nu_max=z())

    def update_fn(updates, state, params=None):
        del params
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * (g * g),
                          state.nu, updates)
        nu_max = jax.tree.map(jnp.maximum, state.nu_max, nu)
        count = state.count + 1
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        out = jax.tree.map(
            lambda m, vm: (m / bc1) / (jnp.sqrt(vm / bc2) + eps), mu, nu_max)
        return out, State(count=count, mu=mu, nu=nu, nu_max=nu_max)

    return optax.GradientTransformation(init_fn, update_fn)


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
    b1, b2 = float(betas[0]), float(betas[1])
    eps = float(opt_cfg.get("eps", 1e-8))
    wd = float(opt_cfg.get("weight_decay", 0.0))
    is_adamw = str(opt_cfg.get("type", "AdamW")).lower() == "adamw"
    if bool(opt_cfg.get("amsgrad", False)):
        # torch AdamW(amsgrad=True): decoupled decay + max-second-moment;
        # plain Adam applies (additive) decay the same way optax.chain does
        inner = optax.chain(
            scale_by_amsgrad(b1=b1, b2=b2, eps=eps),
            optax.add_decayed_weights(wd) if is_adamw else optax.identity(),
            optax.scale_by_learning_rate(schedule),
            optax.identity() if is_adamw else
            optax.add_decayed_weights(-wd))
    elif is_adamw:
        inner = optax.adamw(schedule, b1=b1, b2=b2, eps=eps,
                            weight_decay=wd)
    else:
        inner = optax.chain(
            optax.adam(schedule, b1=b1, b2=b2, eps=eps),
            optax.add_decayed_weights(-wd))

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
