"""Single-clip overfit convergence — the reference's own smoke/convergence
strategy (configs/overfit.yaml, SURVEY.md §4.2): train on one clip and watch
the loss drop. Tiny image size + random init keeps it CPU-feasible."""

import numpy as np
import pytest

import jax

from sam2_video_tpu.models import SAM2Config, VideoModelConfig
from sam2_video_tpu.models import sam2 as sam2_mod
from sam2_video_tpu.training.losses import CORE_LOSS_KEY, LossConfig
from sam2_video_tpu.training.loop import TrainState, make_train_step
from sam2_video_tpu.training.optimizer import make_optimizer
from tests.test_training import make_batch, tiny_cfg


@pytest.mark.slow
def test_single_clip_overfit(rng):
    cfg = tiny_cfg()
    params = sam2_mod.init(jax.random.PRNGKey(0), cfg)
    # train everything except the encoder so convergence is fast from random
    tm = ["memory_attention", "memory_encoder", "mask_decoder",
          "prompt_encoder"]
    tx = make_optimizer(params, {"lr": 3e-4, "type": "AdamW",
                                 "weight_decay": 0.0},
                        {"enabled": False}, total_steps=100,
                        trainable_modules=tm, gradient_clip_val=1.0)
    mcfg = VideoModelConfig(sam2=cfg, prompt_type="mask")
    step = make_train_step(mcfg, LossConfig(type="bce"), tx,
                           trainable_modules=tm)
    state = TrainState.create(params, tx)
    batch = make_batch(rng, cfg, T=2)

    losses = []
    for _ in range(20):
        state, metrics = step(state, batch)
        losses.append(float(metrics[CORE_LOSS_KEY]))
    assert np.isfinite(losses).all()
    # loss must drop substantially on the fixed clip
    assert losses[-1] < 0.6 * losses[0], losses
    # and monotonically-ish: final < min of first three
    assert losses[-1] < min(losses[:3])
