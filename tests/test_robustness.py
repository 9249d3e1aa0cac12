"""Robustness checks: seeded determinism, bf16-vs-f32 forward consistency,
prompt-noise adder semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sam2_video_tpu.eval.noise import PromptObjNoiseAdder
from sam2_video_tpu.eval.utils import PromptObj
from sam2_video_tpu.models import VideoModelConfig, forward_train
from sam2_video_tpu.models import sam2 as sam2_mod
from sam2_video_tpu.models.sam2 import SAM2Config
from tests.test_model_forward import make_clip, tiny_cfg


def test_forward_deterministic(rng):
    cfg = tiny_cfg()
    params = sam2_mod.init(jax.random.PRNGKey(0), cfg)
    mcfg = VideoModelConfig(sam2=cfg, prompt_type="point")
    clip = make_clip(rng, cfg, T=2, O=2, C=3)
    a, _ = forward_train(params, mcfg, clip, training=False)
    b, _ = forward_train(params, mcfg, clip, training=False)
    np.testing.assert_array_equal(np.asarray(a["high_res_multimasks"]),
                                  np.asarray(b["high_res_multimasks"]))


def test_bf16_forward_consistent_with_f32(rng):
    """bf16 compute must stay close to f32 (catches dtype-cast bugs that
    silently zero or saturate activations)."""
    f32 = tiny_cfg()
    bf16 = tiny_cfg(compute_dtype="bfloat16")
    params = sam2_mod.init(jax.random.PRNGKey(0), f32)
    clip = make_clip(rng, f32, T=2, O=2, C=3)
    m32 = VideoModelConfig(sam2=f32, prompt_type="mask")
    m16 = VideoModelConfig(sam2=bf16, prompt_type="mask")
    a, _ = forward_train(params, m32, clip, training=False)
    b, _ = forward_train(params, m16, clip, training=False)
    pa = 1 / (1 + np.exp(-np.asarray(a["high_res_multimasks"], np.float64)))
    pb = 1 / (1 + np.exp(-np.asarray(b["high_res_multimasks"], np.float64)))
    # probabilities agree closely; binarized masks nearly identical
    assert np.abs(pa - pb).mean() < 0.02
    agree = np.mean((pa > 0.5) == (pb > 0.5))
    assert agree > 0.99


def _obj():
    m = np.zeros((64, 64), np.uint8)
    m[20:40, 20:40] = 1
    return PromptObj(mask=m.astype(bool), bbox=[20.0, 20.0, 39.0, 39.0],
                     points=np.asarray([[30.0, 30.0]], np.float32),
                     obj_id=3, pos_or_neg_label=np.asarray([1.0]))


def test_noise_adder_mask():
    adder = PromptObjNoiseAdder("shift_scale", 0.2, seed=0)
    changed = 0
    for _ in range(20):
        o = adder.add_noise_to_obj(_obj(), "mask")
        if o is None:
            continue
        assert o.mask.dtype == bool
        assert o.mask.shape == (64, 64)
        if o.mask.sum() != 400:
            changed += 1
    assert changed > 0  # perturbations actually happen


def test_noise_adder_bbox_bounds():
    adder = PromptObjNoiseAdder("shift_scale", 0.3, seed=1)
    for _ in range(30):
        o = adder.add_noise_to_obj(_obj(), "bbox")
        if o is None:
            continue
        x0, y0, x1, y1 = o.bbox
        assert 0 <= x0 < x1 <= 63 and 0 <= y0 < y1 <= 63


def test_noise_adder_points_passthrough():
    adder = PromptObjNoiseAdder("shift_scale", 0.3, seed=2)
    o = adder.add_noise_to_obj(_obj(), "points")
    np.testing.assert_array_equal(o.points, _obj().points)


def test_noise_adder_invalid_type():
    with pytest.raises(ValueError):
        PromptObjNoiseAdder("bogus", 0.1)
