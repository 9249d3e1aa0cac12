"""All Hiera model-family presets build and produce correct feature pyramids
(tiny / small / base_plus / large — the reference supports every SAM2.1
variant via configs/sam2/*.yaml)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sam2_video_tpu.models import hiera, image_encoder
from sam2_video_tpu.ops.common import param_count

EXPECTED_CHANNELS = {
    "tiny": (768, 384, 192, 96),
    "small": (768, 384, 192, 96),
    "base_plus": (896, 448, 224, 112),
    "large": (1152, 576, 288, 144),
}

# published param counts for the image encoder trunk are in the tens of
# millions; sanity ranges per family (trunk only)
PARAM_RANGES = {
    "tiny": (25e6, 30e6),
    "small": (30e6, 40e6),
    "base_plus": (65e6, 75e6),
    "large": (200e6, 230e6),
}


@pytest.mark.parametrize("name", ["tiny", "small", "base_plus", "large"])
def test_preset_builds_and_runs(name):
    cfg = hiera.HIERA_PRESETS[name]
    assert cfg.channel_list == EXPECTED_CHANNELS[name]
    params = hiera.init(jax.random.PRNGKey(0), cfg)
    n = param_count(params)
    lo, hi = PARAM_RANGES[name]
    assert lo < n < hi, f"{name}: {n}"
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 128, 128, 3)).astype(np.float32))
    outs = hiera.apply(params, x, cfg)
    assert len(outs) == 4
    # strides 4/8/16/32 with doubling channels
    for i, (o, ch) in enumerate(zip(outs, EXPECTED_CHANNELS[name][::-1])):
        s = 4 * (2 ** i)
        assert o.shape == (1, 128 // s, 128 // s, ch), (name, i, o.shape)
        assert np.isfinite(np.asarray(o)).all()


def test_image_encoder_small_preset():
    cfg = image_encoder.ImageEncoderConfig(trunk=hiera.HIERA_PRESETS["small"])
    params = image_encoder.init(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 128, 128, 3))
    out = image_encoder.apply(params, x, cfg)
    assert len(out["backbone_fpn"]) == 3  # scalp drops stride-32
    assert out["backbone_fpn"][0].shape == (1, 32, 32, 256)
    assert out["vision_features"].shape == (1, 8, 8, 256)
