"""Cross-validation of the two recurrence implementations: the training
lax.scan (models/video_model.py) and the host-driven eval predictor
(eval/predictor.py) must produce the same per-frame logits for the same
weights, features and prompts (training=False, cond at frame 0, r=1) —
they implement identical reference semantics through different machinery."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sam2_video_tpu.data.types import VideoClip
from sam2_video_tpu.eval.predictor import InferenceState, VideoPredictor
from sam2_video_tpu.models import VideoModelConfig, forward_train
from sam2_video_tpu.models import sam2 as sam2_mod
from sam2_video_tpu.models.sam2 import SAM2Config


@pytest.mark.slow
def test_scan_matches_predictor(rng):
    cfg = SAM2Config(image_size=128, compute_dtype="float32",
                     use_activation_checkpoint=False)
    params = sam2_mod.init(jax.random.PRNGKey(0), cfg)
    T, O, H = 4, 2, cfg.image_size
    images = rng.standard_normal((T, H, H, 3)).astype(np.float32)
    coords = np.asarray([[[30.0, 30.0]], [[90.0, 90.0]]], np.float32)
    labels = np.ones((O, 1), np.int32)

    # --- training-scan path ---
    clip = VideoClip(
        images=jnp.asarray(images),
        cat_masks=jnp.zeros((T, 2, H, H), bool).at[:, 0, 20:40, 20:40].set(
            True).at[:, 1, 80:100, 80:100].set(True),
        obj_masks=jnp.zeros((O, H, H), jnp.float32),
        obj_to_cat=jnp.asarray([0, 1], jnp.int32),
        point_coords=jnp.asarray(coords), point_labels=jnp.asarray(labels))
    mcfg = VideoModelConfig(sam2=cfg, prompt_type="point")
    per_obj, _ = forward_train(params, mcfg, clip, training=False)
    train_logits = np.asarray(per_obj["high_res_masks"])  # [T, O, 1, H, H]

    # --- eval-predictor path on the SAME backbone features ---
    pred = VideoPredictor(params, cfg, max_objects=O)
    feats = sam2_mod.forward_image(params, cfg, jnp.asarray(images))
    state = InferenceState(
        num_frames=T, orig_hw=(H, H),
        feats=tuple(feats["backbone_fpn"]), prompts={}, obj_order=[])
    for o in range(O):
        pred.add_new_points_or_box(state, 0, obj_id=o, points=coords[o],
                                   labels=labels[o])
    eval_logits = {}
    for fi, ids, logits, score in pred.propagate_in_video(state):
        eval_logits[fi] = logits  # [O, 1, S/4, S/4] f16 (stored resolution)

    from sam2_video_tpu.ops.resize import resize_bilinear
    for t in range(T):
        # the train path's high_res IS resize(low_res); upsampling the
        # predictor's low-res yield with the same op must reproduce it
        got = np.asarray(resize_bilinear(
            jnp.asarray(eval_logits[t], jnp.float32), (H, H)))
        want = train_logits[t]
        # f16 packing quantizes the eval side; compare at f16 resolution
        np.testing.assert_allclose(got, want, atol=0.05, rtol=0.02,
                                   err_msg=f"frame {t}")
        # binarized masks may differ ONLY where the logit is ~0 (f16
        # quantization of the low-res fetch flips near-zero boundary
        # pixels after upsampling)
        flipped = (got > 0) != (want > 0)
        assert np.abs(want[flipped]).max(initial=0.0) < 0.05, f"frame {t}"
        assert flipped.mean() < 1e-3, f"frame {t} mask"
