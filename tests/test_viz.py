"""Visualization utilities: composite layout, overlays, GIF writing."""

import numpy as np

from sam2_video_tpu.utils.viz import (composite_frame,
                                      create_visualization_gif,
                                      denormalize_image, draw_points,
                                      overlay_masks)


def _norm_img(rng, h=32, w=48):
    return rng.standard_normal((h, w, 3)).astype(np.float32) * 0.5


def test_denormalize_roundtrip(rng):
    img = _norm_img(rng)
    out = denormalize_image(img)
    assert out.dtype == np.uint8
    assert out.shape == (32, 48, 3)


def test_overlay_and_points(rng):
    base = denormalize_image(_norm_img(rng))
    masks = np.zeros((2, 32, 48), bool)
    masks[0, 5:15, 5:15] = True
    over = overlay_masks(base, masks)
    assert (over[8, 8] != base[8, 8]).any()       # blended region changed
    assert (over[30, 40] == base[30, 40]).all()   # untouched region intact
    pts = draw_points(base, np.asarray([[10.0, 20.0]]), np.asarray([1]))
    assert tuple(pts[20, 10]) == (0, 255, 0)


def test_composite_is_2x2(rng):
    img = _norm_img(rng)
    gt = np.zeros((2, 32, 48), bool)
    pred = np.zeros((2, 32, 48), bool)
    comp = composite_frame(img, gt, pred,
                           point_coords=np.asarray([[5.0, 5.0]]),
                           point_labels=np.asarray([1]))
    assert comp.shape == (64, 96, 3)


def test_gif_writer(tmp_path, rng):
    T, C, H, W = 3, 2, 32, 48
    frames = np.stack([_norm_img(rng) for _ in range(T)])
    gt = np.zeros((T, C, H, W), bool)
    logits = rng.standard_normal((T, C, 1, H, W)).astype(np.float32)
    path = tmp_path / "viz.gif"
    out = create_visualization_gif(frames, gt, logits, max_length=2,
                                   path=path)
    assert out.shape == (2, 64, 96, 3)
    assert path.exists() and path.stat().st_size > 0
