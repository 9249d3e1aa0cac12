"""Prompt-sampler tests incl. the interactive-correction samplers."""

import numpy as np
import pytest

from sam2_video_tpu.utils import prompts as P


def _obj_masks():
    m = np.zeros((2, 32, 32), np.float32)
    m[0, 4:12, 4:12] = 1
    m[1, 20:30, 18:28] = 1
    return m


def test_cat_to_obj_masks_split_and_cap():
    cat = np.zeros((2, 64, 64), bool)
    cat[0, 5:15, 5:15] = True
    cat[0, 40:55, 40:55] = True  # second component, same category
    cat[1, 25:35, 25:35] = True
    obj, o2c = P.cat_to_obj_masks(cat, max_objects=4)
    valid = o2c >= 0
    assert valid.sum() == 3
    assert sorted(o2c[valid].tolist()) == [0, 0, 1]
    # cap drops the smallest component
    obj2, o2c2 = P.cat_to_obj_masks(cat, max_objects=2)
    assert (o2c2 >= 0).sum() == 2


def test_cat_to_obj_fail_fast_on_empty():
    with pytest.raises(ValueError):
        P.cat_to_obj_masks(np.zeros((2, 16, 16), bool), max_objects=4)


def test_sample_box_points_noise_bounds(rng):
    m = _obj_masks()
    coords, labels = P.sample_box_points(m, rng, noise=0.2)
    assert (labels == [2, 3]).all()
    # corners stay within the image
    assert (coords >= 0).all() and (coords < 32).all()
    # zero noise reproduces the exact bbox
    coords0, _ = P.sample_box_points(m, rng, noise=0.0)
    np.testing.assert_array_equal(coords0[0, 0], [4, 4])
    np.testing.assert_array_equal(coords0[0, 1], [11, 11])


def test_sample_random_points_from_errors(rng):
    gt = _obj_masks() > 0
    pred = np.zeros_like(gt)
    pred[0, 4:12, 4:12] = True      # obj 0 perfect
    pred[1, 0:5, 0:5] = True        # obj 1: FP at top-left, FN at target
    pts, lbl = P.sample_random_points_from_errors(gt, pred, rng, num_pt=4)
    # obj 0 all-correct -> negative clicks in background
    assert (lbl[0] == 0).all()
    for x, y in pts[0]:
        assert not gt[0, int(y), int(x)]
    # obj 1: positive clicks land in FN region, negative in FP region
    for (x, y), l in zip(pts[1], lbl[1]):
        if l == 1:
            assert gt[1, int(y), int(x)] and not pred[1, int(y), int(x)]
        else:
            assert pred[1, int(y), int(x)] and not gt[1, int(y), int(x)]


def test_sample_one_point_from_error_center():
    gt = _obj_masks() > 0
    pred = np.zeros_like(gt)
    pts, lbl = P.sample_one_point_from_error_center(gt, pred)
    # with empty predictions the click is positive at the FN interior
    assert (lbl == 1).all()
    x, y = pts[0, 0]
    assert gt[0, int(y), int(x)]
    # roughly the center of the 4:12 square
    assert abs(x - 7.5) <= 2 and abs(y - 7.5) <= 2


def test_get_next_point_dispatch(rng):
    gt = _obj_masks() > 0
    for method in ("uniform", "center"):
        pts, lbl = P.get_next_point(gt, None, method, rng)
        assert pts.shape[0] == 2
    with pytest.raises(ValueError):
        P.get_next_point(gt, None, "bogus")
