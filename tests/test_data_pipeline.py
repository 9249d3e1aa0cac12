"""Data pipeline tests over a synthetic on-disk COCO video dataset."""

import numpy as np
import pytest

from sam2_video_tpu.data.coco import COCOIndex, clip_windows
from sam2_video_tpu.data.pipeline import (ClipDataset, ClipDatasetConfig,
                                          ClipLoader)
from sam2_video_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def dataset_path(tmp_path_factory):
    return make_synthetic_dataset(tmp_path_factory.mktemp("synth"),
                                  num_videos=2, frames_per_video=12)


def test_index_structure(dataset_path):
    index = COCOIndex(dataset_path, image_size=128)
    assert index.num_categories == 3
    assert len(index.video_to_images) == 2
    for vid, imgs in index.video_to_images.items():
        orders = [im["order_in_video"] for im in imgs]
        assert orders == sorted(orders)


def test_clip_windows(dataset_path):
    index = COCOIndex(dataset_path, image_size=128)
    clips = clip_windows(index, clip_length=4, stride=4)
    # 12 frames per video, window 4, stride 4 -> 3 clips per video
    assert len(clips) == 6
    clips2 = clip_windows(index, clip_length=10, stride=10)
    assert len(clips2) == 2


def test_mask_loading_and_transform(dataset_path):
    index = COCOIndex(dataset_path, image_size=96)
    masks = index.load_masks(index.images[0]["id"])
    assert masks.shape == (3, 96, 96)
    assert masks.any()
    # cache hit returns same array
    assert index.load_masks(index.images[0]["id"]) is masks


def test_image_normalization(dataset_path):
    index = COCOIndex(dataset_path, image_size=96)
    img = index.load_image(0)
    assert img.shape == (96, 96, 3)
    assert img.dtype == np.float32
    assert -3 < img.mean() < 3


def test_clip_dataset_sample(dataset_path):
    index = COCOIndex(dataset_path, image_size=96)
    ds = ClipDataset(index, ClipDatasetConfig(
        clip_length=4, stride=4, prompt_type="point", max_objects=6,
        num_pos_points=2))
    s = ds.get(0, np.random.default_rng(0))
    assert s["images"].shape == (4, 96, 96, 3)
    assert s["cat_masks"].shape == (4, 3, 96, 96)
    assert s["obj_masks"].shape == (6, 96, 96)
    assert s["obj_to_cat"].shape == (6,)
    valid = s["obj_to_cat"] >= 0
    assert valid.sum() >= 1
    # prompts: valid objects have positive labels, padded have -1
    assert (s["point_labels"][valid] == 1).all()
    assert (s["point_labels"][~valid] == -1).all()
    # point coords must lie inside the object mask (center or sampled)
    for o in np.flatnonzero(valid):
        x, y = s["point_coords"][o, 1]  # second point is a sampled pixel
        assert s["obj_masks"][o, int(y), int(x)] > 0


def test_box_prompts(dataset_path):
    index = COCOIndex(dataset_path, image_size=96)
    ds = ClipDataset(index, ClipDatasetConfig(
        clip_length=4, stride=4, prompt_type="box", max_objects=6))
    s = ds.get(0, np.random.default_rng(0))
    valid = s["obj_to_cat"] >= 0
    assert (s["point_labels"][valid] == [2, 3]).all()


def test_loader_batching_and_sharding(dataset_path):
    index = COCOIndex(dataset_path, image_size=96)
    ds = ClipDataset(index, ClipDatasetConfig(clip_length=4, stride=4))
    loader = ClipLoader(ds, batch_size=2, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0].images.shape == (2, 4, 96, 96, 3)
    # host sharding splits the index set
    l0 = ClipLoader(ds, batch_size=1, shuffle=False, process_index=0,
                    process_count=2)
    l1 = ClipLoader(ds, batch_size=1, shuffle=False, process_index=1,
                    process_count=2)
    assert len(l0) + len(l1) == 6


def test_loader_determinism(dataset_path):
    index = COCOIndex(dataset_path, image_size=96)
    ds = ClipDataset(index, ClipDatasetConfig(clip_length=4, stride=4))
    a = next(iter(ClipLoader(ds, batch_size=1, seed=7)))
    b = next(iter(ClipLoader(ds, batch_size=1, seed=7)))
    np.testing.assert_array_equal(a.images, b.images)
    np.testing.assert_array_equal(a.point_coords, b.point_coords)


def test_uint8_image_contract_matches_f32(tmp_path):
    """uint8 frames + device-side normalization produce the same normalized
    tensor as the host f32 path (the compact H2D contract)."""
    import jax.numpy as jnp

    from sam2_video_tpu.data.synthetic import make_synthetic_dataset
    from sam2_video_tpu.data import coco as coco_mod

    json_path = make_synthetic_dataset(
        str(tmp_path / "ds"), num_videos=1, frames_per_video=2,
        image_hw=(96, 128), num_categories=2)
    index = coco_mod.COCOIndex(json_path, image_size=64)
    f32 = index.load_image(0)
    u8 = index.load_image(0, normalize=False)
    assert u8.dtype == np.uint8
    dev = (jnp.asarray(u8).astype(jnp.float32) / 255.0
           - jnp.asarray(coco_mod.IMAGENET_MEAN)) / \
        jnp.asarray(coco_mod.IMAGENET_STD)
    np.testing.assert_allclose(np.asarray(dev), f32, atol=1e-6)


def test_loader_emits_uint8_by_default(tmp_path):
    from sam2_video_tpu.data.synthetic import make_synthetic_dataset
    from sam2_video_tpu.data import coco as coco_mod
    from sam2_video_tpu.data.pipeline import (ClipDataset, ClipDatasetConfig,
                                              ClipLoader)

    json_path = make_synthetic_dataset(
        str(tmp_path / "ds"), num_videos=1, frames_per_video=4,
        image_hw=(96, 128), num_categories=2)
    index = coco_mod.COCOIndex(json_path, image_size=64)
    ds = ClipDataset(index, ClipDatasetConfig(clip_length=2, stride=2))
    batch = next(iter(ClipLoader(ds, num_workers=1, shuffle=False)))
    assert batch.images.dtype == np.uint8
    ds32 = ClipDataset(index, ClipDatasetConfig(clip_length=2, stride=2,
                                                uint8_images=False))
    b32 = next(iter(ClipLoader(ds32, num_workers=1, shuffle=False)))
    assert b32.images.dtype == np.float32


def test_frame_cache_identical_and_bounded(dataset_path):
    """frame_cache_mb: cached reads are bit-identical to uncached (both
    normalize from the same post-resize uint8), and the LRU respects the
    byte budget."""
    plain = COCOIndex(dataset_path, image_size=96)
    cached = COCOIndex(dataset_path, image_size=96, frame_cache_mb=64)
    for idx in (0, 1, 2):
        np.testing.assert_array_equal(plain.load_image(idx),
                                      cached.load_image(idx))
        np.testing.assert_array_equal(
            plain.load_image(idx, normalize=False),
            cached.load_image(idx, normalize=False))
    # second read served from cache — swap the stored entry and observe
    # (cache keys are (idx, image_root) so two roots never collide)
    assert (0, None) in cached._frame_cache
    cached._frame_cache[(0, None)] = \
        np.zeros_like(cached._frame_cache[(0, None)])
    assert cached.load_image(0, normalize=False).max() == 0

    # cached entries are read-only: in-place mutation by a consumer must
    # fail loudly instead of silently corrupting later epochs
    hit = cached.load_image(1, normalize=False)
    assert not hit.flags.writeable
    with np.testing.assert_raises(ValueError):
        hit[0, 0, 0] = 0
    # ...but np.stack/astype (the real consumers) still work
    np.stack([hit, hit])
    hit.astype(np.float32)

    # budget: each 96px frame is 96*96*3 bytes; allow exactly two entries
    two = 2 * 96 * 96 * 3 / (1024 * 1024)
    small = COCOIndex(dataset_path, image_size=96, frame_cache_mb=two)
    for idx in range(5):
        small.load_image(idx, normalize=False)
    assert len(small._frame_cache) == 2
    assert list(small._frame_cache) == [(3, None), (4, None)]  # LRU evicts oldest

    # frame_cache_mb=0 (default) never populates the cache
    for idx in range(3):
        plain.load_image(idx)
    assert not plain._frame_cache
