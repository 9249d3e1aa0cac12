"""Batch pytrees (the tensorclass equivalents, cf. reference
sam2_video/data/data_utils.py:34-86). All shapes static; the object axis is
padded to ``num_objects`` and masked via ``obj_to_cat >= 0``.

Unlike the reference's B=1-only collate (dataset.py:358-360), clips carry a
leading batch axis from day one — the train step vmaps the per-clip forward
and pjit shards that axis over the data-parallel mesh dimension.
"""

from __future__ import annotations

import chex
import jax.numpy as jnp


@chex.dataclass
class VideoClip:
    """One clip (no batch axis).

    images:       [T, H, W, 3] f32, ImageNet-normalized
    cat_masks:    [T, C, H, W] bool — per-category GT (OR of instances)
    obj_masks:    [O, H, W] f32 — frame-0 connected components (prompt source)
    obj_to_cat:   [O] int32 — category index per object, -1 for padding
    point_coords: [O, P, 2] f32 — (x, y) pixel coords (point/box prompts)
    point_labels: [O, P] int32 — 1 pos / 0 neg / 2,3 box corners / -1 pad
    """
    images: jnp.ndarray
    cat_masks: jnp.ndarray
    obj_masks: jnp.ndarray
    obj_to_cat: jnp.ndarray
    point_coords: jnp.ndarray
    point_labels: jnp.ndarray

    @property
    def num_frames(self) -> int:
        return self.images.shape[0]

    @property
    def num_objects(self) -> int:
        return self.obj_masks.shape[0]

    @property
    def obj_valid(self) -> jnp.ndarray:
        return self.obj_to_cat >= 0


@chex.dataclass
class VideoClipBatch:
    """A batch of clips: every field gains a leading [B] axis."""
    images: jnp.ndarray
    cat_masks: jnp.ndarray
    obj_masks: jnp.ndarray
    obj_to_cat: jnp.ndarray
    point_coords: jnp.ndarray
    point_labels: jnp.ndarray

    def clip(self, i) -> VideoClip:
        return VideoClip(
            images=self.images[i], cat_masks=self.cat_masks[i],
            obj_masks=self.obj_masks[i], obj_to_cat=self.obj_to_cat[i],
            point_coords=self.point_coords[i], point_labels=self.point_labels[i])

    @property
    def batch_size(self) -> int:
        return self.images.shape[0]
