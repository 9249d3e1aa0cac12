"""COCO RLE codec tests: hand-built cases, roundtrips, and validation against
the real annotation JSONs shipped with the reference datasets (whose 'area'
and 'bbox' fields were produced by pycocotools — our ground truth)."""

import json
from pathlib import Path

import numpy as np
import pytest

from sam2_video_tpu.data import rle

REF_JSON = Path("/root/reference/data/endovis18_coco_annotations_val_opened.json")


def test_decode_uncompressed_simple():
    # 3x3, column-major: [0,0,1, 1,0,0, 0,1,1] -> counts [2,2,2,1,2]... build
    m = np.array([[0, 1, 0],
                  [0, 0, 1],
                  [1, 0, 1]], np.uint8)
    # column-major flat: cols: [0,0,1],[1,0,0],[0,1,1] -> 0,0,1,1,0,0,0,1,1
    r = {"size": [3, 3], "counts": [2, 2, 3, 2]}
    np.testing.assert_array_equal(rle.decode(r), m)


def test_encode_roundtrip_random(rng):
    for _ in range(20):
        m = (rng.random((17, 23)) > 0.5).astype(np.uint8)
        r = rle.encode(m)
        np.testing.assert_array_equal(rle.decode(r), m)


def test_encode_roundtrip_edge_cases():
    for m in [np.zeros((5, 7), np.uint8), np.ones((5, 7), np.uint8),
              np.eye(6, dtype=np.uint8)]:
        np.testing.assert_array_equal(rle.decode(rle.encode(m)), m)


def test_counts_string_roundtrip(rng):
    counts = np.asarray([0, 5, 100, 3, 70000, 2, 1], np.int64)
    s = rle.encode_counts(counts)
    np.testing.assert_array_equal(rle.decode_counts(s), counts)


@pytest.mark.skipif(not REF_JSON.exists(), reason="reference data not mounted")
def test_against_reference_annotations():
    data = json.loads(REF_JSON.read_text())
    anns = data["annotations"][:50]
    for ann in anns:
        seg = ann["segmentation"]
        m = rle.decode(seg)
        h, w = seg["size"]
        assert m.shape == (h, w)
        # area parity with pycocotools-produced field
        assert int(m.sum()) == ann["area"], ann["id"]
        assert rle.area(seg) == ann["area"]
        # bbox self-consistency ([x, y, w, h]); the JSON bbox fields are
        # slightly stale (the reference's apply_morphological_opening.py
        # rewrote masks/areas but not bboxes), so compare loosely to JSON
        # and exactly to the decoded mask.
        bx = rle.to_bbox(seg)
        ys, xs = np.nonzero(m)
        np.testing.assert_array_equal(
            bx, [xs.min(), ys.min(), xs.max() - xs.min() + 1,
                 ys.max() - ys.min() + 1])
        np.testing.assert_allclose(bx, ann["bbox"], atol=40.0)
        # encode -> identical compressed string
        re_enc = rle.encode(m)
        assert re_enc["counts"] == seg["counts"], ann["id"]


@pytest.mark.skipif(not REF_JSON.exists(), reason="reference data not mounted")
def test_native_and_numpy_paths_agree():
    from sam2_video_tpu.data import rle_native
    if not rle_native.NATIVE_AVAILABLE:
        pytest.skip("native codec not built")
    data = json.loads(REF_JSON.read_text())
    seg = data["annotations"][0]["segmentation"]
    got_native = rle_native.decode_counts_native(seg["counts"])
    # pure-python decode
    s = seg["counts"]
    counts, i = [], 0
    while i < len(s):
        x, k = 0, 0
        while True:
            c = ord(s[i]) - 48
            x |= (c & 0x1F) << (5 * k)
            i += 1
            k += 1
            if not (c & 0x20):
                if c & 0x10:
                    x |= -1 << (5 * k)
                break
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    np.testing.assert_array_equal(got_native, counts)
