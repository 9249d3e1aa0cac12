"""End-to-end eval pipeline on the synthetic dataset with a tiny random
model: inference -> predict.json -> metrics -> threshold search -> export.
(The reference's eval_pipeline_test strategy, SURVEY.md §4.3.)

A random model predicts garbage; these tests verify plumbing, formats, and
metric arithmetic — numerical quality comes from the pretrained checkpoint.
"""

import json
from pathlib import Path

import numpy as np
import pytest

import jax

from sam2_video_tpu.data.synthetic import make_synthetic_dataset
from sam2_video_tpu.eval.inference import inference
from sam2_video_tpu.eval.metrics import calculate_dice, calculate_iou, evaluate
from sam2_video_tpu.eval.tune_threshold import grid_search
from sam2_video_tpu.eval.export_predict_from_probs import export_predict
from sam2_video_tpu.models import sam2 as sam2_mod
from sam2_video_tpu.models.sam2 import SAM2Config


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("evalsynth")
    json_path = make_synthetic_dataset(root, num_videos=1,
                                       frames_per_video=6,
                                       image_hw=(96, 128), num_categories=2)
    cfg = SAM2Config(image_size=128, compute_dtype="float32",
                     use_activation_checkpoint=False)
    params = sam2_mod.init(jax.random.PRNGKey(0), cfg)
    return root, json_path, cfg, params


@pytest.mark.parametrize("prompt_type", ["points", "mask"])
def test_inference_end_to_end(setup, tmp_path, prompt_type):
    root, json_path, cfg, params = setup
    run_dir = tmp_path / f"run_{prompt_type}"
    predict_path, prompt_path = inference(
        params, cfg, json_path, run_dir, prompt_type=prompt_type,
        clip_length=3, num_points=1, max_objects=4,
        probs_out_dir="probs" if prompt_type == "points" else None)
    preds = json.loads(Path(predict_path).read_text())
    assert isinstance(preds, list)
    assert Path(prompt_path).exists()
    for ann in preds[:5]:
        assert set(ann) >= {"image_id", "category_id", "segmentation",
                            "bbox", "iscrowd", "score"}
        from sam2_video_tpu.data import rle
        m = rle.decode(ann["segmentation"])
        assert m.shape == (96, 128)

    # metrics over the predictions
    result = evaluate(predict_path, json_path, run_dir)
    assert "avg_scores" in result and "videos" in result
    assert (run_dir / "eval.pkl").exists()
    d = result["avg_scores"]["dice"]
    assert np.isnan(d) or 0.0 <= d <= 1.0

    if prompt_type == "points":
        probs_dir = run_dir / "eval" / "probs"
        metas = json.loads((probs_dir / "meta.json").read_text())
        assert metas["dtype"] == "float16"
        npzs = list(probs_dir.glob("*.npz"))
        assert npzs
        data = np.load(npzs[0])
        assert data["probs"].dtype == np.float16
        # threshold grid search + export roundtrip
        thr, dice, curve = grid_search(probs_dir, json_path,
                                       t_min=0.3, t_max=0.7, t_step=0.2)
        assert 0.3 <= thr <= 0.7
        out = export_predict(probs_dir, thr)
        assert Path(out).exists()


def test_threshold_curve_matches_naive(tmp_path):
    """The sort-based Dice-vs-threshold curve must equal the naive
    per-threshold any(prob >= t) merge (the reference semantics,
    tune_threshold.py:26-131), including empty-pred and tie cases."""
    rng = np.random.default_rng(7)
    probs_dir = tmp_path / "probs"
    probs_dir.mkdir()
    H, W, mod = 24, 32, 100
    from sam2_video_tpu.data import rle

    gt = {"images": [], "annotations": [], "categories": [
        {"id": c, "name": str(c)} for c in range(3)]}
    ann_id = 0
    image_ids = []
    for fid in range(3):
        image_ids.append(fid)
        gt["images"].append({"id": fid, "height": H, "width": W,
                             "video_id": "v", "order_in_video": fid,
                             "file_name": "x", "path": "x",
                             "is_det_keyframe": True})
        # objects: two of cat 1, one of cat 2 (cat 0 has GT but no preds
        # on frame 0 -> empty-pred path)
        obj_ids = np.array([1 + 100, 1 + 200, 2 + 300], np.int64)
        probs = rng.random((3, H, W)).astype(np.float16)
        np.savez(probs_dir / f"{fid}.npz", probs=probs, obj_ids=obj_ids,
                 height=H, width=W)
        for cat in ([0, 1] if fid == 0 else [1, 2]):
            m = (rng.random((H, W)) > 0.6).astype(np.uint8)
            gt["annotations"].append({
                "id": ann_id, "image_id": fid, "category_id": cat,
                "segmentation": rle.encode(m), "area": int(m.sum()),
                "bbox": [0, 0, 1, 1], "iscrowd": 0})
            ann_id += 1
    (probs_dir / "meta.json").write_text(json.dumps(
        {"mod": mod, "image_ids": image_ids, "dtype": "float16"}))
    gt_path = tmp_path / "gt.json"
    gt_path.write_text(json.dumps(gt))

    thr, best, curve = grid_search(probs_dir, gt_path,
                                   t_min=0.2, t_max=0.8, t_step=0.05)
    assert len(curve) == 13

    # naive recomputation
    from sam2_video_tpu.data import rle as rle_mod
    anns_by_img = {}
    for a in gt["annotations"]:
        anns_by_img.setdefault(a["image_id"], []).append(a)
    for t, expected in curve:
        total, n = 0.0, 0
        for fid in image_ids:
            data = np.load(probs_dir / f"{fid}.npz")
            probs = np.asarray(data["probs"], np.float32)
            cats = data["obj_ids"] % mod
            frame_anns = anns_by_img.get(fid, [])
            all_cats = set(cats.tolist()) | {a["category_id"]
                                             for a in frame_anns}
            for c in sorted(all_cats):
                sel = np.where(cats == c)[0]
                gm = np.zeros((H, W), bool)
                for a in frame_anns:
                    if a["category_id"] == c:
                        gm |= rle_mod.decode(a["segmentation"]).astype(bool)
                if sel.size == 0 and not gm.any():
                    continue
                pred = (np.any(probs[sel] >= t, axis=0) if sel.size
                        else np.zeros((H, W), bool))
                inter = np.logical_and(pred, gm).sum(dtype=np.float64)
                total += 2.0 * inter / (pred.sum() + gm.sum() + 1e-7)
                n += 1
        np.testing.assert_allclose(expected, total / n, rtol=1e-12)
    assert any(abs(t - thr) < 1e-9 and abs(v - best) < 1e-12
               for t, v in curve)


def test_metric_math():
    a = np.zeros((4, 4), np.uint8)
    b = np.zeros((4, 4), np.uint8)
    a[:2] = 1
    b[1:3] = 1
    iou = calculate_iou(a, b)
    np.testing.assert_allclose(iou, 4 / 12, rtol=1e-5)
    np.testing.assert_allclose(calculate_dice(a, b), 8 / 16, rtol=1e-5)


def test_eval_nanmean_aggregation(tmp_path):
    """A category absent from both GT and predictions must not drag averages
    (nanmean semantics, eval.py:119-131)."""
    gt = {
        "images": [{"id": 0, "video_id": "v", "order_in_video": 0,
                    "height": 8, "width": 8, "is_det_keyframe": True,
                    "file_name": "x", "path": "x"}],
        "annotations": [],
        "categories": [{"id": 0, "name": "a"}, {"id": 1, "name": "b"}],
    }
    from sam2_video_tpu.data import rle
    m = np.zeros((8, 8), np.uint8)
    m[:4] = 1
    gt["annotations"].append({
        "id": 0, "image_id": 0, "category_id": 0,
        "segmentation": rle.encode(m), "area": 32, "bbox": [0, 0, 8, 4],
        "iscrowd": 0})
    gt_path = tmp_path / "gt.json"
    gt_path.write_text(json.dumps(gt))
    pred_path = tmp_path / "pred.json"
    pred_path.write_text(json.dumps([{
        "image_id": 0, "category_id": 0, "segmentation": rle.encode(m),
        "bbox": [0, 0, 8, 4], "iscrowd": 0, "score": 0.9}]))
    result = evaluate(pred_path, gt_path, tmp_path)
    # perfect match on cat 0; cat 1 absent everywhere -> NaN, excluded
    np.testing.assert_allclose(result["avg_scores"]["dice"], 1.0, atol=1e-6)
    np.testing.assert_allclose(result["avg_scores"]["iou"], 1.0, atol=1e-6)
    assert np.isnan(result["cat_scores"][1]["dice"])


def test_save_video_list_unknown_id_raises(setup, tmp_path):
    """Unknown save_video_list entries fail with an actionable error naming
    the bad ids and the known ones (instead of a bare KeyError)."""
    root, json_path, cfg, params = setup
    with pytest.raises(ValueError, match="no processed results.*nope"):
        inference(params, cfg, json_path, tmp_path / "run_badlist",
                  prompt_type="points", clip_length=3, max_objects=4,
                  save_video_list=["nope"])
