"""CLI tooling tests: sweep expansion, combo discovery, baseline_eval batch
run on synthetic data, report generators, data converters."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def test_sweep_grid_expansion():
    sys.path.insert(0, str(REPO))
    from sweep import expand_grid, sample_random, to_overrides
    params = {"optimizer.lr": {"values": [1e-4, 1e-5]},
              "+combo": {"values": ["a", "b", "c"]},
              "seed": {"value": 1}}
    grid = list(expand_grid(params))
    assert len(grid) == 6
    ov = to_overrides(grid[0])
    assert "combo=a" in ov and "seed=1" in ov
    import random
    s = sample_random({"optimizer.lr": {"distribution": "log_uniform_values",
                                        "min": 1e-6, "max": 1e-2}},
                      random.Random(0))
    assert 1e-6 <= s["optimizer.lr"] <= 1e-2


def test_combo_discovery():
    sys.path.insert(0, str(REPO))
    from baseline_eval import discover_combos
    combos = discover_combos()
    assert len(combos) == 63
    assert "endovis18/1" in combos


@pytest.mark.slow
def test_baseline_eval_cli(tmp_path, monkeypatch):
    from sam2_video_tpu.data.synthetic import make_synthetic_dataset
    json_path = make_synthetic_dataset(tmp_path / "ds", num_videos=1,
                                       frames_per_video=4,
                                       image_hw=(96, 128), num_categories=2)
    # a minimal custom combo against the synthetic dataset
    combo_dir = REPO / "sam2_video_tpu/configs/combo/_synthtest"
    combo_dir.mkdir(parents=True, exist_ok=True)
    (combo_dir / "1.yaml").write_text(f"""# @package _global_

model:
  trainable_modules: [memory_attention]
  prompt_type: point
  compute_dtype: float32
  max_objects: 4
combo:
  name: _synthtest_point_mem
data:
  name: _synthtest
  train_path: {json_path}
  val_path: {json_path}
  image_size: 96
  num_categories: 2
  video_clip_length: 2
  stride: 2
eval:
  clip_length: 4
""")
    try:
        monkeypatch.chdir(REPO)
        from baseline_eval import main
        rc = main(["--combos", "_synthtest/1",
                   "--out-dir", str(tmp_path / "results")])
        assert rc == 0
        metrics = json.loads(
            (tmp_path / "results" / "_synthtest_1" / "metrics.json"
             ).read_text())
        assert metrics["name"] == "_synthtest_point_mem"
        assert "dice" in metrics["avg_scores"]
        assert (tmp_path / "results" / "summary.csv").exists()
    finally:
        import shutil
        shutil.rmtree(combo_dir, ignore_errors=True)


def test_performance_table_report(tmp_path):
    sys.path.insert(0, str(REPO / "reports"))
    import importlib
    ptr = importlib.import_module("performance_table_report")
    d = tmp_path / "endovis18_1"
    d.mkdir()
    (d / "metrics.json").write_text(json.dumps({
        "name": "endovis18_point_mem",
        "avg_scores": {"dice": 0.4, "iou": 0.35, "mae": 3.2}}))
    cells = ptr.collect([tmp_path])
    assert ("endovis18", "point") in cells
    md = ptr.build_table(cells)
    assert "0.400 / 0.350 / 3.20" in md


def test_baseline_delta_report(tmp_path):
    """analyze.py twin: trained-vs-zeroshot join on (dataset, prompt_type),
    improvement math, and the grouped insights."""

    def write(root, combo, dice, iou, mae):
        d = root / combo.replace("/", "_")
        d.mkdir(parents=True, exist_ok=True)
        (d / "metrics.json").write_text(json.dumps({
            "combo": combo,
            "avg_scores": {"dice": dice, "iou": iou, "mae": mae}}))

    trained = tmp_path / "trained"
    baseline = tmp_path / "baseline"
    # endovis18/1 = point+mem (trainable mem modules); endovis18/14 = mask+md
    write(trained, "endovis18/1", 0.40, 0.35, 3.0)
    write(trained, "endovis18/14", 0.50, 0.45, 2.0)
    write(baseline, "endovis18/1", 0.32, 0.28, 6.0)
    write(baseline, "endovis18/14", 0.40, 0.36, 4.0)
    out = tmp_path / "report.md"
    r = subprocess.run(
        [sys.executable, str(REPO / "reports/baseline_delta_report.py"),
         "--results", str(trained), "--baseline", str(baseline),
         "--out", str(out)],
        capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    md = out.read_text()
    # dice improvement for endovis18/1: (0.40-0.32)/0.32*100 = 25%
    assert "25.00" in md
    # mae 'reduction' keeps the reference's signed convention: -50%
    assert "-50.00" in md
    for section in ("Insight 1", "Insight 2", "Insight 3", "Insight 4",
                    "Insight 5", "Insight 6"):
        assert section in md
    assert "with memory" in md and "without memory" in md
    # best overall config by mean dice is the mask+md combo
    assert "Best overall configuration: `md`" in md


def test_data_converter_roundtrip(tmp_path):
    """EndoVis-style source -> COCO -> our loader parses it."""
    from PIL import Image
    src = tmp_path / "src"
    (src / "images").mkdir(parents=True)
    (src / "annotations").mkdir()
    (src / "labels.json").write_text(json.dumps([
        {"name": "background", "classid": 0},
        {"name": "tool", "classid": 1}]))
    rng = np.random.default_rng(0)
    for f in range(3):
        img = rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
        Image.fromarray(img).save(src / "images" / f"seq_1_frame{f:03d}.png")
        lab = np.zeros((64, 80), np.uint8)
        if f < 2:
            lab[10:30, 10:30] = 1
        Image.fromarray(lab).save(src / "annotations" /
                                  f"seq_1_frame{f:03d}.png")
    out = tmp_path / "coco.json"
    r = subprocess.run([sys.executable,
                        str(REPO / "data_tools/convert_endovis_to_coco.py"),
                        str(src), str(out)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    data = json.loads(out.read_text())
    assert len(data["images"]) == 3
    assert data["images"][2]["is_det_keyframe"] is False  # no annotations
    assert data["images"][0]["video_id"] == "seq_1_"
    from sam2_video_tpu.data.coco import COCOIndex
    idx = COCOIndex(out, image_size=64)
    m = idx.load_masks(data["images"][0]["id"])
    assert m.any()

    # morphological opening keeps the big blob
    out2 = tmp_path / "opened.json"
    r = subprocess.run([sys.executable,
                        str(REPO / "data_tools/apply_morphological_opening.py"),
                        str(out), str(out2)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert len(json.loads(out2.read_text())["annotations"]) == 2
