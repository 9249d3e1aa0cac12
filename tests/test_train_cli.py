"""End-to-end train.py CLI: config resolve -> data -> fit -> checkpoints ->
post-fit inference -> eval -> summary, on the synthetic dataset (the
reference's eval_pipeline_test strategy at minutes scale)."""

import json
import os
from pathlib import Path

import pytest

from sam2_video_tpu.data.synthetic import make_synthetic_dataset


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path, monkeypatch):
    json_path = make_synthetic_dataset(tmp_path / "ds", num_videos=1,
                                       frames_per_video=6,
                                       image_hw=(96, 128), num_categories=2)
    monkeypatch.chdir(tmp_path)  # outputs/ under tmp
    import train as train_mod

    rc = train_mod.main([
        f"data.train_path={json_path}",
        f"data.val_path={json_path}",
        "data.image_size=96", "data.num_categories=2",
        "data.video_clip_length=2", "data.stride=4", "data.batch_size=1",
        "model.compute_dtype=float32", "model.max_objects=4",
        "model.use_activation_checkpoint=false",
        "model.prompt_type=point", "model.num_pos_points=1",
        "trainer.max_epochs=1", "trainer.limit_train_batches=2",
        "trainer.limit_val_batches=1", "trainer.log_every_n_steps=1",
        "scheduler.enabled=false",
        "visualization.enabled=true", "visualization.train_every_n_steps=1",
        "eval.enabled=true", "eval.clip_length=3",
    ])
    assert rc == 0

    runs = sorted(Path("outputs").glob("*/*"))
    assert runs, "no run dir created"
    run = runs[-1]
    # metrics + summary written
    assert (run / "metrics.jsonl").exists()
    summary = json.loads((run / "summary.json").read_text())
    assert "best_val_loss" in summary
    assert "eval/dice" in summary
    # checkpoints: last + top-k
    assert (run / "checkpoints" / "last").exists()
    # post-fit eval artifacts
    assert (run / "eval" / "predict.json").exists()
    assert (run / "eval" / "eval.pkl").exists()
    # viz GIFs
    assert list((run / "viz").glob("*.gif"))
