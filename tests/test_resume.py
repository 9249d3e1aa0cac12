"""Checkpoint-resume through the train CLI: a second run started from the
first run's checkpoints continues at the saved step with identical params."""

import json
from pathlib import Path

import numpy as np
import pytest

from sam2_video_tpu.data.synthetic import make_synthetic_dataset


@pytest.mark.slow
def test_train_resume(tmp_path, monkeypatch):
    json_path = make_synthetic_dataset(tmp_path / "ds", num_videos=1,
                                       frames_per_video=4,
                                       image_hw=(96, 128), num_categories=2)
    monkeypatch.chdir(tmp_path)
    import train as train_mod

    common = [
        f"data.train_path={json_path}", f"data.val_path={json_path}",
        "data.image_size=96", "data.num_categories=2",
        "data.video_clip_length=2", "data.stride=2", "data.batch_size=1",
        "model.compute_dtype=float32", "model.max_objects=4",
        "trainer.max_epochs=1", "trainer.limit_train_batches=2",
        "trainer.limit_val_batches=1", "trainer.log_every_n_steps=1",
        "scheduler.enabled=false", "visualization.enabled=false",
        "eval.enabled=false",
    ]
    assert train_mod.main(list(common)) == 0
    run1 = sorted(Path("outputs").glob("*/*"))[-1]
    ckpt_dir = run1 / "checkpoints"
    assert (ckpt_dir / "last").exists()

    assert train_mod.main(list(common) +
                          [f"trainer.resume_from={ckpt_dir}"]) == 0
    run2 = sorted(Path("outputs").glob("*/*"))[-1]
    assert run2 != run1
    # the resumed run's logged steps continue past the first run's
    steps1 = [json.loads(l)["step"] for l in
              (run1 / "metrics.jsonl").read_text().splitlines()
              if '"split": "train"' in l]
    steps2 = [json.loads(l)["step"] for l in
              (run2 / "metrics.jsonl").read_text().splitlines()
              if '"split": "train"' in l]
    assert steps1 and steps2
    assert min(steps2) > max(steps1) - 1
