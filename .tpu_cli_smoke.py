"""TPU smoke of the full train.py product path incl. batched post-fit eval."""
import os, sys, json
from pathlib import Path
os.chdir("/tmp/tpu_cli_smoke")
sys.path.insert(0, "/root/repo")
from sam2_video_tpu.data.synthetic import make_synthetic_dataset
jp = make_synthetic_dataset(Path("ds"), num_videos=2, frames_per_video=6,
                            image_hw=(96, 128), num_categories=2)
import train as train_mod
rc = train_mod.main([
    f"data.train_path={jp}", f"data.val_path={jp}",
    "data.image_size=128", "data.num_categories=2",
    "data.video_clip_length=3", "data.stride=4", "data.batch_size=1",
    "model.compute_dtype=bfloat16", "model.max_objects=4",
    "model.use_activation_checkpoint=false",
    "model.prompt_type=point", "model.num_pos_points=1",
    "trainer.max_epochs=1", "trainer.limit_train_batches=3",
    "trainer.limit_val_batches=1", "trainer.log_every_n_steps=1",
    "scheduler.enabled=false",
    "eval.enabled=true", "eval.clip_length=3", "eval.batch_videos=2",
])
print("rc:", rc)
run = sorted(Path("outputs").glob("*/*"))[-1]
summary = json.loads((run / "summary.json").read_text())
print("summary keys:", sorted(k for k in summary if k.startswith("eval"))[:4])
print("eval/dice:", summary.get("eval/dice"))
print("predict.json:", (run / "eval" / "predict.json").exists())
