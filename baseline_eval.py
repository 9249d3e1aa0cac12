"""Batch baseline evaluation over combo configs.

Parity spec: /root/reference/baseline_eval.py (:26-296): discover combo
configs, merge combo+data config, optionally load fine-tuned weights, run
inference + eval per combo, write per-combo metrics.json and a summary CSV.

    python baseline_eval.py [--combos endovis18/1 endovis18/4 ...]
        [--combo-file list.txt] [--checkpoint ckpt.npz] [--out-dir baseline_results]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def run_combo(combo: str, checkpoint: str | None, out_root: Path,
              overrides: list[str]) -> dict:
    import jax

    from sam2_video_tpu.config import load_config, model_config
    from sam2_video_tpu.eval.inference import inference
    from sam2_video_tpu.eval.metrics import evaluate
    from sam2_video_tpu.models import sam2 as sam2_mod
    from sam2_video_tpu.training import convert as convert_mod
    from sam2_video_tpu.training.checkpoint import load_params_npz

    cfg = load_config("config", [f"combo={combo}"] + list(overrides))
    mcfg = model_config(cfg)
    sam2_cfg = mcfg.sam2

    ckpt = checkpoint or cfg.model.get("checkpoint_path")
    if ckpt and str(ckpt).endswith(".npz"):
        params = load_params_npz(ckpt)
    elif ckpt and Path(str(ckpt)).exists():
        params, _ = convert_mod.convert_checkpoint(
            ckpt, backbone=cfg.model.get("backbone", "tiny"),
            image_size=sam2_cfg.image_size, strict=False)
    else:
        params = sam2_mod.init(jax.random.PRNGKey(0), sam2_cfg)
    if cfg.model.get("fintuned_model_path"):
        params = convert_mod.load_finetuned(params,
                                            cfg.model.fintuned_model_path)

    run_dir = out_root / combo.replace("/", "_")
    run_dir.mkdir(parents=True, exist_ok=True)
    predict_path, _ = inference(
        params, sam2_cfg, cfg.eval.coco_path, run_dir,
        prompt_type=cfg.eval.get("prompt_type", "points"),
        clip_length=cfg.eval.get("clip_length"),
        variable_cats=bool(cfg.eval.get("variable_cats", False)),
        num_points=int(cfg.eval.get("num_points", 1)),
        num_neg_points=int(cfg.eval.get("num_neg_points", 0)),
        include_center=bool(cfg.eval.get("include_center", True)),
        max_objects=int(cfg.model.get("max_objects", 8)),
        image_root=cfg.data.get("image_root"))
    result = evaluate(predict_path, cfg.eval.coco_path, run_dir)
    metrics = {"combo": combo, "name": cfg.get("combo", {}).get("name"),
               "avg_scores": result["avg_scores"],
               "cat_scores": {str(k): v
                              for k, v in result["cat_scores"].items()}}
    (run_dir / "metrics.json").write_text(json.dumps(metrics, indent=2,
                                                     default=float))
    return metrics


def discover_combos() -> list[str]:
    root = Path(__file__).resolve().parent / "sam2_video_tpu/configs/combo"
    return sorted(
        f"{p.parent.name}/{p.stem}" for p in root.glob("*/*.yaml"))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--combos", nargs="*", default=None)
    ap.add_argument("--combo-file", default=None,
                    help="text file with one combo per line")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--out-dir", default="baseline_results")
    ap.add_argument("--override", nargs="*", default=[])
    args = ap.parse_args(argv)

    combos = args.combos
    if args.combo_file:
        combos = [l.strip() for l in Path(args.combo_file).read_text()
                  .splitlines() if l.strip() and not l.startswith("#")]
    if not combos:
        combos = discover_combos()

    out_root = Path(args.out_dir)
    rows = []
    for combo in combos:
        print(f"=== {combo}")
        try:
            metrics = run_combo(combo, args.checkpoint, out_root,
                                args.override)
            rows.append(metrics)
            a = metrics["avg_scores"]
            print(f"    dice={a['dice']:.4f} iou={a['iou']:.4f} "
                  f"mae={a['mae']:.4f}")
        except Exception as e:  # keep the batch going like the reference
            print(f"    FAILED: {type(e).__name__}: {e}", file=sys.stderr)

    if rows:
        import csv
        with open(out_root / "summary.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["combo", "name", "dice", "iou", "mae"])
            for r in rows:
                a = r["avg_scores"]
                w.writerow([r["combo"], r["name"], a["dice"], a["iou"],
                            a["mae"]])
        print(f"summary -> {out_root / 'summary.csv'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
