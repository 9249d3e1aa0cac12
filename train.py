"""Training entry point (reference train.py parity, Hydra-free):

    python train.py [config=best] [data=endovis17] [loss=focal_main] \
        [optimizer.lr=1e-5] [trainer.max_epochs=3] ...

Flow (train.py:30-231 parity): resolve config -> seed -> build datasets ->
init/convert model params -> fit (train/val with checkpointing + JSONL
metrics) -> post-fit: reload best params -> inference -> eval -> baseline
deltas -> summary.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path


def _setup_jax_cache():
    import jax
    cache = Path(__file__).resolve().parent / ".jax_cache"
    cache.mkdir(exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    config_name = "config"
    overrides = []
    for a in argv:
        if a.startswith("config="):
            config_name = a.split("=", 1)[1]
        else:
            overrides.append(a)

    _setup_jax_cache()
    import jax
    import numpy as np

    from sam2_video_tpu.config import load_config, loss_config, model_config
    from sam2_video_tpu.parallel.mesh import maybe_initialize_distributed
    from sam2_video_tpu.data.coco import COCOIndex
    from sam2_video_tpu.data.pipeline import (ClipDataset, ClipDatasetConfig,
                                              ClipLoader)
    from sam2_video_tpu.models import sam2 as sam2_mod
    from sam2_video_tpu.parallel import mesh as mesh_mod
    from sam2_video_tpu.training import convert as convert_mod
    from sam2_video_tpu.training.checkpoint import Checkpointer, load_params_npz
    from sam2_video_tpu.training.loop import (TrainState, fit, make_eval_step,
                                              make_train_step)
    from sam2_video_tpu.training.optimizer import make_optimizer
    from sam2_video_tpu.utils.logging import MetricsLogger, setup_file_logging

    cfg = load_config(config_name, overrides)
    # multi-process (multi-host) init MUST precede any backend-initializing
    # jax call; no-op unless trainer.distributed.enabled or
    # JAX_COORDINATOR_ADDRESS is set (reference DDP parity, README.md:149-156)
    distributed = maybe_initialize_distributed(
        cfg.trainer.get("distributed"))
    is_main = jax.process_index() == 0
    run_dir = Path("outputs") / time.strftime("%Y-%m-%d/%H-%M-%S")
    if not is_main:
        run_dir = run_dir / f"proc{jax.process_index()}"
    run_dir.mkdir(parents=True, exist_ok=True)
    log = setup_file_logging(run_dir, cfg.get("log_level", "INFO"))
    logger = MetricsLogger(run_dir, project=cfg.wandb.get("project"),
                           name=cfg.wandb.get("name"), config=dict(cfg),
                           use_wandb=is_main) if is_main else None
    log.info(f"run dir: {run_dir}")
    if distributed:
        log.info(f"distributed: process {jax.process_index()}/"
                 f"{jax.process_count()}, {jax.local_device_count()} local / "
                 f"{jax.device_count()} global devices")

    seed = int(cfg.get("seed", 42))
    np.random.seed(seed)

    # ---- data -------------------------------------------------------------
    mcfg = model_config(cfg)
    dcfg = ClipDatasetConfig(
        clip_length=int(cfg.data.video_clip_length),
        stride=int(cfg.data.stride),
        prompt_type=cfg.model.prompt_type,
        max_objects=int(cfg.model.get("max_objects", 8)),
        num_pos_points=int(cfg.model.get("num_pos_points", 1)),
        num_neg_points=int(cfg.model.get("num_neg_points", 0)),
        include_center=bool(cfg.model.get("include_center", True)),
        image_root=cfg.data.get("image_root"),
        uint8_images=bool(cfg.data.get("uint8_images", True)))
    batch_size = int(cfg.data.get("batch_size", 1))  # GLOBAL batch
    num_devices = int(cfg.trainer.get("devices", 1))
    if distributed:
        num_devices = jax.device_count()  # all devices across all processes
    mesh = None
    if num_devices > 1:
        mesh = mesh_mod.make_mesh(num_data=num_devices)
        if batch_size < num_devices:
            log.warning(
                f"data.batch_size={batch_size} < devices={num_devices}: "
                f"raising the global batch to {num_devices} (1 clip/device) "
                f"so every device gets a shard. This changes the effective "
                f"optimization (LR schedule, steps/epoch) vs the configured "
                f"batch — set data.batch_size explicitly to silence this.")
            batch_size = num_devices
    # per-process share of the global batch: each host loads ONLY its shard
    # (pipeline.py ClipLoader host-sharding + mesh.shard_batch assembles the
    # global array via make_array_from_process_local_data)
    n_proc = jax.process_count()
    if batch_size % max(n_proc, 1) != 0:
        raise ValueError(
            f"global batch_size={batch_size} must be divisible by the "
            f"process count {n_proc}")
    local_batch = batch_size // max(n_proc, 1)

    # data.frame_cache_mb > 0 keeps post-resize uint8 frames in RAM so
    # epoch >= 2 skips PNG decode entirely (docs/DESIGN.md §5 budget table)
    cache_mb = float(cfg.data.get("frame_cache_mb", 0) or 0)
    train_index = COCOIndex(cfg.data.train_path, int(cfg.data.image_size),
                            int(cfg.data.get("num_categories") or 0) or None,
                            frame_cache_mb=cache_mb)
    val_index = COCOIndex(cfg.data.val_path, int(cfg.data.image_size),
                          int(cfg.data.get("num_categories") or 0) or None,
                          frame_cache_mb=cache_mb)
    train_ds = ClipDataset(train_index, dcfg)
    val_ds = ClipDataset(val_index, dcfg)
    train_loader = ClipLoader(train_ds, batch_size=local_batch, shuffle=True,
                              seed=seed,
                              num_workers=int(cfg.data.get("num_workers", 2)),
                              process_index=jax.process_index(),
                              process_count=n_proc)
    val_loader = ClipLoader(val_ds, batch_size=local_batch, shuffle=False,
                            seed=seed,
                            num_workers=int(cfg.data.get("num_workers", 2)),
                            process_index=jax.process_index(),
                            process_count=n_proc)
    log.info(f"train clips: {len(train_ds)}, val clips: {len(val_ds)}")

    # ---- model ------------------------------------------------------------
    sam2_cfg = mcfg.sam2
    ckpt_path = cfg.model.get("checkpoint_path")
    if ckpt_path and str(ckpt_path).endswith(".npz"):
        params = load_params_npz(ckpt_path)
        log.info(f"loaded converted checkpoint {ckpt_path}")
    elif ckpt_path and Path(str(ckpt_path)).exists():
        params, report = convert_mod.convert_checkpoint(
            ckpt_path, backbone=cfg.model.get("backbone", "tiny"),
            image_size=sam2_cfg.image_size, strict=False)
        log.info(f"converted torch checkpoint {ckpt_path}: "
                 f"{len(report['matched'])} tensors")
    else:
        params = sam2_mod.init(jax.random.PRNGKey(seed), sam2_cfg)
        log.warning("no pretrained checkpoint — training from random init")
    if cfg.model.get("fintuned_model_path"):
        params = convert_mod.load_finetuned(
            params, cfg.model.fintuned_model_path)
        log.info(f"grafted finetuned weights "
                 f"{cfg.model.fintuned_model_path}")
    if cfg.model.get("random_init_memory_modules"):
        fresh = sam2_mod.init(jax.random.PRNGKey(seed + 1), sam2_cfg)
        params["memory_attention"] = fresh["memory_attention"]
        params["memory_encoder"] = fresh["memory_encoder"]
        log.info("random-initialized memory modules")

    # ---- optimizer / steps -------------------------------------------------
    lcfg = loss_config(cfg)
    max_epochs = int(cfg.trainer.get("max_epochs", 1))
    limit_train = cfg.trainer.get("limit_train_batches")
    steps_per_epoch = (min(len(train_loader), limit_train)
                       if limit_train else len(train_loader))
    accum = int(cfg.trainer.get("accumulate_grad_batches", 1))
    total_steps = max(1, max_epochs * steps_per_epoch // accum)
    tx = make_optimizer(
        params, cfg.optimizer, cfg.scheduler, total_steps,
        trainable_modules=list(cfg.model.get("trainable_modules", [])),
        gradient_clip_val=float(cfg.trainer.get("gradient_clip_val", 1.0)),
        accumulate_grad_batches=accum)
    state = TrainState.create(params, tx)
    if mesh is not None:
        state = mesh_mod.replicate(mesh, state)
    train_step = make_train_step(
        mcfg, lcfg, tx, mesh=mesh,
        trainable_modules=list(cfg.model.get('trainable_modules', [])))
    eval_step = make_eval_step(mcfg, lcfg, mesh=mesh)

    checkpointer = None
    if bool(cfg.trainer.get("enable_checkpointing", True)) and is_main:
        checkpointer = Checkpointer(run_dir / "checkpoints",
                                    save_top_k=int(
                                        cfg.trainer.get("save_top_k", 3)))

    # resume from a previous run's checkpoint dir (params+opt state+step)
    resume_path = cfg.trainer.get("resume_from")
    if resume_path:
        restored = Checkpointer(Path(resume_path)).restore(target=state)
        state = TrainState(params=restored["params"],
                           opt_state=restored["opt_state"],
                           step=jax.numpy.asarray(restored["step"]))
        if mesh is not None:
            state = mesh_mod.replicate(mesh, state)
        log.info(f"resumed from {resume_path} at step {int(state.step)}")

    # GIF visualization hook (reference trainer.py:205-252)
    viz_fn = None
    viz_every = 0
    if bool(cfg.visualization.get("enabled", False)):
        from sam2_video_tpu.models.video_model import forward_train
        from sam2_video_tpu.utils.viz import create_visualization_gif
        viz_every = int(cfg.visualization.get("train_every_n_steps", 0))
        viz_dir = run_dir / "viz"
        viz_dir.mkdir(exist_ok=True)
        max_len = int(cfg.visualization.get("max_length", 4))
        viz_stride = int(cfg.visualization.get("stride", 1))

        vfwd = jax.jit(lambda p, c: forward_train(
            p, mcfg, c, training=False)[1]["high_res_masks"])

        def viz_fn(params_, batch, step_i):
            clip0 = batch.clip(0)
            pred = vfwd(params_, clip0)
            create_visualization_gif(
                jax.device_get(clip0.images), jax.device_get(clip0.cat_masks),
                jax.device_get(pred),
                point_coords=jax.device_get(clip0.point_coords),
                point_labels=jax.device_get(clip0.point_labels),
                max_length=max_len, stride=viz_stride,
                path=viz_dir / f"step{step_i:06d}.gif")

    result = fit(
        state, train_step, eval_step, train_loader, val_loader,
        max_epochs=max_epochs, mesh=mesh,
        limit_train_batches=limit_train,
        limit_val_batches=cfg.trainer.get("limit_val_batches"),
        log_every=int(cfg.trainer.get("log_every_n_steps", 20)),
        logger=logger, checkpointer=checkpointer,
        val_check_interval=float(cfg.trainer.get("val_check_interval") or 1.0),
        viz_fn=viz_fn, viz_every_n_steps=viz_every)
    log.info(f"training done; best val loss {result.best_val:.4f}")
    if logger is not None:
        logger.summary({"best_val_loss": result.best_val})

    # ---- post-fit inference + eval (train.py:135-231 parity) --------------
    # main process only: params are fetched to host first so the eval jits
    # run on local devices (global replicated arrays are not usable in a
    # single-process computation under multi-process SPMD)
    if bool(cfg.eval.get("enabled", True)) and is_main:
        from sam2_video_tpu.eval.inference import inference
        from sam2_video_tpu.eval.metrics import evaluate
        from baseline_utils import compute_baseline_deltas

        best_params = jax.device_get(result.state.params)
        if checkpointer is not None and checkpointer.best_path is not None:
            best_params = checkpointer.restore_params()
            log.info(f"reloaded best checkpoint {checkpointer.best_path}")
        predict_path, _ = inference(
            best_params, sam2_cfg, cfg.eval.coco_path, run_dir,
            prompt_type=cfg.eval.get("prompt_type", "points"),
            clip_length=cfg.eval.get("clip_length"),
            variable_cats=bool(cfg.eval.get("variable_cats", False)),
            num_points=int(cfg.eval.get("num_points", 1)),
            num_neg_points=int(cfg.eval.get("num_neg_points", 0)),
            include_center=bool(cfg.eval.get("include_center", True)),
            noised_prompt=bool(cfg.eval.get("noised_prompt", False)),
            noise_intensity=float(cfg.eval.get("noise_intensity", 0.1)),
            bbox_noise_type=cfg.eval.get("bbox_noise_type", "shift_scale"),
            grid_spacing=cfg.eval.get("grid_spacing"),
            probs_out_dir=cfg.eval.get("probs_out_dir"),
            max_objects=int(cfg.model.get("max_objects", 8)),
            image_root=cfg.data.get("image_root"), seed=seed,
            batch_videos=int(cfg.eval.get("batch_videos", 1)))
        eval_result = evaluate(predict_path, cfg.eval.coco_path,
                               run_dir / "eval")
        avg = eval_result["avg_scores"]
        log.info(f"eval: dice={avg['dice']:.4f} iou={avg['iou']:.4f} "
                 f"mae={avg['mae']:.4f}")
        summary = {f"eval/{k}": v for k, v in avg.items()}
        if bool(cfg.eval.get("log_per_category", False)):
            for c, s in eval_result["cat_scores"].items():
                summary.update({f"eval/cat{c}/{k}": v for k, v in s.items()})
        deltas = compute_baseline_deltas(cfg, avg)
        if deltas:
            summary.update(deltas)
        if logger is not None:
            logger.summary(summary)
        # metrics.json under eval dir (reference train.py:219-223)
        (run_dir / "eval" / "metrics.json").write_text(
            json.dumps({**summary,
                        "avg_scores": avg,
                        "name": cfg.get("combo", {}).get("name")},
                       indent=2, default=float))
    if logger is not None:
        logger.close()
    if distributed:
        # all processes meet here before exiting: process 0 may have spent
        # a long time in the single-process eval above, and jax.distributed's
        # interpreter-exit shutdown is itself a barrier — without this sync,
        # workers would block (or time out) in that shutdown while process 0
        # is still evaluating
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("sam2_video_tpu_post_fit")
    return 0


if __name__ == "__main__":
    sys.exit(main())
