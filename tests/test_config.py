"""Config engine tests: composition, group selection, overrides,
interpolation, typed conversion."""

from sam2_video_tpu.config import load_config, loss_config, model_config


def test_base_config_loads():
    cfg = load_config("config")
    assert cfg.data.name == "cholecseg8k"
    assert cfg.data.num_categories == 13
    assert cfg.model.prompt_type == "point"
    assert cfg.loss.weight_dict.loss_mask == 20


def test_defaults_chain_and_self():
    cfg = load_config("overfit")
    # overfit overlays base config
    assert cfg.data.video_clip_length == 8
    assert cfg.data.stride == 100
    assert cfg.loss.type == "bce"
    assert cfg.trainer.limit_train_batches == 1
    # untouched base keys survive
    assert cfg.optimizer.type == "AdamW"


def test_group_override():
    cfg = load_config("config", overrides=["data=endovis17"])
    assert cfg.data.name == "endovis17"
    assert cfg.data.num_categories == 7


def test_global_package_overlay():
    cfg = load_config("config", overrides=["loss=dice_main"])
    assert cfg.loss.weight_dict.loss_mask == 1
    assert cfg.loss.weight_dict.loss_dice == 10


def test_dotted_overrides():
    cfg = load_config("config", overrides=[
        "optimizer.lr=5e-5", "model.prompt_type=mask",
        "trainer.max_epochs=1", "loss.weight_dict.loss_iou=3"])
    assert cfg.optimizer.lr == 5e-5
    assert cfg.model.prompt_type == "mask"
    assert cfg.trainer.max_epochs == 1
    assert cfg.loss.weight_dict.loss_iou == 3


def test_interpolation():
    cfg = load_config("config", overrides=["model.prompt_type=box"])
    assert cfg.eval.prompt_type == "box"
    assert cfg.eval.num_points == cfg.model.num_pos_points
    assert cfg.visualization.caption == "cholecseg8k"


def test_typed_conversion():
    cfg = load_config("config", overrides=["data=endovis18",
                                           "model.prompt_type=mask"])
    mcfg = model_config(cfg)
    assert mcfg.prompt_type == "mask"
    assert mcfg.sam2.image_size == 384
    lcfg = loss_config(load_config("overfit"))
    assert lcfg.type == "bce"
