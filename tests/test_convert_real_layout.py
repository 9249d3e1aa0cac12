"""Real-checkpoint readiness drill (no Meta checkpoint exists in this env):
build the EXACT ``sam2.1_hiera_*.pt`` state-dict layout by instantiating the
reference's vendored Meta modeling sources
(/root/reference/sam2_video/model/modeling/*, loadable without the ``sam2``
pip package by aliasing the pip module names onto the vendored files and
stubbing the two truly-external symbols), then run our strict converter and
demand ZERO missing / unexpected / mismatched parameters for all 4 backbones.

Constructor arguments follow /root/reference/configs/sam2/sam2.1_hiera_t.yaml
(the published SAM2.1 build recipe); the other three backbones use the
published Hiera preset values (== our HIERA_PRESETS).
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

import jax

from sam2_video_tpu.models import sam2 as sam2_mod
from sam2_video_tpu.models.sam2 import SAM2Config
from sam2_video_tpu.training.convert import convert_state_dict

REF = "/root/reference/sam2_video/model/modeling"

HIERA_ARGS = {
    "tiny": dict(embed_dim=96, num_heads=1, stages=[1, 2, 7, 2],
                 global_att_blocks=[5, 7, 9],
                 window_pos_embed_bkg_spatial_size=[7, 7]),
    "small": dict(embed_dim=96, num_heads=1, stages=[1, 2, 11, 2],
                  global_att_blocks=[7, 10, 13],
                  window_pos_embed_bkg_spatial_size=[7, 7]),
    "base_plus": dict(embed_dim=112, num_heads=2, stages=[2, 3, 16, 3],
                      global_att_blocks=[12, 16, 20],
                      window_pos_embed_bkg_spatial_size=[14, 14]),
    "large": dict(embed_dim=144, num_heads=2, stages=[2, 6, 36, 4],
                  global_att_blocks=[23, 33, 43],
                  window_pos_embed_bkg_spatial_size=[7, 7],
                  window_spec=[8, 4, 16, 8]),
}
CHANNEL_LIST = {"tiny": [768, 384, 192, 96], "small": [768, 384, 192, 96],
                "base_plus": [896, 448, 224, 112],
                "large": [1152, 576, 288, 144]}


def _load_as(pip_name, path):
    spec = importlib.util.spec_from_file_location(pip_name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[pip_name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def meta_modeling():
    """Alias the pip-style ``sam2.modeling.*`` names onto the vendored Meta
    sources; stub only sam2.utils.misc.mask_to_box and iopath (unused at
    construction time)."""
    saved = dict(sys.modules)
    try:
        for pkg in ("sam2", "sam2.modeling", "sam2.modeling.sam",
                    "sam2.modeling.backbones", "sam2.utils",
                    "iopath", "iopath.common"):
            m = types.ModuleType(pkg)
            m.__path__ = []
            sys.modules[pkg] = m
        misc = types.ModuleType("sam2.utils.misc")
        misc.mask_to_box = lambda masks: None  # runtime-only, not __init__
        sys.modules["sam2.utils.misc"] = misc
        fio = types.ModuleType("iopath.common.file_io")
        fio.g_pathmgr = None  # only used when loading pretrained weights
        sys.modules["iopath.common.file_io"] = fio

        mods = {}
        for pip_name, rel in [
            ("sam2.modeling.position_encoding", "position_encoding.py"),
            ("sam2.modeling.sam2_utils", "sam2_utils.py"),
            ("sam2.modeling.backbones.utils", "backbones/utils.py"),
            ("sam2.modeling.backbones.hieradet", "backbones/hieradet.py"),
            ("sam2.modeling.backbones.image_encoder",
             "backbones/image_encoder.py"),
            ("sam2.modeling.sam.transformer", "sam/transformer.py"),
            ("sam2.modeling.sam.prompt_encoder", "sam/prompt_encoder.py"),
            ("sam2.modeling.sam.mask_decoder", "sam/mask_decoder.py"),
            ("sam2.modeling.memory_attention", "memory_attention.py"),
            ("sam2.modeling.memory_encoder", "memory_encoder.py"),
            ("sam2.modeling.sam2_base", "sam2_base.py"),
        ]:
            mods[pip_name] = _load_as(pip_name, f"{REF}/{rel}")
        yield mods
    finally:
        sys.modules.clear()
        sys.modules.update(saved)


def build_meta_sam2(mods, backbone: str):
    """Instantiate SAM2Base exactly as configs/sam2/sam2.1_hiera_t.yaml does
    (hydra _target_ tree resolved by hand)."""
    PE = mods["sam2.modeling.position_encoding"].PositionEmbeddingSine
    Hiera = mods["sam2.modeling.backbones.hieradet"].Hiera
    ie = mods["sam2.modeling.backbones.image_encoder"]
    ma = mods["sam2.modeling.memory_attention"]
    me = mods["sam2.modeling.memory_encoder"]
    RoPEAttention = mods["sam2.modeling.sam.transformer"].RoPEAttention
    SAM2Base = mods["sam2.modeling.sam2_base"].SAM2Base

    image_encoder = ie.ImageEncoder(
        scalp=1, trunk=Hiera(**HIERA_ARGS[backbone]),
        neck=ie.FpnNeck(
            position_encoding=PE(num_pos_feats=256, normalize=True,
                                 scale=None, temperature=10000),
            d_model=256, backbone_channel_list=CHANNEL_LIST[backbone],
            fpn_top_down_levels=[2, 3], fpn_interp_model="nearest"))
    layer = ma.MemoryAttentionLayer(
        activation="relu", dim_feedforward=2048, dropout=0.1,
        pos_enc_at_attn=False,
        self_attention=RoPEAttention(rope_theta=10000.0, feat_sizes=[64, 64],
                                     embedding_dim=256, num_heads=1,
                                     downsample_rate=1, dropout=0.1),
        d_model=256, pos_enc_at_cross_attn_keys=True,
        pos_enc_at_cross_attn_queries=False,
        cross_attention=RoPEAttention(rope_theta=10000.0, feat_sizes=[64, 64],
                                      rope_k_repeat=True, embedding_dim=256,
                                      num_heads=1, downsample_rate=1,
                                      dropout=0.1, kv_in_dim=64))
    memory_attention = ma.MemoryAttention(
        d_model=256, pos_enc_at_input=True, layer=layer, num_layers=4)
    memory_encoder = me.MemoryEncoder(
        out_dim=64,
        position_encoding=PE(num_pos_feats=64, normalize=True, scale=None,
                             temperature=10000),
        mask_downsampler=me.MaskDownSampler(kernel_size=3, stride=2,
                                            padding=1),
        fuser=me.Fuser(layer=me.CXBlock(dim=256, kernel_size=7, padding=3,
                                        layer_scale_init_value=1e-6,
                                        use_dwconv=True), num_layers=2))
    return SAM2Base(
        image_encoder=image_encoder, memory_attention=memory_attention,
        memory_encoder=memory_encoder, num_maskmem=7, image_size=384,
        sigmoid_scale_for_mem_enc=20.0, sigmoid_bias_for_mem_enc=-10.0,
        use_mask_input_as_output_without_sam=True,
        directly_add_no_mem_embed=True, no_obj_embed_spatial=True,
        use_high_res_features_in_sam=True, multimask_output_in_sam=False,
        iou_prediction_use_sigmoid=True, use_obj_ptrs_in_encoder=True,
        add_tpos_enc_to_obj_ptrs=True, proj_tpos_enc_in_obj_ptrs=True,
        use_signed_tpos_enc_to_obj_ptrs=True,
        only_obj_ptrs_in_the_past_for_eval=True, pred_obj_scores=True,
        pred_obj_scores_mlp=True, fixed_no_obj_ptr=True,
        multimask_output_for_tracking=False,
        use_multimask_token_for_obj_ptr=False, multimask_min_pt_num=0,
        multimask_max_pt_num=1, use_mlp_for_obj_ptr_proj=True)


@pytest.mark.parametrize("backbone", ["tiny", "small", "base_plus", "large"])
def test_strict_conversion_zero_gaps(meta_modeling, backbone):
    model = build_meta_sam2(meta_modeling, backbone)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    template = sam2_mod.init(jax.random.PRNGKey(0),
                             SAM2Config(backbone=backbone))
    params, report = convert_state_dict(sd, template, strict=True)
    assert not report["missing"], report["missing"][:10]
    assert not report["unexpected"], report["unexpected"][:10]
    assert not report["mismatched"], report["mismatched"][:10]
    # a converted value must actually land (layout transform really applied)
    name = "image_encoder.trunk.patch_embed.proj.weight"
    got = np.asarray(params["image_encoder"]["trunk"]["patch_embed"]["proj"]
                     ["weight"])
    np.testing.assert_allclose(got, np.transpose(sd[name], (2, 3, 1, 0)))


def test_tiny_param_count_matches_meta(meta_modeling):
    """SAM2.1-tiny has ~38.9M params — a global guard that the whole tree is
    covered, not just name-matched. Counted over state_dict(): the prompt
    encoder's PE gaussian matrix is a torch *buffer* (not a parameter) that
    the checkpoint carries and we must convert."""
    model = build_meta_sam2(meta_modeling, "tiny")
    n_torch = sum(v.numel() for v in model.state_dict().values())
    template = sam2_mod.init(jax.random.PRNGKey(0), SAM2Config())
    n_ours = sum(int(np.prod(np.shape(x)))
                 for x in jax.tree.leaves(template))
    assert n_torch == n_ours, (n_torch, n_ours)
