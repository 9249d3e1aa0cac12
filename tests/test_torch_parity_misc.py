"""Torch-mirror parity for the remaining modules: prompt encoder (point-type
embedding selection + mask downscaling) and the FPN neck top-down fusion."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from sam2_video_tpu.models import image_encoder as ie
from sam2_video_tpu.models import prompt_encoder as pe
from sam2_video_tpu.models import hiera
from sam2_video_tpu.ops.position_encoding import sine_pe_2d
from tests.test_torch_parity import t
from tests.test_torch_parity_heads import torch_conv, torch_ln2d_nchw


def test_prompt_encoder_points_parity(rng):
    cfg = pe.PromptEncoderConfig(embed_dim=64, image_embedding_size=(8, 8),
                                 input_image_size=(128, 128))
    p = pe.init(jax.random.PRNGKey(0), cfg)
    coords = rng.uniform(0, 128, (2, 3, 2)).astype(np.float32)
    labels = np.asarray([[1, 0, -1], [2, 3, 1]], np.int32)

    got = pe.embed_points(p, cfg, jnp.asarray(coords), jnp.asarray(labels),
                          pad=True)

    # torch mirror: PE + chained wheres (prompt_encoder.py:79-121)
    c = torch.cat([t(coords) + 0.5, torch.zeros(2, 1, 2)], dim=1)
    l = torch.cat([t(labels.astype(np.float32)), -torch.ones(2, 1)], dim=1)
    g = t(p["pe_layer"]["positional_encoding_gaussian_matrix"])
    cn = c / torch.tensor([128.0, 128.0])
    enc = (2 * cn - 1) @ g * (2 * np.pi)
    point_pe = torch.cat([enc.sin(), enc.cos()], dim=-1)
    out = point_pe.clone()
    out = torch.where((l == -1)[..., None],
                      torch.zeros_like(out) + t(p["not_a_point_embed"]["weight"]),
                      out)
    for i in range(4):
        out = torch.where((l == i)[..., None],
                          point_pe + t(p["point_embeddings"][str(i)]["weight"]),
                          out)
    np.testing.assert_allclose(np.asarray(got), out.numpy(), atol=1e-4)


def test_prompt_encoder_mask_downscaling_parity(rng):
    cfg = pe.PromptEncoderConfig(embed_dim=64, image_embedding_size=(8, 8),
                                 input_image_size=(128, 128))
    p = pe.init(jax.random.PRNGKey(1), cfg)
    m = rng.standard_normal((2, 32, 32, 1)).astype(np.float32)
    got = pe.embed_masks(p, jnp.asarray(m))
    x = t(m.transpose(0, 3, 1, 2))
    md = p["mask_downscaling"]
    x = torch_conv(md["0"], x, stride=2)
    x = F.gelu(torch_ln2d_nchw(md["1"], x))
    x = torch_conv(md["3"], x, stride=2)
    x = F.gelu(torch_ln2d_nchw(md["4"], x))
    x = torch_conv(md["6"], x)
    np.testing.assert_allclose(np.asarray(got),
                               x.permute(0, 2, 3, 1).detach().numpy(),
                               atol=1e-4)


def test_fpn_neck_parity(rng):
    cfg = ie.ImageEncoderConfig(trunk=hiera.HIERA_PRESETS["tiny"])
    p = ie.init(jax.random.PRNGKey(2), cfg)
    # synthesize per-stage trunk outputs (high-res first): strides 4..32
    chans = cfg.backbone_channel_list[::-1]  # (96, 192, 384, 768)
    sizes = (32, 16, 8, 4)
    xs = [rng.standard_normal((1, s, s, c)).astype(np.float32)
          for s, c in zip(sizes, chans)]

    # run only the neck part of apply by monkeypatching the trunk
    import sam2_video_tpu.models.image_encoder as ie_mod
    orig = ie_mod.hiera.apply
    ie_mod.hiera.apply = lambda *a, **k: [jnp.asarray(x) for x in xs]
    try:
        out = ie.apply(p, jnp.zeros((1, 128, 128, 3)), cfg)
    finally:
        ie_mod.hiera.apply = orig

    # torch mirror of FpnNeck (image_encoder.py:102-134) with scalp=1
    convs = p["neck"]["convs"]
    n = 3
    outs = [None] * 4
    prev = None
    for i in range(3, -1, -1):
        lateral = torch_conv(convs[str(n - i)]["conv"],
                             t(xs[i].transpose(0, 3, 1, 2)))
        if i in (2, 3) and prev is not None:
            td = F.interpolate(prev.float(), scale_factor=2.0, mode="nearest")
            prev = lateral + td
        else:
            prev = lateral
        outs[i] = prev
    for lvl in range(3):  # post-scalp levels
        np.testing.assert_allclose(
            np.asarray(out["backbone_fpn"][lvl]),
            outs[lvl].permute(0, 2, 3, 1).detach().numpy(), atol=1e-4,
            err_msg=f"level {lvl}")
    # position encodings are the sine PE of each level
    np.testing.assert_allclose(
        np.asarray(out["vision_pos_enc"][2]),
        np.asarray(sine_pe_2d(8, 8, cfg.num_pos_feats)), atol=1e-6)
