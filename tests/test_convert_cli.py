"""Checkpoint-converter CLI: synthetic torch .pt (Meta-style {'model': sd})
-> npz -> load, covering torch file I/O, prefix handling and layout
transforms end-to-end."""

import pytest
import subprocess
import sys
from pathlib import Path

import numpy as np
import torch

import jax

from sam2_video_tpu.models import sam2 as sam2_mod
from sam2_video_tpu.models.sam2 import SAM2Config
from sam2_video_tpu.training.checkpoint import _flatten, load_params_npz

REPO = Path(__file__).resolve().parents[1]


def _torch_layout(name: str, v: np.ndarray) -> np.ndarray:
    if v.ndim == 4 and "pos_embed" in name:
        return v.transpose(0, 3, 1, 2)          # NHWC -> NCHW
    if v.ndim == 4 and "output_upscaling" in name:
        return v.transpose(2, 3, 0, 1)          # HWIO -> IOHW (deconv)
    if v.ndim == 4 and "maskmem_tpos_enc" not in name:
        return v.transpose(3, 2, 0, 1)          # HWIO -> OIHW (conv)
    return v


@pytest.mark.slow
def test_convert_cli_roundtrip(tmp_path):
    cfg = SAM2Config(image_size=64, compute_dtype="float32")
    template = sam2_mod.init(jax.random.PRNGKey(0), cfg)
    flat = _flatten(jax.device_get(template))
    sd = {name: torch.from_numpy(np.ascontiguousarray(
        _torch_layout(name, np.asarray(v))))
        for name, v in flat.items()}
    ckpt = tmp_path / "fake_sam2.pt"
    torch.save({"model": sd}, ckpt)  # Meta release format

    out = tmp_path / "converted.npz"
    r = subprocess.run(
        [sys.executable, "-m", "sam2_video_tpu.training.convert", str(ckpt),
         str(out), "--backbone", "tiny", "--image-size", "64"],
        capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0, r.stderr
    assert "0 missing, 0 unexpected" in r.stdout

    loaded = _flatten(load_params_npz(out))
    for name, v in flat.items():
        np.testing.assert_array_equal(loaded[name], np.asarray(v),
                                      err_msg=name)
