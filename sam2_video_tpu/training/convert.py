"""PyTorch SAM2 checkpoint -> JAX param-tree converter (SURVEY.md §5.4:
"hard requirement — the whole point is fine-tuning from Meta's pretrained
weights").

Because our param-tree paths mirror the torch state_dict names exactly
(ops/common.py design note), conversion is: strip wrapper prefixes, then per
tensor apply a *layout* transform chosen by comparing shapes against our
initialized tree:

- Linear / LayerNorm / Embedding / 1D params: copy as-is (we keep torch's
  [out, in] Linear layout).
- Conv2d [O, I, kH, kW] -> HWIO.
- ConvTranspose2d [I, O, kH, kW] -> HWIO.
- Hiera pos embeds [1, C, h, w] -> NHWC.

Also handles (sam2model.py:109-126 / train.py:146-157 parity):
- Meta releases storing the state dict under a "model" key;
- Lightning checkpoints with a leading "model." prefix;
- fine-tuned partial loads: mask-decoder ``.torch`` files (optionally paired
  with ``*_prompt_encoder.torch``) grafted onto full params; paths containing
  "all" load the full state dict non-strictly.

CLI: ``python -m sam2_video_tpu.training.convert <ckpt.pt> <out.npz>
[--backbone tiny]``
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import numpy as np

from ..models import sam2 as sam2_mod
from .checkpoint import _flatten, _unflatten, save_params_npz


def _load_torch_state_dict(path: str | Path) -> dict:
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "model" in obj and isinstance(
            obj["model"], dict):
        obj = obj["model"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if k.startswith("model."):
            k = k[len("model."):]
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else \
            np.asarray(v)
    return out


def _layout_transform(name: str, src: np.ndarray,
                      dst_shape: tuple) -> np.ndarray | None:
    """Find the transform mapping src (torch layout) onto dst_shape."""
    if tuple(src.shape) == tuple(dst_shape):
        return src
    if src.ndim == 4:
        for perm in [(2, 3, 1, 0),   # conv OIHW -> HWIO
                     (2, 3, 0, 1),   # deconv IOHW -> HWIO
                     (0, 2, 3, 1)]:  # NCHW pos embed -> NHWC
            if tuple(np.transpose(src, perm).shape) == tuple(dst_shape):
                return np.transpose(src, perm)
    if src.ndim == 2 and tuple(src.T.shape) == tuple(dst_shape):
        return src.T
    return None


def convert_state_dict(state_dict: dict, template_params: dict,
                       strict: bool = False):
    """Returns (params, report) where report lists missing/unexpected/
    mismatched keys."""
    flat_template = _flatten(jax.device_get(template_params))
    out = dict(flat_template)
    matched, mismatched, unexpected = [], [], []
    for name, src in state_dict.items():
        if name not in flat_template:
            unexpected.append(name)
            continue
        dst = flat_template[name]
        conv = _layout_transform(name, np.asarray(src), dst.shape)
        if conv is None:
            mismatched.append((name, tuple(src.shape), tuple(dst.shape)))
            continue
        out[name] = conv.astype(dst.dtype)
        matched.append(name)
    missing = sorted(set(flat_template) - set(matched))
    report = {"matched": matched, "missing": missing,
              "unexpected": sorted(unexpected), "mismatched": mismatched}
    if strict and (missing or unexpected or mismatched):
        raise ValueError(
            f"strict conversion failed: {len(missing)} missing, "
            f"{len(unexpected)} unexpected, {len(mismatched)} mismatched\n"
            f"missing[:10]={missing[:10]}\nunexpected[:10]="
            f"{report['unexpected'][:10]}\nmismatched[:10]={mismatched[:10]}")
    return _unflatten(out), report


def convert_checkpoint(ckpt_path: str | Path, backbone: str = "tiny",
                       image_size: int = 384, strict: bool = True,
                       template_params=None):
    """Load + convert a full SAM2 torch checkpoint."""
    cfg = sam2_mod.SAM2Config(backbone=backbone, image_size=image_size)
    if template_params is None:
        template_params = sam2_mod.init(jax.random.PRNGKey(0), cfg)
    sd = _load_torch_state_dict(ckpt_path)
    return convert_state_dict(sd, template_params, strict=strict)


def load_finetuned(params: dict, finetuned_path: str | Path):
    """Graft fine-tuned weights (sam2model.py:109-126 semantics):
    path containing 'all' -> full non-strict load; otherwise a mask-decoder
    state dict, with an optional ``*_prompt_encoder.torch`` companion."""
    finetuned_path = str(finetuned_path)
    if finetuned_path.endswith(".npz"):
        from .checkpoint import load_params_npz
        loaded = _flatten(load_params_npz(finetuned_path))
        flat = _flatten(jax.device_get(params))
        flat.update({k: v for k, v in loaded.items() if k in flat})
        return _unflatten(flat)
    if "all" in Path(finetuned_path).name or "all" in finetuned_path:
        sd = _load_torch_state_dict(finetuned_path)
        converted, _ = convert_state_dict(sd, params, strict=False)
        return converted
    sd = {f"sam_mask_decoder.{k}": v
          for k, v in _load_torch_state_dict(finetuned_path).items()}
    pe_path = finetuned_path.replace(".torch", "_prompt_encoder.torch")
    if Path(pe_path).exists():
        sd.update({f"sam_prompt_encoder.{k}": v
                   for k, v in _load_torch_state_dict(pe_path).items()})
    converted, report = convert_state_dict(sd, params, strict=False)
    if report["unexpected"] or report["mismatched"]:
        raise ValueError(f"finetuned load failed: {report['unexpected'][:5]} "
                         f"{report['mismatched'][:5]}")
    return converted


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ckpt")
    ap.add_argument("out")
    ap.add_argument("--backbone", default="tiny",
                    choices=["tiny", "small", "base_plus", "large"])
    ap.add_argument("--image-size", type=int, default=384)
    ap.add_argument("--no-strict", action="store_true")
    args = ap.parse_args()
    params, report = convert_checkpoint(
        args.ckpt, args.backbone, args.image_size, strict=not args.no_strict)
    save_params_npz(params, args.out)
    print(f"converted {len(report['matched'])} tensors "
          f"({len(report['missing'])} missing, "
          f"{len(report['unexpected'])} unexpected) -> {args.out}")


if __name__ == "__main__":
    main()
