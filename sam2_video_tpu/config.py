"""Typed config system: YAML composition + dotted overrides + interpolation,
Hydra-free but keeping the reference's layout and knob names for parity
(SURVEY.md §5.6). Supports:

- ``defaults`` lists (``- data: cholecseg8k``, ``- config``, ``- _self_``)
- config groups under ``configs/<group>/<option>.yaml``; files headed by
  ``# @package _global_`` merge at the root (overlay configs: losses, combos)
- CLI-style dotted overrides (``optimizer.lr=1e-5``), group selection
  (``data=endovis17``, ``loss=focal_main``, ``combo=endovis18/1_mem``)
- ``${a.b}`` interpolation after merging

The resolved tree converts into the typed dataclass configs used by the
jitted code (model/loss), keeping everything hashable/static.
"""

from __future__ import annotations

import copy
import re
from pathlib import Path
from typing import Any

import yaml

CONFIG_DIR = Path(__file__).resolve().parent / "configs"

# groups whose option files are "# @package _global_" overlays
_GLOBAL_PACKAGE_RE = re.compile(r"^\s*#\s*@package\s+_global_")


class Config(dict):
    """dict with attribute access, recursively."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return v

    def __setattr__(self, k, v):
        self[k] = v

    @staticmethod
    def wrap(obj):
        if isinstance(obj, dict):
            return Config({k: Config.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [Config.wrap(v) for v in obj]
        return obj

    def get_path(self, path: str, default=None):
        node: Any = self
        for part in path.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node

    def set_path(self, path: str, value):
        parts = path.split(".")
        node = self
        for part in parts[:-1]:
            if part not in node or not isinstance(node[part], dict):
                node[part] = Config()
            node = node[part]
        node[parts[-1]] = value


def _deep_merge(base: dict, overlay: dict) -> dict:
    out = dict(base)
    for k, v in overlay.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _read_yaml(path: Path) -> tuple[dict, bool]:
    text = path.read_text()
    is_global = bool(_GLOBAL_PACKAGE_RE.match(text.splitlines()[0] if text else ""))
    data = yaml.safe_load(text) or {}
    return data, is_global


def _load_tree(name: str, config_dir: Path) -> dict:
    """Load configs/<name>.yaml resolving its defaults list recursively."""
    path = config_dir / f"{name}.yaml"
    data, _ = _read_yaml(path)
    defaults = data.pop("defaults", None)
    if defaults is None:
        return data
    merged: dict = {}
    self_merged = False
    for entry in defaults:
        if entry == "_self_":
            merged = _deep_merge(merged, data)
            self_merged = True
        elif isinstance(entry, str):
            merged = _deep_merge(merged, _load_tree(entry, config_dir))
        elif isinstance(entry, dict):
            for group, option in entry.items():
                merged = _deep_merge(
                    merged, _load_group(group, str(option), config_dir))
    if not self_merged:
        merged = _deep_merge(merged, data)
    return merged


def _load_group(group: str, option: str, config_dir: Path) -> dict:
    path = config_dir / group / f"{option}.yaml"
    data, is_global = _read_yaml(path)
    defaults = data.pop("defaults", None)
    merged: dict = {}
    # combo files reference their dataset via "- /data/<name>@data"
    for entry in defaults or []:
        if isinstance(entry, str) and "@" in entry:
            src, _, dst = entry.partition("@")
            g, opt = src.strip("/").split("/", 1)
            sub, _ = _read_yaml(config_dir / g / f"{opt}.yaml")
            sub.pop("defaults", None)
            merged = _deep_merge(merged, {dst: sub})
    merged = _deep_merge(merged, data)
    if is_global:
        return merged
    return {group: merged}


_INTERP_RE = re.compile(r"^\$\{([a-zA-Z0-9_.]+)\}$")
_INTERP_PART_RE = re.compile(r"\$\{([a-zA-Z0-9_.]+)\}")


def _resolve_interpolations(tree: dict) -> dict:
    root = Config.wrap(tree)

    def resolve(v, depth=0):
        if depth > 10:
            return v
        if isinstance(v, str):
            m = _INTERP_RE.match(v)
            if m:
                return resolve(root.get_path(m.group(1)), depth + 1)
            return _INTERP_PART_RE.sub(
                lambda mm: str(resolve(root.get_path(mm.group(1)), depth + 1)),
                v)
        return v

    def walk(node):
        if isinstance(node, dict):
            return Config({k: walk(v) for k, v in node.items()})
        if isinstance(node, list):
            return [walk(v) for v in node]
        return resolve(node)

    return walk(root)


def _parse_value(s: str):
    try:
        v = yaml.safe_load(s)
    except yaml.YAMLError:
        return s
    if isinstance(v, str):
        # YAML 1.1 only accepts '5.0e-5', not '5e-5' — parse bare scientific
        # notation as float like Hydra does
        try:
            return float(v)
        except ValueError:
            return v
    return v


def load_config(name: str = "config", overrides: list[str] | None = None,
                config_dir: str | Path | None = None) -> Config:
    config_dir = Path(config_dir) if config_dir else CONFIG_DIR
    tree = _load_tree(name, config_dir)
    for ov in overrides or []:
        if "=" not in ov:
            raise ValueError(f"override must be key=value, got {ov!r}")
        key, _, val = ov.partition("=")
        key = key.strip()
        # group-name aliases (the reference CLI uses `loss=focal_main` for
        # the overlay files living under configs/losses/)
        group_name = {"loss": "losses"}.get(key, key)
        group_dir = config_dir / group_name
        if "." not in key and group_dir.is_dir():
            key = group_name
            # group selection: data=endovis17, loss=focal_main, combo=x/y
            tree = _deep_merge(tree, _load_group(key, val.strip(), config_dir))
        else:
            cfg = Config.wrap(tree)
            cfg.set_path(key, _parse_value(val.strip()))
            tree = cfg
    return _resolve_interpolations(tree)


# ---------------------------------------------------------------------------
# Typed conversions for the jitted code
# ---------------------------------------------------------------------------


def model_config(cfg: Config):
    from .models.sam2 import SAM2Config
    from .models.video_model import VideoModelConfig
    m = cfg.model
    sam2 = SAM2Config(
        backbone=m.get("backbone", "tiny"),
        image_size=int(cfg.data.image_size),
        use_activation_checkpoint=bool(m.get("use_activation_checkpoint", False)),
        remat_mode=str(m.get("remat_mode", "") or ""),
        compute_dtype=m.get("compute_dtype", "bfloat16"),
        detach_memory_bank=bool(m.get("detach_memory_bank", True)),
        num_maskmem=int(m.get("num_maskmem", 7)),
        memory_temporal_stride_for_eval=int(
            m.get("memory_temporal_stride_for_eval", 1)),
        use_flash_attention=bool(m.get("use_flash_attention", True)),
        scan_unroll=int(m.get("scan_unroll", 0)),
    )
    return VideoModelConfig(sam2=sam2, prompt_type=m.get("prompt_type", "point"))


def loss_config(cfg: Config):
    from .training.losses import LossConfig
    l = cfg.loss
    wd = {k: float(v) for k, v in l.get("weight_dict", {}).items()}
    pw = l.get("bce_pos_weight", None)
    return LossConfig(
        type=str(l.get("type", "multi_step")),
        gt_stride=int(l.get("gt_stride", 1)),
        weight_dict=wd or LossConfig().weight_dict,
        supervise_all_iou=bool(l.get("supervise_all_iou", True)),
        iou_use_l1_loss=bool(l.get("iou_use_l1_loss", True)),
        pred_obj_scores=bool(l.get("pred_obj_scores", False)),
        focal_gamma_obj_score=float(l.get("focal_gamma_obj_score", 0.0)),
        focal_alpha_obj_score=float(l.get("focal_alpha_obj_score", -1.0)),
        multistep_logit_temperature=float(
            l.get("multistep_logit_temperature", 1.0)),
        bce_logit_temperature=float(l.get("bce_logit_temperature", 1.0)),
        bce_pos_weight=tuple(pw) if pw else None,
        bce_reduction=str(l.get("bce_reduction", "mean")),
    )
