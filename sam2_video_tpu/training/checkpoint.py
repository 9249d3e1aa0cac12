"""Checkpointing: orbax-backed save/restore of params + optimizer state +
step, with top-k-by-metric retention and save_last (the reference's
ModelCheckpoint semantics, configs/config.yaml:127-134; SURVEY.md §5.4)."""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}."))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        parts = path.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params_npz(params, path: str | Path):
    """Portable single-file param dump (torch-free interchange format)."""
    flat = _flatten(jax.device_get(params))
    np.savez(path, **flat)


def load_params_npz(path: str | Path) -> dict:
    with np.load(path) as data:
        return _unflatten({k: data[k] for k in data.files})


class Checkpointer:
    """Top-k + last checkpoint manager over orbax."""

    def __init__(self, directory: str | Path, save_top_k: int = 3,
                 mode: str = "min"):
        self.dir = Path(directory).resolve()  # orbax requires absolute paths
        self.dir.mkdir(parents=True, exist_ok=True)
        self.save_top_k = save_top_k
        self.mode = mode
        self._ckpt = ocp.PyTreeCheckpointer()
        self._records: list[dict] = []
        self._index_path = self.dir / "index.json"
        if self._index_path.exists():
            self._records = json.loads(self._index_path.read_text())

    def _save_tree(self, path: Path, state):
        if path.exists():
            shutil.rmtree(path)
        self._ckpt.save(path, jax.device_get(
            {"params": state.params, "opt_state": state.opt_state,
             "step": state.step}))

    def save(self, state, metric: float | None = None, epoch: int = 0):
        step = int(state.step)
        self._save_tree(self.dir / "last", state)
        if metric is not None:
            name = f"step{step:08d}"
            self._save_tree(self.dir / name, state)
            self._records.append({"name": name, "metric": float(metric),
                                  "step": step, "epoch": epoch})
            sign = 1 if self.mode == "min" else -1
            self._records.sort(key=lambda r: sign * r["metric"])
            while len(self._records) > self.save_top_k:
                drop = self._records.pop()
                p = self.dir / drop["name"]
                if p.exists():
                    shutil.rmtree(p)
            self._index_path.write_text(json.dumps(self._records, indent=1))

    @property
    def best_path(self) -> Path | None:
        if not self._records:
            return None
        return self.dir / self._records[0]["name"]

    def restore(self, path: str | Path | None = None) -> dict:
        path = Path(path) if path else (self.best_path or self.dir / "last")
        return self._ckpt.restore(path)

    def restore_params(self, path: str | Path | None = None) -> dict:
        return self.restore(path)["params"]
