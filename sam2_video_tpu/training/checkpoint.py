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
    elif isinstance(tree, (list, tuple)) and not hasattr(tree, "_fields"):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}."))
    elif hasattr(tree, "_fields"):  # NamedTuple (optax states)
        for f in tree._fields:
            out.update(_flatten(getattr(tree, f), f"{prefix}{f}."))
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

    def restore(self, path: str | Path | None = None, target=None) -> dict:
        """Restore a checkpoint. Pass ``target`` (a TrainState-shaped pytree,
        e.g. a freshly initialized state) to recover typed containers —
        orbax deserializes optax NamedTuple states as plain dicts otherwise.
        """
        path = Path(path) if path else (self.best_path or self.dir / "last")
        restored = self._ckpt.restore(path)
        if target is None:
            return restored
        tmpl = {"params": target.params, "opt_state": target.opt_state,
                "step": target.step}
        flat_restored = _flatten(restored)

        def rebuild(template, prefix=""):
            # walk the typed template; pull leaves from the restored dict
            if isinstance(template, dict):
                return {k: rebuild(v, f"{prefix}{k}.")
                        for k, v in template.items()}
            if isinstance(template, (list, tuple)) and not hasattr(
                    template, "_fields"):
                vals = [rebuild(v, f"{prefix}{i}.")
                        for i, v in enumerate(template)]
                return type(template)(vals)
            if hasattr(template, "_fields"):  # NamedTuple (optax states)
                vals = {f: rebuild(getattr(template, f), f"{prefix}{f}.")
                        for f in template._fields}
                return type(template)(**vals)
            key = prefix[:-1]
            if key in flat_restored:
                return np.asarray(flat_restored[key])
            return template  # e.g. empty optax states with no leaves

        return rebuild(tmpl)

    def restore_params(self, path: str | Path | None = None) -> dict:
        return self.restore(path)["params"]
