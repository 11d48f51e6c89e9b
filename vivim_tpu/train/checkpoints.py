"""Orbax checkpointing with the reference's monitor semantics.

Reference behavior (Lightning ModelCheckpoint):
- k-fold training: monitor ``val/dice``, mode max, top-1 + save_last
  (multiclass_training_folds.py:788-797).
- final retrain: monitor ``train/loss``, mode min, top-3
  (final_multiclass_training.py:768-777).
- resume: ``trainer.fit(ckpt_path=...)`` (:814) — full train-state restore.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Top-k checkpointing keyed on a monitored metric + always-save-last."""

    def __init__(self, directory: str, monitor: str = "val/dice",
                 mode: str = "max", top_k: int = 1, save_last: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.top_k = top_k
        self.save_last = save_last
        self._ckptr = ocp.StandardCheckpointer()
        self._scores: list[tuple[float, int]] = []  # (score, step)
        self._meta_path = os.path.join(self.directory, "manager.json")
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                meta = json.load(f)
            self._scores = [tuple(s) for s in meta.get("scores", [])]

    def _path(self, name):
        return os.path.join(self.directory, name)

    @staticmethod
    def _step_of(dirname: str, prefix: str):
        """Parse 'best_123' -> 123; None for tmp/foreign dirs."""
        rest = dirname[len(prefix):]
        return int(rest) if rest.isdigit() else None

    def _better(self, a, b):
        return a > b if self.mode == "max" else a < b

    def save(self, state: Any, step: int, metrics: dict):
        """Save if within top-k on the monitored metric; always update last."""
        score = metrics.get(self.monitor)
        if self.save_last:
            self._ckptr.save(self._path(f"last_{step}"), state, force=True)
            # prune older "last" — but keep the newest PREVIOUS one: the save
            # above is async (committed by an atomic rename only when it
            # finishes), so deleting the previous last before the new one is
            # durable would leave a crash window with no checkpoint at all
            prev = sorted(
                s_ for d in os.listdir(self.directory)
                if d.startswith("last_")
                and (s_ := self._step_of(d, "last_")) is not None
                and s_ != step)
            for s_ in prev[:-1]:
                _rmtree(self._path(f"last_{s_}"))
        if score is None:
            return False
        score = float(score)
        self._scores.append((score, step))
        self._scores.sort(key=lambda s: s[0], reverse=(self.mode == "max"))
        keep = self._scores[: self.top_k]
        saved = (score, step) in keep
        if saved:
            self._ckptr.save(self._path(f"best_{step}"), state, force=True)
        # prune checkpoints that fell out of top-k
        keep_steps = {s for _, s in keep}
        for d in list(os.listdir(self.directory)):
            if d.startswith("best_"):
                s_ = self._step_of(d, "best_")
                if s_ is not None and s_ not in keep_steps:
                    _rmtree(self._path(d))
        self._scores = keep
        with open(self._meta_path, "w") as f:
            json.dump({"scores": self._scores, "monitor": self.monitor,
                       "mode": self.mode}, f)
        return saved

    def best_path(self):
        if not self._scores:
            return None
        return self._path(f"best_{self._scores[0][1]}")

    def last_path(self):
        steps = [self._step_of(d, "last_")
                 for d in os.listdir(self.directory) if d.startswith("last_")]
        steps = [s_ for s_ in steps if s_ is not None]
        if not steps:
            return None
        return self._path(f"last_{max(steps)}")

    def restore(self, target: Any, path: str | None = None):
        """Restore a train state (defaults to the latest 'last')."""
        path = path or self.last_path() or self.best_path()
        if path is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          target)
        return self._ckptr.restore(path, abstract)

    def wait(self):
        self._ckptr.wait_until_finished()


def _rmtree(path):
    import shutil

    shutil.rmtree(path, ignore_errors=True)


def save_params(path: str, params: Any):
    """Standalone parameter export (inference artifacts).  Synchronous."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, target: Any):
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
    return ocp.StandardCheckpointer().restore(os.path.abspath(path), abstract)
