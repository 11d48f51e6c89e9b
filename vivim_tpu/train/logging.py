"""Metric logging: console + JSONL always; wandb when available and enabled.

The reference logs through wandb exclusively
(multiclass_training_folds.py:768-778, 642-722).  wandb is optional here
(offline environments): every run always writes ``metrics.jsonl`` next to
the checkpoints, so downstream tooling has a stable record.
"""

from __future__ import annotations

import json
import os
import time


class MetricLogger:
    def __init__(self, log_dir: str, project: str = "vivim-tpu",
                 run_name: str | None = None, use_wandb: bool = False,
                 config: dict | None = None):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._fh = open(self.path, "a")
        self.wandb = None
        if use_wandb:
            try:
                import wandb

                self.wandb = wandb
                wandb.init(project=project, name=run_name, config=config or {})
            except Exception as e:  # wandb absent or offline — degrade
                print(f"[logging] wandb unavailable ({e}); JSONL only")
                self.wandb = None
        if config:
            self.log({"config": config}, step=-1)

    def log(self, metrics: dict, step: int):
        rec = {"step": step, "time": time.time()}
        rec.update({k: (float(v) if hasattr(v, "item") or isinstance(
            v, (int, float)) else v) for k, v in metrics.items()})
        self._fh.write(json.dumps(rec, default=str) + "\n")
        self._fh.flush()
        if self.wandb is not None:
            scalars = {k: v for k, v in metrics.items()
                       if isinstance(v, (int, float))}
            self.wandb.log(scalars, step=max(step, 0))

    def log_confusion_matrix(self, cm, class_names, step, prefix="val"):
        """Raw + row- and column-normalized confusion matrices
        (multiclass_training_folds.py:687-722 log heatmap images; here the
        arrays land in JSONL and, when enabled, wandb tables)."""
        import numpy as np

        cm = np.asarray(cm, np.float64)
        row = cm / np.maximum(cm.sum(1, keepdims=True), 1)
        col = cm / np.maximum(cm.sum(0, keepdims=True), 1)
        self.log({
            f"{prefix}/confusion_matrix": cm.tolist(),
            f"{prefix}/confusion_matrix_row_norm": row.tolist(),
            f"{prefix}/confusion_matrix_col_norm": col.tolist(),
            f"{prefix}/class_names": list(class_names),
        }, step)

    def finish(self):
        self._fh.close()
        if self.wandb is not None:
            self.wandb.finish()
