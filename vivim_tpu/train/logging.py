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

    def log_image(self, key: str, image, step: int):
        """Log an image to wandb (no-op without wandb; JSONL records the
        key so the run log shows what was produced).  ``image``: a file
        path, a (H, W, 3) uint8 array, or a matplotlib figure."""
        self.log({f"{key}_logged": True}, step)
        if self.wandb is None:
            return
        self.wandb.log({key: self.wandb.Image(image)}, step=max(step, 0))

    def log_confusion_matrix(self, cm, class_names, step, prefix="val"):
        """Raw + row- and column-normalized confusion matrices.  Arrays
        always land in JSONL; with wandb enabled the rendered heatmaps are
        logged as wandb Images (multiclass_training_folds.py:687-722)."""
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
        if self.wandb is not None:
            for name, mat in ((f"{prefix}/confusion_matrix_img", cm),
                              (f"{prefix}/confusion_matrix_row_norm_img", row),
                              (f"{prefix}/confusion_matrix_col_norm_img", col)):
                fig = confusion_heatmap(mat, class_names)
                self.wandb.log({name: self.wandb.Image(fig)},
                               step=max(step, 0))
                import matplotlib.pyplot as plt

                plt.close(fig)

    def finish(self):
        self._fh.close()
        if self.wandb is not None:
            self.wandb.finish()


def confusion_heatmap(mat, class_names):
    """One confusion-matrix heatmap figure (shared by the trainer's wandb
    logging and the inference CLI's PNG plots)."""
    import matplotlib
    import numpy as np

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    mat = np.asarray(mat, np.float64)
    fig, ax = plt.subplots(figsize=(5, 4))
    im = ax.imshow(mat, cmap="Blues")
    for i in range(mat.shape[0]):
        for j in range(mat.shape[1]):
            ax.text(j, i, f"{mat[i, j]:.2f}" if mat.max() <= 1
                    else f"{int(mat[i, j])}", ha="center", va="center",
                    fontsize=8)
    names = list(class_names)[: mat.shape[0]]
    ax.set_xticks(range(len(names)))
    ax.set_xticklabels(names, rotation=30)
    ax.set_yticks(range(len(names)))
    ax.set_yticklabels(names)
    ax.set_xlabel("prediction")
    ax.set_ylabel("ground truth")
    fig.colorbar(im)
    fig.tight_layout()
    return fig
