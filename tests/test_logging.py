"""MetricLogger tests: JSONL records, confusion-matrix logging, wandb
image logging through a stub (wandb itself is not in this image)."""

import json
import os

import numpy as np

from vivim_tpu.train import logging as L


class _StubWandb:
    """Minimal wandb stand-in capturing log calls."""

    class Image:
        def __init__(self, obj):
            self.obj = obj

    def __init__(self):
        self.logged = []

    def log(self, d, step=None):
        self.logged.append((d, step))

    def finish(self):
        pass


def test_jsonl_and_cm_arrays(tmp_path):
    lg = L.MetricLogger(str(tmp_path))
    lg.log({"train/loss": 1.5}, step=3)
    cm = np.array([[5, 1], [2, 8]])
    lg.log_confusion_matrix(cm, ["a", "b"], step=3)
    lg.finish()
    recs = [json.loads(l) for l in open(os.path.join(tmp_path,
                                                     "metrics.jsonl"))]
    assert recs[0]["train/loss"] == 1.5
    assert recs[1]["val/confusion_matrix"] == [[5.0, 1.0], [2.0, 8.0]]
    assert recs[1]["val/confusion_matrix_row_norm"][0][0] == 5 / 6


def test_wandb_image_logging(tmp_path):
    lg = L.MetricLogger(str(tmp_path))
    lg.wandb = _StubWandb()
    cm = np.array([[5, 1], [2, 8]])
    lg.log_confusion_matrix(cm, ["a", "b"], step=2)
    img_keys = [k for d, _ in lg.wandb.logged for k in d
                if isinstance(d[k], _StubWandb.Image)]
    assert set(img_keys) == {"val/confusion_matrix_img",
                             "val/confusion_matrix_row_norm_img",
                             "val/confusion_matrix_col_norm_img"}
    lg.log_image("panels/sample", np.zeros((8, 8, 3), np.uint8), step=2)
    assert any("panels/sample" in d for d, _ in lg.wandb.logged)
    lg.finish()


def test_confusion_heatmap_figure():
    import matplotlib.pyplot as plt

    fig = L.confusion_heatmap(np.array([[0.9, 0.1], [0.3, 0.7]]), ["x", "y"])
    assert fig is not None
    plt.close(fig)
