"""End-to-end inference CLI test: save a tiny model's params, run
cli.infer main() over a gathered synthetic tree, and check metrics.json,
confusion plots and visualizations (reference inference.py surface)."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.data_fixtures import make_gathered_tree


def test_infer_cli_end_to_end(tmp_path):
    import orbax.checkpoint as ocp

    from vivim_tpu.cli import infer as infer_cli
    from vivim_tpu.nn.vivim import Vivim, VivimConfig

    data_dir = tmp_path / "test_tree"
    make_gathered_tree(str(data_dir), n_videos=2, n_frames=6, size=48)

    # save params of a freshly initialized tiny model (orbax layout)
    cfg = VivimConfig.tiny_test()
    model = Vivim(cfg)
    clip = jnp.zeros((1, 3, 48, 48, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), clip)
    ckpt_dir = tmp_path / "ckpt"
    ocp.StandardCheckpointer().save(
        ckpt_dir / "best_0", {"params": variables["params"],
                              "batch_stats": variables["batch_stats"]})

    out_dir = tmp_path / "results"
    infer_cli.main([
        "--ckpt", str(ckpt_dir),
        "--data_dir", str(data_dir),
        "--image_size", "48",
        "--clip_length", "3",
        "--segformer", "tiny",
        "--output_dir", str(out_dir),
        "--save_vis", "true",
        "--vis_count", "2",
    ])

    summary = json.load(open(out_dir / "metrics.json"))
    assert "performance" in summary and "metrics" in summary
    assert summary["performance"]["total_frames"] == 12  # 2 vids x 2 clips x 3
    cm = np.array(summary["confusion_matrix"])
    assert cm.shape == (3, 3) and cm.sum() == 12 * 48 * 48
    for m in ("dice", "jaccard", "precision", "recall"):
        assert np.isfinite(summary["metrics"][m]["mean"])
    pngs = [f for f in os.listdir(out_dir) if f.endswith(".png")]
    # 3 confusion plots (raw/row/col) + at least one vis grid
    assert sum(f.startswith("confusion") for f in pngs) == 3
    assert any(f.startswith("vis_") for f in pngs)
