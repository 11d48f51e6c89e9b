"""Polyp pipeline: dataset semantics + train CLI smoke.

Reference semantics from
/root/reference/original_training_scripts_not_used/data_polyp.py (see
vivim_tpu/data/polyp.py docstring for the line map).
"""

import os

import numpy as np
import pytest
from PIL import Image

from vivim_tpu.data.polyp import (
    PolypDataset,
    PolypTestDataset,
    centered_windows,
)


def _make_polyp_tree(root, split="Train", n_videos=2, n_frames=6, size=40,
                     kvasir=False):
    rng = np.random.default_rng(0)
    base = os.path.join(root, split) if split else root
    for v in range(n_videos):
        name = f"Kvasir_{v}" if kvasir else f"vid{v}"
        fdir = os.path.join(base, name, "Frame")
        gdir = os.path.join(base, name, "GT")
        os.makedirs(fdir, exist_ok=True)
        os.makedirs(gdir, exist_ok=True)
        for i in range(n_frames):
            img = rng.integers(0, 255, (size, size, 3), np.uint8)
            Image.fromarray(img).save(os.path.join(fdir, f"{i}.jpg"))
            m = np.zeros((size, size), np.uint8)
            m[8:20, 8:20] = 255
            Image.fromarray(m).save(os.path.join(gdir, f"{i}.png"))
    return root


def test_centered_windows_edge_clamping():
    """data_polyp.py:173-183: one window per frame, indices clamped."""
    w = centered_windows(6, 5)
    assert len(w) == 6
    assert w[0] == [0, 0, 0, 1, 2]
    assert w[2] == [0, 1, 2, 3, 4]
    assert w[5] == [3, 4, 5, 5, 5]
    # clip_len=3: range(-1, 2)
    assert centered_windows(3, 3) == [[0, 0, 1], [0, 1, 2], [1, 2, 2]]


def test_centered_windows_even_clip_len_matches_reference():
    """Even lengths lean one frame FORWARD: the reference's
    range(-clip_len//2+1, clip_len//2+1) with Python floor division gives
    offsets [-1..2] at clip_len=4, not the symmetric [-2..1]."""
    for n, clip_len in ((8, 4), (8, 2), (8, 6)):
        lo = -clip_len // 2 + 1  # reference expression verbatim
        hi = clip_len // 2 + 1
        want = [[min(max(i + ii, 0), n - 1) for ii in range(lo, hi)]
                for i in range(n)]
        assert centered_windows(n, clip_len) == want
    assert centered_windows(8, 4)[3] == [2, 3, 4, 5]


def test_polyp_dataset_shapes_and_values(tmp_path):
    root = _make_polyp_tree(str(tmp_path))
    ds = PolypDataset(root, size=32, clip_len=5, augment=True, seed=1)
    assert len(ds) == 12  # one clip per frame, 2 videos x 6 frames
    out = ds.load_clip(0)
    assert out["clip"].shape == (5, 32, 32, 3)
    assert out["masks"].shape == (5, 32, 32, 1)
    assert out["edges"].shape == (5, 32, 32, 1)
    # masks continuous in [0,1] (bilinear, unthresholded); edges binary
    assert 0.0 <= out["masks"].min() and out["masks"].max() <= 1.0
    assert set(np.unique(out["edges"])) <= {0.0, 1.0}
    assert out["edges"].sum() > 0  # the blob boundary produces a band


def test_polyp_no_augment_deterministic(tmp_path):
    root = _make_polyp_tree(str(tmp_path))
    ds = PolypDataset(root, size=32, clip_len=3, augment=False, seed=1)
    a = ds.load_clip(1)
    b = ds.load_clip(1)
    np.testing.assert_array_equal(a["clip"], b["clip"])
    np.testing.assert_array_equal(a["masks"], b["masks"])


def test_polyp_test_dataset_flat_layout(tmp_path):
    root = _make_polyp_tree(str(tmp_path / "test"), split="")
    ds = PolypTestDataset(str(tmp_path / "test"), size=32, clip_len=3)
    assert len(ds) == 12
    out = ds.load_clip(0)
    assert out["clip"].shape == (3, 32, 32, 3)


def test_polyp_test_dataset_reference_layout(tmp_path):
    """SalObjTestDataset layout (data_polyp.py:280-290): video dirs INSIDE
    Frame ({root}/Frame/{video}/*.jpg), numerically sorted, GT via
    Frame->GT replacement."""
    rng = np.random.default_rng(0)
    root = str(tmp_path / "CVC-Test")
    for vid in ("2", "10"):  # numeric sort puts 2 before 10
        fdir = os.path.join(root, "Frame", vid)
        gdir = os.path.join(root, "GT", vid)
        os.makedirs(fdir)
        os.makedirs(gdir)
        for i in range(4):
            img = rng.integers(0, 255, (40, 40, 3), np.uint8)
            Image.fromarray(img).save(os.path.join(fdir, f"{i}.jpg"))
            m = np.zeros((40, 40), np.uint8)
            m[8:20, 8:20] = 255
            Image.fromarray(m).save(os.path.join(gdir, f"{i}.png"))
    ds = PolypTestDataset(root, size=32, clip_len=3)
    assert len(ds) == 8  # 2 videos x 4 frames, one clip per frame
    # numeric video order, and windows never cross video boundaries
    assert all("Frame/2/" in p.replace(os.sep, "/")
               for p in ds.samples[0][0])
    assert all("Frame/10/" in p.replace(os.sep, "/")
               for p in ds.samples[4][0])
    # GT paths derived per frame
    assert ds.samples[0][1][0].replace(os.sep, "/").endswith("GT/2/0.png")
    out = ds.load_clip(0)
    assert out["clip"].shape == (3, 32, 32, 3)


def test_polyp_test_dataset_empty_on_wrong_root(tmp_path):
    """A root with none of the accepted layouts yields an explicitly empty
    dataset (the CLI turns this into a hard error)."""
    os.makedirs(str(tmp_path / "nothing"))
    ds = PolypTestDataset(str(tmp_path / "nothing"), size=32, clip_len=3)
    assert len(ds) == 0


def test_polyp_kvasir_sort_is_lexical(tmp_path):
    root = _make_polyp_tree(str(tmp_path), kvasir=True, n_videos=1,
                            n_frames=3)
    ds = PolypDataset(root, size=32, clip_len=3, augment=False)
    # lexical sort for Kvasir videos (data_polyp.py:169-172)
    names = [os.path.basename(p) for p in ds.samples[1][0]]
    assert names == ["0.jpg", "1.jpg", "2.jpg"]


def test_train_polyp_cli_smoke(tmp_path):
    from vivim_tpu.cli.train_polyp import main

    root = _make_polyp_tree(str(tmp_path / "data"), n_videos=1, n_frames=3,
                            size=32)
    metrics = main([
        "-data_path", root, "-clip_length", "3", "-image_size", "32",
        "-train_bs", "2", "-epochs", "1", "-val_freq", "1",
        "-segformer", "tiny", "-num_workers", "0",
        "-save_path", str(tmp_path / "runs"),
    ])
    assert np.isfinite(metrics["train/loss"])
    assert "val/dice" in metrics
