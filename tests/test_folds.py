"""K-fold splitter tests: group integrity, balance scoring, outputs."""

import os

import numpy as np
import pandas as pd
import pytest

from tests.data_fixtures import make_raw_tree
from vivim_tpu.data import folds as F


@pytest.fixture(scope="module")
def raw(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("folds")
    # 6 cases x 4 frames for a 3-fold split
    root = str(tmp / "raw")
    for v in range(6):
        make_raw_tree(root, n_videos=1, n_frames=4, seed=v)
        os.rename(os.path.join(root, "caseA_vid0"),
                  os.path.join(root, f"case_{v}"))
    return tmp, root


def test_gather_annotated_frames(raw):
    _, root = raw
    df = F.gather_annotated_frames(root)
    assert len(df) == 24
    assert df["clinical_case"].nunique() == 6
    assert df["has_solid"].sum() == 12  # every other frame has solid.png
    assert df["has_background"].all()


def test_strat_labels(raw):
    _, root = raw
    df = F.gather_annotated_frames(root)
    case_df = F.build_strat_labels(df)
    assert len(case_df) == 6
    assert case_df["strat_label"].notna().all()
    hist = pd.DataFrame({"clinical_case": ["case_0"],
                         "histological": ["serous"]})
    case_df2 = F.build_strat_labels(df, hist)
    assert "serous" in case_df2.set_index(
        "clinical_case").loc["case_0", "strat_label"]


def test_make_folds_group_integrity(raw):
    tmp, root = raw
    out = str(tmp / "out")
    fold_index, balance_df, seed = F.make_stratified_group_folds(
        root, out, n_splits=3, max_attempts=3, copy=True, plots=True)
    assert len(fold_index) == 3
    for entry in fold_index:
        train_cases = {r["clinical_case"] for r in entry["train"]}
        val_cases = {r["clinical_case"] for r in entry["val"]}
        # group (case) never straddles the split
        assert not (train_cases & val_cases)
        assert train_cases | val_cases == {f"case_{i}" for i in range(6)}
    # copied tree layout
    assert os.path.isdir(os.path.join(out, "fold_0", "train"))
    assert os.path.exists(os.path.join(out, "split_metadata.csv"))
    assert os.path.exists(os.path.join(out, "fold_statistics.csv"))
    assert os.path.exists(os.path.join(out, "fold_balance.png"))
    # full create_visualizations figure set (multiclass_StratKFold.py:55-212)
    for fig in ("frames_per_case_distribution.png",
                "mask_type_distribution.png", "mask_combinations.png",
                "fold_balance_analysis.png", "fold_statistics_table.png"):
        assert os.path.exists(os.path.join(out, fig)), fig
    assert len(balance_df) == 3
    assert (balance_df["imbalance_score"] >= 0).all()
    # copied dirs are loadable by the gatherer again
    df2 = F.gather_annotated_frames(os.path.join(out, "fold_0", "train"))
    assert len(df2) > 0


def test_create_visualizations_histological(raw):
    tmp, root = raw
    out = str(tmp / "viz")
    df = F.gather_annotated_frames(root)
    hist = pd.DataFrame({"clinical_case": ["case_0", "case_1"],
                         "histological": ["serous", "mucinous"]})
    F.create_visualizations(df, out, hist_df=hist)
    for fig in ("histological_distribution.png",
                "frames_by_histological_type.png",
                "mask_by_histological.png"):
        assert os.path.exists(os.path.join(out, fig)), fig
