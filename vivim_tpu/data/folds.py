"""Case-level stratified group k-fold splitting.

Behavioral contract from /root/reference/multiclass_StratKFold.py:

- ``gather_annotated_frames`` (:17-52): walk the raw tree for dirs with
  frame.png + any mask; record per-frame mask presence and the top-level
  dir as the clinical case (= group).
- Stratification label (:354-445): histological type (from an optional CSV)
  x frame-count quantile bin (qcut n_bins with fallbacks) x solid-presence
  bin x non-solid-presence bin, joined as a string per case.
- ``StratifiedGroupKFold`` over frames with case groups; ``max_attempts``
  seeds are tried and the split with the lowest mean imbalance score is
  kept (:456-474).  Imbalance score per fold (evaluate_fold_balance,
  :215-330): sum of |split solid/non-solid ratio - overall ratio| over
  train and val.
- Output (:569-637): per-fold ``fold_i/{train,val}/{case}/{item}/`` copied
  trees (``copy=True``) or an index of frame records; ``split_metadata.csv``
  + ``fold_statistics.csv``; balance plots.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

import numpy as np
import pandas as pd


def gather_annotated_frames(input_root) -> pd.DataFrame:
    records = []
    input_root = Path(input_root)
    for dirpath, _, filenames in os.walk(input_root):
        files = {f.lower() for f in filenames}
        if "frame.png" not in files:
            continue
        if not any(m in files for m in
                   ("background.png", "solid.png", "non-solid.png")):
            continue
        d = Path(dirpath)
        rel = d.relative_to(input_root)
        rec = {
            "clinical_case": rel.parts[0],
            "item": rel.as_posix(),
            "frame_path": str(d / "frame.png"),
            "has_background": "background.png" in files,
            "has_solid": "solid.png" in files,
            "has_nonsolid": "non-solid.png" in files,
        }
        rec["background_path"] = (str(d / "background.png")
                                  if rec["has_background"] else None)
        rec["solid_path"] = str(d / "solid.png") if rec["has_solid"] else None
        rec["nonsolid_path"] = (str(d / "non-solid.png")
                                if rec["has_nonsolid"] else None)
        # optional fan-beam mask: carried through the split untouched
        # (multiclass_StratKFold.py:36-50, 615-616; never applied by the
        # reference datasets — the "apply fan" in main_dataset.py:260 is an
        # unimplemented comment)
        rec["has_fan"] = "fan.png" in files
        rec["fan_path"] = str(d / "fan.png") if rec["has_fan"] else None
        records.append(rec)
    return pd.DataFrame(records)


def _safe_qcut(series, q, labels=None):
    """qcut with fallback to a median split when the values cannot support
    the requested bins (constant values yield all-NaN under
    duplicates='drop' in recent pandas, ValueError in older)."""
    lo, hi = (labels if labels is not None and len(labels) == 2 else (0, 1))
    try:
        binned = pd.qcut(series, q=q, labels=labels, duplicates="drop")
        binned = pd.Series(np.asarray(binned.astype(object)),
                           index=series.index)
    except ValueError:
        binned = pd.Series(np.nan, index=series.index, dtype=object)
    if binned.isna().any():
        med = series.median()
        fallback = np.where(series <= med, lo, hi)
        binned = binned.where(binned.notna(), pd.Series(fallback,
                                                        index=series.index))
    return binned


def build_strat_labels(df: pd.DataFrame, hist_df: pd.DataFrame | None = None,
                       n_bins: int = 4) -> pd.DataFrame:
    """Case-level stratification labels (hist x count_bin x solid x nonsolid)."""
    case_df = pd.DataFrame({"clinical_case": df["clinical_case"].unique()})
    if hist_df is not None and "histological" in hist_df.columns:
        case_df = case_df.merge(
            hist_df[["clinical_case", "histological"]], on="clinical_case",
            how="left")
        case_df["histological"] = case_df["histological"].fillna("unknown")
    else:
        case_df["histological"] = "unknown"
    counts = df.groupby("clinical_case").size().rename("frame_count")
    case_df = case_df.join(counts, on="clinical_case")
    case_df["count_bin"] = _safe_qcut(case_df["frame_count"], n_bins)
    presence = df.groupby("clinical_case").agg(
        has_solid=("has_solid", "mean"), has_nonsolid=("has_nonsolid", "mean"))
    case_df = case_df.join(presence, on="clinical_case")
    case_df["solid_bin"] = _safe_qcut(
        case_df["has_solid"], 2, ["low_solid", "high_solid"])
    case_df["nonsolid_bin"] = _safe_qcut(
        case_df["has_nonsolid"], 2, ["low_nonsolid", "high_nonsolid"])
    case_df["strat_label"] = (
        case_df["histological"].astype(str) + "_bin"
        + case_df["count_bin"].astype(str) + "_"
        + case_df["solid_bin"].astype(str) + "_"
        + case_df["nonsolid_bin"].astype(str)).fillna("unknown")
    return case_df.drop_duplicates(subset="clinical_case")


def evaluate_fold_balance(folds, df: pd.DataFrame) -> pd.DataFrame:
    total = max(len(df), 1)
    overall_solid = df["has_solid"].sum() / total
    overall_nonsolid = df["has_nonsolid"].sum() / total
    rows = []
    for fold_idx, (train_idx, val_idx) in enumerate(folds):
        tr, va = df.iloc[train_idx], df.iloc[val_idx]
        tsr = tr["has_solid"].mean() if len(tr) else 0.0
        tnr = tr["has_nonsolid"].mean() if len(tr) else 0.0
        vsr = va["has_solid"].mean() if len(va) else 0.0
        vnr = va["has_nonsolid"].mean() if len(va) else 0.0
        rows.append({
            "fold": fold_idx,
            "train_frames": len(tr),
            "val_frames": len(va),
            "train_solid_ratio": tsr,
            "train_nonsolid_ratio": tnr,
            "val_solid_ratio": vsr,
            "val_nonsolid_ratio": vnr,
            "imbalance_score": (abs(tsr - overall_solid)
                                + abs(tnr - overall_nonsolid)
                                + abs(vsr - overall_solid)
                                + abs(vnr - overall_nonsolid)),
        })
    return pd.DataFrame(rows)


def make_stratified_group_folds(
    input_root,
    output_root,
    hist_csv=None,
    n_splits: int = 5,
    random_state: int = 42,
    n_bins: int = 4,
    max_attempts: int = 10,
    copy: bool = True,
    plots: bool = True,
):
    """Returns (fold index list, balance DataFrame, best seed).

    Fold index: list of dicts {"train": frame-record list, "val": ...}
    where each record carries the source paths; with ``copy=True`` the
    reference's ``fold_i/{train,val}`` copied trees are also produced.
    """
    from sklearn.model_selection import StratifiedGroupKFold

    df = gather_annotated_frames(input_root)
    if df.empty:
        raise ValueError(f"no annotated frames under {input_root}")
    output_root = Path(output_root)
    output_root.mkdir(parents=True, exist_ok=True)
    hist_df = pd.read_csv(hist_csv) if hist_csv else None
    case_df = build_strat_labels(df, hist_df, n_bins)
    y = df["clinical_case"].map(
        case_df.set_index("clinical_case")["strat_label"])
    groups = df["clinical_case"]

    best_folds, best_score, best_seed = None, float("inf"), random_state
    for attempt in range(max_attempts):
        seed = random_state + attempt
        sgkf = StratifiedGroupKFold(n_splits=n_splits, shuffle=True,
                                    random_state=seed)
        folds = list(sgkf.split(df, y=y, groups=groups))
        score = evaluate_fold_balance(folds, df)["imbalance_score"].mean()
        if score < best_score:
            best_folds, best_score, best_seed = folds, score, seed

    balance_df = evaluate_fold_balance(best_folds, df)

    fold_index = []
    for fold_idx, (train_idx, val_idx) in enumerate(best_folds):
        entry = {}
        for split_name, idx in (("train", train_idx), ("val", val_idx)):
            subset = df.iloc[idx]
            entry[split_name] = subset.to_dict("records")
            if copy:
                for _, row in subset.iterrows():
                    dest = (output_root / f"fold_{fold_idx}" / split_name
                            / row["clinical_case"] / Path(row["item"]).name)
                    dest.mkdir(parents=True, exist_ok=True)
                    shutil.copy2(row["frame_path"], dest / "frame.png")
                    for key, name in (("background_path", "background.png"),
                                      ("solid_path", "solid.png"),
                                      ("nonsolid_path", "non-solid.png"),
                                      ("fan_path", "fan.png")):
                        if isinstance(row[key], str):  # None -> NaN in pandas
                            shutil.copy2(row[key], dest / name)
        fold_index.append(entry)

    metadata = {
        "total_frames": len(df),
        "total_cases": df["clinical_case"].nunique(),
        "solid_ratio": df["has_solid"].mean(),
        "nonsolid_ratio": df["has_nonsolid"].mean(),
        "seed_used": best_seed,
        "n_splits": n_splits,
        "n_bins": n_bins,
        "balance_score": best_score,
    }
    pd.DataFrame([metadata]).to_csv(output_root / "split_metadata.csv",
                                    index=False)
    balance_df.to_csv(output_root / "fold_statistics.csv", index=False)
    if plots:
        try:
            _balance_plots(balance_df, df, output_root)
        except Exception as e:  # plotting is best-effort
            print(f"[folds] plot generation skipped: {e}")
    return fold_index, balance_df, best_seed


def _balance_plots(balance_df, df, output_root: Path):
    """Fold-balance and dataset-analysis figures
    (create_visualizations, multiclass_StratKFold.py:55-212 + :484-566)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    x = balance_df["fold"]
    axes[0].bar(x - 0.2, balance_df["train_frames"], 0.4, label="train")
    axes[0].bar(x + 0.2, balance_df["val_frames"], 0.4, label="val")
    axes[0].set_title("frames per fold"); axes[0].legend()
    axes[1].plot(x, balance_df["train_solid_ratio"], "o-", label="train solid")
    axes[1].plot(x, balance_df["val_solid_ratio"], "s-", label="val solid")
    axes[1].plot(x, balance_df["train_nonsolid_ratio"], "o--",
                 label="train non-solid")
    axes[1].plot(x, balance_df["val_nonsolid_ratio"], "s--",
                 label="val non-solid")
    axes[1].set_title("mask-presence ratios"); axes[1].legend(fontsize=7)
    axes[2].bar(x, balance_df["imbalance_score"])
    axes[2].set_title("imbalance score")
    fig.tight_layout()
    fig.savefig(output_root / "fold_balance.png")
    plt.close(fig)

    fig, ax = plt.subplots(figsize=(6, 4))
    counts = df.groupby("clinical_case").size()
    ax.hist(counts, bins=min(20, max(3, counts.nunique())))
    ax.set_title("frames per case")
    fig.tight_layout()
    fig.savefig(output_root / "dataset_analysis.png")
    plt.close(fig)
