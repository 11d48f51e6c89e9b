"""Segmentation metrics: vectorized confusion-matrix metrics, the per-class
presence-gated tracker, and surface-distance metrics.

Semantic contracts:

- Scalar metrics match /root/reference/misc2.py:105-260 (ConfusionMatrix
  + dice/jaccard/precision/recall/sensitivity/specificity/accuracy/fscore
  with their empty/full edge-case conventions: nonexisting -> 0.0 by
  default, NaN when ``nan_for_nonexisting``).
- ``MulticlassMetricsTracker`` matches
  multiclass_training_folds.py:64-180: per-sample, per-class metrics
  accumulated ONLY when the class is present in the ground truth
  (``class_counts`` gating); ``get_results`` returns per-class values
  (None when never present) and macro means over present classes.
- Surface metrics (hausdorff_distance, hausdorff_distance_95,
  avg_surface_distance, avg_surface_distance_symmetric) reproduce the
  medpy definitions used by misc2.py:262-330 via scipy (surface voxels =
  mask minus its erosion; distances via EDT), since medpy is not vendored.

TPU-first design: the hot path — per-sample per-class tp/fp/tn/fn over a
batch — is a single vectorized (jittable) reduction
(``per_class_confusion``); the reference loops a python ConfusionMatrix per
sample per class.  Scalar formulas then run host-side on tiny (N, C)
arrays.
"""

from __future__ import annotations

import numpy as np

try:  # optional at import time (jit path)
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jnp = None


def per_class_confusion(pred_labels, gt_labels, num_classes):
    """(N, H, W) int preds/gts -> (N, C, 4) [tp, fp, tn, fn] counts.

    Works with numpy or jax arrays (jittable with static num_classes).
    """
    xp = jnp if (jnp is not None and not isinstance(pred_labels, np.ndarray)) else np
    N = pred_labels.shape[0]
    size = int(np.prod(pred_labels.shape[1:]))
    out = []
    for c in range(num_classes):
        p = (pred_labels == c)
        g = (gt_labels == c)
        tp = xp.sum(p & g, axis=(1, 2))
        fp = xp.sum(p & ~g, axis=(1, 2))
        fn = xp.sum(~p & g, axis=(1, 2))
        tn = size - tp - fp - fn
        out.append(xp.stack([tp, fp, tn, fn], axis=-1))
    return xp.stack(out, axis=1)


def _nan_or_zero(nan_for_nonexisting):
    return float("nan") if nan_for_nonexisting else 0.0


def dice(tp, fp, tn, fn, nan_for_nonexisting=False):
    """2TP / (2TP + FP + FN); both empty -> 0/NaN (misc2.py:105-120)."""
    if tp + fp == 0 and tp + fn == 0:
        return _nan_or_zero(nan_for_nonexisting)
    return float(2.0 * tp / (2 * tp + fp + fn))


def jaccard(tp, fp, tn, fn, nan_for_nonexisting=False):
    if tp + fp == 0 and tp + fn == 0:
        return _nan_or_zero(nan_for_nonexisting)
    return float(tp / (tp + fp + fn))


def precision(tp, fp, tn, fn, nan_for_nonexisting=False):
    if tp + fp == 0:  # test empty
        return _nan_or_zero(nan_for_nonexisting)
    return float(tp / (tp + fp))


def recall(tp, fp, tn, fn, nan_for_nonexisting=False):
    if tp + fn == 0:  # reference empty
        return _nan_or_zero(nan_for_nonexisting)
    return float(tp / (tp + fn))


sensitivity = recall


def specificity(tp, fp, tn, fn, nan_for_nonexisting=False):
    if tn + fp == 0:  # reference full
        return _nan_or_zero(nan_for_nonexisting)
    return float(tn / (tn + fp))


def accuracy(tp, fp, tn, fn, **_):
    return float((tp + tn) / (tp + fp + tn + fn))


def fscore(tp, fp, tn, fn, nan_for_nonexisting=False, beta=1.0):
    if tp + fp == 0 and tp + fn == 0:
        return _nan_or_zero(nan_for_nonexisting)
    b2 = beta * beta
    denom = (1 + b2) * tp + b2 * fn + fp
    if denom == 0:
        return _nan_or_zero(nan_for_nonexisting)
    return float((1 + b2) * tp / denom)


def false_positive_rate(tp, fp, tn, fn, nan_for_nonexisting=False):
    """FP / (FP + TN) == 1 - specificity (misc2.py:222-225).

    Mirrors the reference exactly: when the denominator case is
    nonexisting this is 1 - 0 = 1.0 (or 1 - NaN = NaN)."""
    return 1.0 - specificity(tp, fp, tn, fn, nan_for_nonexisting)


def false_omission_rate(tp, fp, tn, fn, nan_for_nonexisting=False):
    """FN / (TN + FN); test full -> 0/NaN (misc2.py:228-243)."""
    if tn + fn == 0:  # test full
        return _nan_or_zero(nan_for_nonexisting)
    return float(fn / (fn + tn))


def negative_predictive_value(tp, fp, tn, fn, nan_for_nonexisting=False):
    """TN / (TN + FN) == 1 - false_omission_rate (misc2.py:263-266)."""
    return 1.0 - false_omission_rate(tp, fp, tn, fn, nan_for_nonexisting)


def false_negative_rate(tp, fp, tn, fn, nan_for_nonexisting=False):
    """FN / (TP + FN) == 1 - sensitivity (misc2.py:246-249)."""
    return 1.0 - sensitivity(tp, fp, tn, fn, nan_for_nonexisting)


def true_negative_rate(tp, fp, tn, fn, nan_for_nonexisting=False):
    """TN / (TN + FP) == specificity (misc2.py:252-255)."""
    return specificity(tp, fp, tn, fn, nan_for_nonexisting)


def false_discovery_rate(tp, fp, tn, fn, nan_for_nonexisting=False):
    """FP / (TP + FP) == 1 - precision (misc2.py:258-260)."""
    return 1.0 - precision(tp, fp, tn, fn, nan_for_nonexisting)


def total_positives_test(tp, fp, tn, fn, **_):
    """TP + FP (misc2.py:269-277)."""
    return tp + fp


def total_negatives_test(tp, fp, tn, fn, **_):
    """TN + FN (misc2.py:280-288)."""
    return tn + fn


def total_positives_reference(tp, fp, tn, fn, **_):
    """TP + FN (misc2.py:291-299)."""
    return tp + fn


def total_negatives_reference(tp, fp, tn, fn, **_):
    """TN + FP (misc2.py:302-310)."""
    return tn + fp


CONFUSION_METRICS = {
    "dice": dice,
    "jaccard": jaccard,
    "precision": precision,
    "recall": recall,
    "sensitivity": sensitivity,
    "specificity": specificity,
    "accuracy": accuracy,
    "f_measure": fscore,
    "false_positive_rate": false_positive_rate,
    "false_omission_rate": false_omission_rate,
    "negative_predictive_value": negative_predictive_value,
    "false_negative_rate": false_negative_rate,
    "true_negative_rate": true_negative_rate,
    "false_discovery_rate": false_discovery_rate,
    "total_positives_test": total_positives_test,
    "total_negatives_test": total_negatives_test,
    "total_positives_reference": total_positives_reference,
    "total_negatives_reference": total_negatives_reference,
}


# ---------------------------------------------------------------------------
# Surface-distance metrics (medpy-equivalent, scipy-based)
# ---------------------------------------------------------------------------


def _surface_distances(test, reference, connectivity=1):
    from scipy.ndimage import (
        binary_erosion,
        distance_transform_edt,
        generate_binary_structure,
    )

    test = np.atleast_1d(test.astype(bool))
    reference = np.atleast_1d(reference.astype(bool))
    footprint = generate_binary_structure(test.ndim, connectivity)
    if not test.any() or not reference.any():
        raise RuntimeError("surface distance undefined for empty masks")
    test_border = test ^ binary_erosion(test, structure=footprint,
                                        iterations=1)
    ref_border = reference ^ binary_erosion(reference, structure=footprint,
                                            iterations=1)
    dt = distance_transform_edt(~ref_border)
    return dt[test_border]


def hausdorff_distance(test, reference, connectivity=1,
                       nan_for_nonexisting=False):
    try:
        d1 = _surface_distances(test, reference, connectivity)
        d2 = _surface_distances(reference, test, connectivity)
    except RuntimeError:
        return _nan_or_zero(nan_for_nonexisting)
    return float(max(d1.max(), d2.max()))


def hausdorff_distance_95(test, reference, connectivity=1,
                          nan_for_nonexisting=False):
    try:
        d1 = _surface_distances(test, reference, connectivity)
        d2 = _surface_distances(reference, test, connectivity)
    except RuntimeError:
        return _nan_or_zero(nan_for_nonexisting)
    return float(max(np.percentile(d1, 95), np.percentile(d2, 95)))


def avg_surface_distance(test, reference, connectivity=1,
                         nan_for_nonexisting=False):
    try:
        return float(_surface_distances(test, reference, connectivity).mean())
    except RuntimeError:
        return _nan_or_zero(nan_for_nonexisting)


def avg_surface_distance_symmetric(test, reference, connectivity=1,
                                   nan_for_nonexisting=False):
    try:
        d1 = _surface_distances(test, reference, connectivity)
        d2 = _surface_distances(reference, test, connectivity)
    except RuntimeError:
        return _nan_or_zero(nan_for_nonexisting)
    return float(np.concatenate([d1, d2]).mean())


ALL_METRICS = dict(CONFUSION_METRICS)
ALL_METRICS.update({
    "hausdorff_distance": hausdorff_distance,
    "hausdorff_distance_95": hausdorff_distance_95,
    "avg_surface_distance": avg_surface_distance,
    "avg_surface_distance_symmetric": avg_surface_distance_symmetric,
})


# ---------------------------------------------------------------------------
# Presence-gated per-class tracker
# ---------------------------------------------------------------------------


class MulticlassMetricsTracker:
    """Accumulates per-class metrics only when the class appears in GT.

    ``update`` takes class-probability/logit maps (N, H, W, C) or label maps
    (N, H, W) for predictions, and integer label maps (N, H, W) for GT.
    """

    TRACKED = ("dice", "jaccard", "precision", "recall", "f_measure",
               "specificity")

    def __init__(self, num_classes=3):
        self.num_classes = num_classes
        self.reset()

    def reset(self):
        self.values = {m: [[] for _ in range(self.num_classes)]
                       for m in self.TRACKED}
        self.class_counts = [0] * self.num_classes

    def update(self, pred, gt):
        pred = np.asarray(pred)
        gt = np.asarray(gt)
        if pred.ndim == gt.ndim + 1:  # (N, H, W, C) scores -> labels
            pred = pred.argmax(axis=-1)
        pred = pred.reshape(-1, *pred.shape[-2:])
        gt = gt.reshape(-1, *gt.shape[-2:])
        conf = np.asarray(per_class_confusion(pred, gt, self.num_classes))
        self.update_from_confusion(conf)

    def update_from_confusion(self, conf):
        """Accumulate from precomputed (N, C, 4) [tp, fp, tn, fn] counts
        (the device-side output of ``per_class_confusion`` — class presence
        in GT is exactly tp + fn > 0, so no label maps are needed)."""
        conf = np.asarray(conf)
        present = (conf[:, :, 0] + conf[:, :, 3]) > 0
        for i in range(conf.shape[0]):
            for c in range(self.num_classes):
                if not present[i, c]:
                    continue
                self.class_counts[c] += 1
                tp, fp, tn, fn = (int(v) for v in conf[i, c])
                for m in self.TRACKED:
                    self.values[m][c].append(
                        CONFUSION_METRICS[m](tp, fp, tn, fn))

    def get_results(self):
        results = {}
        for m in self.TRACKED:
            per_class = [
                float(np.mean(self.values[m][c]))
                if self.class_counts[c] > 0 else None
                for c in range(self.num_classes)]
            valid = [v for v in per_class if v is not None]
            results[m] = {
                "per_class": per_class,
                "mean": float(np.mean(valid)) if valid else 0.0,
            }
        results["class_counts"] = list(self.class_counts)
        return results
