"""Metric tests: confusion metrics vs direct formulas, tracker gating,
surface distances vs brute force."""

import numpy as np
import pytest

from vivim_tpu.train import metrics as M


def test_per_class_confusion_counts():
    pred = np.array([[[0, 1], [2, 1]]])
    gt = np.array([[[0, 1], [1, 1]]])
    conf = M.per_class_confusion(pred, gt, 3)
    # class 0: tp=1 fp=0 fn=0 tn=3
    np.testing.assert_array_equal(conf[0, 0], [1, 0, 3, 0])
    # class 1: pred {01,11}, gt {01,10,11}: tp=2 fp=0 fn=1 tn=1
    np.testing.assert_array_equal(conf[0, 1], [2, 0, 1, 1])
    # class 2: pred one pixel, gt none: tp=0 fp=1 fn=0 tn=3
    np.testing.assert_array_equal(conf[0, 2], [0, 1, 3, 0])


def test_scalar_metric_formulas():
    tp, fp, tn, fn = 6, 2, 10, 2
    assert M.dice(tp, fp, tn, fn) == pytest.approx(12 / 16)
    assert M.jaccard(tp, fp, tn, fn) == pytest.approx(6 / 10)
    assert M.precision(tp, fp, tn, fn) == pytest.approx(6 / 8)
    assert M.recall(tp, fp, tn, fn) == pytest.approx(6 / 8)
    assert M.specificity(tp, fp, tn, fn) == pytest.approx(10 / 12)
    assert M.accuracy(tp, fp, tn, fn) == pytest.approx(16 / 20)
    assert M.fscore(tp, fp, tn, fn) == pytest.approx(12 / (12 + 2 + 2))


def test_edge_case_conventions():
    # both empty -> 0 by default, NaN when requested (misc2 convention)
    assert M.dice(0, 0, 10, 0) == 0.0
    assert np.isnan(M.dice(0, 0, 10, 0, nan_for_nonexisting=True))
    assert M.precision(0, 0, 10, 2) == 0.0   # test empty
    assert M.recall(0, 3, 10, 0) == 0.0      # reference empty
    assert M.specificity(5, 0, 0, 0) == 0.0  # reference full


def test_rate_metric_formulas():
    """The 10 registry entries added for misc2.py:386-406 parity."""
    tp, fp, tn, fn = 6, 2, 10, 2
    assert M.false_positive_rate(tp, fp, tn, fn) == pytest.approx(2 / 12)
    assert M.false_omission_rate(tp, fp, tn, fn) == pytest.approx(2 / 12)
    assert M.negative_predictive_value(tp, fp, tn, fn) == pytest.approx(10 / 12)
    assert M.false_negative_rate(tp, fp, tn, fn) == pytest.approx(2 / 8)
    assert M.true_negative_rate(tp, fp, tn, fn) == pytest.approx(10 / 12)
    assert M.false_discovery_rate(tp, fp, tn, fn) == pytest.approx(2 / 8)
    assert M.total_positives_test(tp, fp, tn, fn) == 8
    assert M.total_negatives_test(tp, fp, tn, fn) == 12
    assert M.total_positives_reference(tp, fp, tn, fn) == 8
    assert M.total_negatives_reference(tp, fp, tn, fn) == 12


def test_rate_metric_edge_conventions():
    # reference returns 1 - <base metric>, so nonexisting -> 1 - 0 = 1.0
    # by default and 1 - NaN = NaN when nan_for_nonexisting (misc2 exactly)
    assert M.false_positive_rate(5, 0, 0, 0) == 1.0  # reference full
    assert np.isnan(M.false_positive_rate(5, 0, 0, 0, nan_for_nonexisting=True))
    assert M.false_omission_rate(5, 5, 0, 0) == 0.0  # test full
    assert np.isnan(M.false_omission_rate(5, 5, 0, 0, nan_for_nonexisting=True))
    assert M.negative_predictive_value(5, 5, 0, 0) == 1.0  # 1 - FOR
    assert M.false_negative_rate(0, 3, 10, 0) == 1.0  # reference empty
    assert M.false_discovery_rate(0, 0, 10, 2) == 1.0  # test empty
    assert M.true_negative_rate(5, 0, 0, 0) == 0.0  # == specificity


def test_all_metrics_registry_complete():
    # full misc2.py:386-406 surface (plus our extra direct entries)
    for name in ("false_positive_rate", "dice", "jaccard",
                 "hausdorff_distance", "hausdorff_distance_95", "precision",
                 "recall", "avg_surface_distance_symmetric",
                 "avg_surface_distance", "accuracy", "false_omission_rate",
                 "negative_predictive_value", "false_negative_rate",
                 "true_negative_rate", "false_discovery_rate",
                 "total_positives_test", "total_negatives_test",
                 "total_positives_reference", "total_negatives_reference"):
        assert name in M.ALL_METRICS, name


def test_tracker_presence_gating():
    tr = M.MulticlassMetricsTracker(num_classes=3)
    gt = np.zeros((2, 8, 8), np.int32)
    gt[0, :4, :4] = 1  # class 1 present only in sample 0; class 2 never
    pred = np.zeros((2, 8, 8, 3), np.float32)
    pred[..., 0] = 1.0
    pred[0, :4, :4, 0] = 0.0
    pred[0, :4, :4, 1] = 2.0  # perfect class-1 prediction in sample 0
    tr.update(pred, gt)
    res = tr.get_results()
    assert res["class_counts"] == [2, 1, 0]
    assert res["dice"]["per_class"][1] == pytest.approx(1.0)
    assert res["dice"]["per_class"][2] is None
    # macro mean over present classes only
    d0, d1 = res["dice"]["per_class"][:2]
    assert res["dice"]["mean"] == pytest.approx((d0 + d1) / 2)


def test_surface_distances_simple_shift():
    # two unit squares offset by 2 pixels: hausdorff == 2
    a = np.zeros((16, 16), bool)
    b = np.zeros((16, 16), bool)
    a[4:8, 4:8] = True
    b[4:8, 6:10] = True
    hd = M.hausdorff_distance(a, b)
    assert hd == pytest.approx(2.0)
    assert M.hausdorff_distance_95(a, b) <= hd
    assert M.avg_surface_distance(a, a) == 0.0
    assert M.avg_surface_distance_symmetric(a, b) > 0
    # empty mask -> 0 (or NaN)
    empty = np.zeros((16, 16), bool)
    assert M.hausdorff_distance(a, empty) == 0.0
    assert np.isnan(M.hausdorff_distance(a, empty, nan_for_nonexisting=True))


def test_tracker_matches_direct_computation():
    rng = np.random.default_rng(0)
    gt = rng.integers(0, 3, (4, 16, 16))
    logits = rng.standard_normal((4, 16, 16, 3)).astype(np.float32)
    tr = M.MulticlassMetricsTracker(3)
    tr.update(logits, gt)
    res = tr.get_results()
    # recompute dice for class 0, sample 0 by hand
    pl = logits.argmax(-1)
    p = pl[0] == 0
    g = gt[0] == 0
    tp = (p & g).sum(); fp = (p & ~g).sum(); fn = (~p & g).sum()
    d00 = 2 * tp / (2 * tp + fp + fn)
    per_sample = [2 * ((pl[i] == 0) & (gt[i] == 0)).sum() /
                  (2 * ((pl[i] == 0) & (gt[i] == 0)).sum()
                   + ((pl[i] == 0) & (gt[i] != 0)).sum()
                   + ((pl[i] != 0) & (gt[i] == 0)).sum())
                  for i in range(4) if (gt[i] == 0).any()]
    assert res["dice"]["per_class"][0] == pytest.approx(np.mean(per_sample))
    assert per_sample[0] == pytest.approx(d00)


def test_device_confusion_path_matches_host():
    """The jittable eval-metric path (per_class_confusion +
    confusion_matrix_device + update_from_confusion) reproduces the
    host/label-map path exactly."""
    import jax
    import jax.numpy as jnp

    from vivim_tpu.train.loop import confusion_matrix_device
    from vivim_tpu.train.trainer import confusion_matrix_from_labels

    rng = np.random.default_rng(1)
    gt = rng.integers(0, 3, (5, 12, 12))
    pred = rng.integers(0, 3, (5, 12, 12))

    cm_dev = np.asarray(jax.jit(
        lambda p, g: confusion_matrix_device(p, g, 3))(
            jnp.asarray(pred), jnp.asarray(gt)))
    cm_host = confusion_matrix_from_labels(pred, gt, 3)
    np.testing.assert_array_equal(cm_dev, cm_host)

    conf = np.asarray(jax.jit(
        lambda p, g: M.per_class_confusion(p, g, 3))(
            jnp.asarray(pred), jnp.asarray(gt)))
    tr_dev = M.MulticlassMetricsTracker(3)
    tr_dev.update_from_confusion(conf)
    tr_host = M.MulticlassMetricsTracker(3)
    tr_host.update(pred, gt)
    assert tr_dev.class_counts == tr_host.class_counts
    for m in M.MulticlassMetricsTracker.TRACKED:
        got = tr_dev.get_results()[m]
        want = tr_host.get_results()[m]
        assert got["per_class"] == want["per_class"]
