"""Saliency measure sanity tests: perfect/inverted predictions, ranges."""

import numpy as np
import pytest

from vivim_tpu.train import saliency_metrics as SM


@pytest.fixture()
def maps():
    rng = np.random.default_rng(0)
    gt = np.zeros((64, 64), np.uint8)
    gt[16:40, 20:50] = 255
    perfect = (gt / 255.0).astype(np.float64)
    noisy = np.clip(perfect + 0.2 * rng.standard_normal(gt.shape), 0, 1)
    inverted = 1.0 - perfect
    return gt, perfect, noisy, inverted


def _run(metric_cls, pred, gt):
    m = metric_cls()
    m.step(pred, gt)
    return m.get_results()


def test_mae(maps):
    gt, perfect, noisy, inverted = maps
    assert _run(SM.MAE, perfect, gt)["MAE"] == pytest.approx(0.0)
    assert _run(SM.MAE, inverted, gt)["MAE"] == pytest.approx(1.0)
    assert 0 < _run(SM.MAE, noisy, gt)["MAE"] < 0.5


def test_fmeasure(maps):
    gt, perfect, noisy, inverted = maps
    r = _run(SM.Fmeasure, perfect, gt)
    assert r["adpFm"] > 0.99 and r["maxFm"] > 0.99
    rn = _run(SM.Fmeasure, noisy, gt)
    assert r["maxFm"] >= rn["maxFm"] > 0.5
    assert rn["maxFm"] >= rn["meanFm"]


def test_smeasure(maps):
    gt, perfect, noisy, inverted = maps
    sp = _run(SM.Smeasure, perfect, gt)["Smeasure"]
    sn = _run(SM.Smeasure, noisy, gt)["Smeasure"]
    si = _run(SM.Smeasure, inverted, gt)["Smeasure"]
    assert sp > 0.95 and sp > sn > si
    # empty GT convention: S = 1 - mean(pred)
    empty = np.zeros_like(gt)
    s = _run(SM.Smeasure, np.zeros_like(gt, np.float64), empty)["Smeasure"]
    assert s == pytest.approx(1.0)


def test_emeasure(maps):
    gt, perfect, noisy, inverted = maps
    ep = _run(SM.Emeasure, perfect, gt)
    en = _run(SM.Emeasure, noisy, gt)
    assert ep["maxEm"] > 0.99
    assert ep["maxEm"] >= en["maxEm"] > 0.5


def test_weighted_fmeasure(maps):
    gt, perfect, noisy, inverted = maps
    wp = _run(SM.WeightedFmeasure, perfect, gt)["wFmeasure"]
    wn = _run(SM.WeightedFmeasure, noisy, gt)["wFmeasure"]
    wi = _run(SM.WeightedFmeasure, inverted, gt)["wFmeasure"]
    assert wp > 0.99 and wp > wn > wi
    # empty GT -> 0
    assert _run(SM.WeightedFmeasure, perfect,
                np.zeros_like(gt))["wFmeasure"] == 0.0


def test_medical_curves(maps):
    gt, perfect, noisy, inverted = maps
    r = _run(SM.Medical, noisy, gt)
    for k in ("meanSen", "meanSpe", "meanDice", "meanIoU"):
        assert r[k].shape == (256,)
        assert (r[k] >= 0).all() and (r[k] <= 1 + 1e-9).all()
    # sensitivity decreases as the threshold rises (thresholds go 1 -> 0,
    # stored in that order, so the curve is non-decreasing along the array)
    assert r["meanSen"][0] <= r["meanSen"][-1]
    rp = _run(SM.Medical, perfect, gt)
    assert rp["maxDice"] > 0.99 and rp["maxIoU"] > 0.99
