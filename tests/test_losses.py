"""Loss suite tests: numpy oracles + semantic properties."""

import numpy as np
import jax.numpy as jnp
import pytest

from vivim_tpu.train import losses as L


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _onehot(t, C):
    return np.eye(C, dtype=np.float64)[t]


@pytest.fixture()
def batch():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    targets = rng.integers(0, 3, (2, 16, 16))
    return logits, targets


def test_dice_oracle(batch):
    logits, targets = batch
    p = _softmax(logits.astype(np.float64))
    t = _onehot(targets, 3)
    inter = (p * t).sum(axis=(1, 2))
    union = p.sum(axis=(1, 2)) + t.sum(axis=(1, 2))
    want = np.mean([1 - ((2 * inter[:, c] + 1e-6) / (union[:, c] + 1e-6)).mean()
                    for c in range(3)])
    got = float(L.dice_loss(jnp.asarray(logits), jnp.asarray(targets)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_tversky_oracle(batch):
    logits, targets = batch
    p = _softmax(logits.astype(np.float64))
    t = _onehot(targets, 3)
    tp = (p * t).sum(axis=(1, 2))
    fp = (p * (1 - t)).sum(axis=(1, 2))
    fn = ((1 - p) * t).sum(axis=(1, 2))
    tv = (tp + 1e-6) / (tp + 0.3 * fp + 0.7 * fn + 1e-6)
    want = np.mean([1 - tv[:, c].mean() for c in range(3)])
    got = float(L.tversky_loss(jnp.asarray(logits), jnp.asarray(targets)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_focal_oracle(batch):
    logits, targets = batch
    alpha = np.array([0.05, 0.475, 0.475])
    p = _softmax(logits.astype(np.float64))
    t = _onehot(targets, 3)
    fw = t * (1 - p) ** 2 + (1 - t) * p**2
    bce = -t * np.log(p + 1e-6) - (1 - t) * np.log(1 - p + 1e-6)
    want = sum((alpha[c] * fw[..., c] * bce[..., c]).mean() for c in range(3))
    got = float(L.class_balanced_focal_loss(
        jnp.asarray(logits), jnp.asarray(targets), alpha=alpha))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # auto-alpha path runs and is positive
    auto = float(L.class_balanced_focal_loss(
        jnp.asarray(logits), jnp.asarray(targets)))
    assert auto > 0


def test_recall_focused_composition(batch):
    logits, targets = batch
    lo, ta = jnp.asarray(logits), jnp.asarray(targets)
    want = 0.4 * float(L.class_balanced_focal_loss(
        lo, ta, gamma=2.0, alpha=(0.05, 0.475, 0.475))) + 0.6 * float(
        L.tversky_loss(lo, ta))
    got = float(L.recall_focused_loss(lo, ta))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_structure_loss_weight_map():
    """weit = 1 + 5|meanpool(mask) - mask|: uniform mask -> weit = 1 inside."""
    mask = np.ones((1, 40, 40, 1), np.float32)
    logit = 100.0 * np.ones((1, 40, 40, 1), np.float32)  # perfect prediction
    val = float(L.structure_loss(jnp.asarray(logit), jnp.asarray(mask)))
    assert val < 0.01  # near-zero bce + near-zero iou loss
    # catastrophically wrong prediction -> large loss
    bad = float(L.structure_loss(jnp.asarray(-logit), jnp.asarray(mask)))
    assert bad > 10


def test_multiclass_structure_perfect_prediction(batch):
    _, targets = batch
    t = _onehot(targets, 3).astype(np.float32)
    logits = 50.0 * (2 * t - 1)  # strongly correct one-vs-rest logits
    val = float(L.multiclass_structure_loss(
        jnp.asarray(logits), jnp.asarray(targets)))
    assert val < 0.01


def test_losses_decrease_with_better_predictions(batch):
    _, targets = batch
    t = _onehot(targets, 3).astype(np.float32)
    good = 5.0 * (2 * t - 1)
    rng = np.random.default_rng(1)
    bad = rng.standard_normal(good.shape).astype(np.float32)
    for name, fn in L.LOSSES.items():
        lg = float(fn(jnp.asarray(good), jnp.asarray(targets)))
        lb = float(fn(jnp.asarray(bad), jnp.asarray(targets)))
        assert lg < lb, f"{name}: {lg} !< {lb}"


def test_boundary_aware_runs(batch):
    logits, targets = batch
    v = float(L.boundary_aware_loss(jnp.asarray(logits), jnp.asarray(targets)))
    assert np.isfinite(v) and v > 0
