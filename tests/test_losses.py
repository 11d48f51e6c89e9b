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


# ---------------------------------------------------------------------------
# Legacy VOS losses: torch golden parity vs a transliteration of the
# reference loss.py:4-83 (unused upstream, kept for capability parity)
# ---------------------------------------------------------------------------


def _torch_vos():
    import torch

    def mask_iou(pred, target, averaged=True):
        inter = torch.min(pred, target).sum(2).sum(1)
        union = torch.max(pred, target).sum(2).sum(1)
        iou = inter / union
        return torch.mean(iou) if averaged else iou

    def mask_iou_loss(pred, mask, num_object, ref=None):
        N, K = mask.shape[:2]
        loss = torch.zeros(1)
        start = 0 if K == num_object else 1
        if ref is not None:
            valid = torch.sum(ref.view(ref.shape[0], ref.shape[1], -1),
                              dim=-1) > 0
        for i in range(N):
            obj_loss = 1.0 - mask_iou(pred[i, start:num_object + start],
                                      mask[i, start:num_object + start],
                                      averaged=False)
            if ref is not None:
                obj_loss = obj_loss[valid[i, start:]]
            loss += torch.mean(obj_loss)
        return loss / N

    def cross_entropy_loss(pred, mask, num_object, bootstrap=0.4, ref=None):
        N, _, H, W = mask.shape
        logp = -1 * torch.log(pred)
        num = int(H * W * bootstrap)
        ce = logp[:, :num_object + 1] * mask[:, :num_object + 1]
        if ref is not None:
            valid = torch.sum(ref.view(ref.shape[0], ref.shape[1], -1),
                              dim=-1) > 0
            ce *= valid.float().unsqueeze(2).unsqueeze(3)
        per = torch.sum(ce, dim=1).view(N, -1)
        mloss, _ = torch.sort(per, dim=-1, descending=True)
        return torch.mean(mloss[:, :num])

    def binary_entropy_loss(pred, target, eps=0.001):
        ce = (-1.0 * target * torch.log(pred + eps)
              - (1 - target) * torch.log(1 - pred + eps))
        return torch.mean(ce)

    def smooth_l1_loss(pred, target, gamma=0.075):
        diff = torch.abs(pred - target)
        diff[diff > gamma] -= gamma / 2
        diff[diff <= gamma] *= diff[diff <= gamma] / (2 * gamma)
        return torch.mean(diff)

    return (mask_iou, mask_iou_loss, cross_entropy_loss,
            binary_entropy_loss, smooth_l1_loss)


@pytest.mark.parametrize("with_ref", [False, True])
def test_legacy_vos_losses_match_torch(with_ref):
    torch = pytest.importorskip("torch")
    t_iou, t_iou_loss, t_ce, t_bce, t_sl1 = _torch_vos()
    rng = np.random.default_rng(7)
    N, K, H, W = 3, 4, 16, 16
    num_object = 3  # K != num_object -> start=1 (background skip)
    pred = rng.uniform(0.01, 0.99, (N, K, H, W)).astype(np.float32)
    pred = pred / pred.sum(1, keepdims=True)
    mask = np.eye(K, dtype=np.float32)[
        rng.integers(0, K, (N, H, W))].transpose(0, 3, 1, 2)
    ref = None
    if with_ref:
        ref = (rng.random((N, K, H, W)) < 0.3).astype(np.float32)
        ref[0, 1] = 0.0  # one fully-absent channel exercises the gating

    tp, tm = torch.tensor(pred), torch.tensor(mask)
    tr = torch.tensor(ref) if with_ref else None

    np.testing.assert_allclose(
        float(L.mask_iou(jnp.asarray(pred[:, 0]), jnp.asarray(mask[:, 0]))),
        float(t_iou(tp[:, 0], tm[:, 0])), rtol=1e-5)
    np.testing.assert_allclose(
        float(L.mask_iou_loss(jnp.asarray(pred), jnp.asarray(mask),
                              num_object, ref=None if ref is None
                              else jnp.asarray(ref))),
        float(t_iou_loss(tp, tm, num_object, ref=tr)), rtol=1e-5)
    np.testing.assert_allclose(
        float(L.cross_entropy_loss(jnp.asarray(pred), jnp.asarray(mask),
                                   num_object, ref=None if ref is None
                                   else jnp.asarray(ref))),
        float(t_ce(tp, tm, num_object, ref=tr)), rtol=1e-5)
    np.testing.assert_allclose(
        float(L.binary_entropy_loss(jnp.asarray(pred[:, 0]),
                                    jnp.asarray(mask[:, 0]))),
        float(t_bce(tp[:, 0], tm[:, 0])), rtol=1e-5)
    x = rng.standard_normal((N, H, W)).astype(np.float32) * 0.1
    y = rng.standard_normal((N, H, W)).astype(np.float32) * 0.1
    np.testing.assert_allclose(
        float(L.smooth_l1_loss(jnp.asarray(x), jnp.asarray(y))),
        float(t_sl1(torch.tensor(x), torch.tensor(y))), rtol=1e-5)
