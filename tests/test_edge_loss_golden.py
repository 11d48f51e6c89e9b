"""Cross-framework golden tests for the edge-loss suite.

Transliterates the reference's ACTUAL torch math —
/root/reference/modeling/utils.py:89-170 (structure_loss, bce2d,
edge_attention, JointEdgeSegLoss.forward) and
modeling/InverseForm.py:20-36 + utils.py:173-216 (InverseNet,
InverseTransform2D) — into torch twins with random weights, and asserts the
JAX implementations match numerically (VERDICT r2 #4: the last loss terms
without cross-framework ground truth).

Quirk reproduced deliberately: utils.py:91 passes the string 'none' to the
deprecated ``reduce`` arg of binary_cross_entropy_with_logits, which
torch's legacy shim maps to reduction='mean' — the BCE term of
structure_loss is an UNWEIGHTED scalar mean (verified on torch 2.13).
``structure_loss(..., legacy_wbce=True)`` matches it; the production
default keeps the intended weighted form.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vivim_tpu.train import edge_loss as E  # noqa: E402
from vivim_tpu.train import losses as L  # noqa: E402


def _nchw(x):  # (N, H, W, C) numpy -> torch NCHW
    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


# --- torch twins (literal transliteration of the reference) ---------------


def torch_structure_loss(pred, mask, iou=True):
    """modeling/utils.py:89-102, verbatim semantics (incl. the reduce
    quirk, called exactly as the reference does)."""
    import warnings

    weit = 1 + 5 * torch.abs(
        F.avg_pool2d(mask, kernel_size=31, stride=1, padding=15) - mask)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        wbce = F.binary_cross_entropy_with_logits(pred, mask, reduce="none")
    wbce = (weit * wbce).sum(dim=(2, 3)) / weit.sum(dim=(2, 3))
    pred = torch.sigmoid(pred)
    inter = ((pred * mask) * weit).sum(dim=(2, 3))
    union = ((pred + mask) * weit).sum(dim=(2, 3))
    wiou = 1 - (inter + 1) / (union - inter + 1)
    return (wbce + wiou).mean()


def torch_bce2d(input, target):
    """JointEdgeSegLoss.bce2d (utils.py:121-152), minus the .cuda() calls."""
    log_p = input.transpose(1, 2).transpose(2, 3).contiguous().view(1, -1)
    target_t = target.transpose(1, 2).transpose(2, 3).contiguous().view(1, -1)
    pos_index = target_t == 1
    neg_index = target_t == 0
    ignore_index = target_t > 1
    weight = torch.zeros_like(log_p)
    pos_num = pos_index.sum().item()
    neg_num = neg_index.sum().item()
    sum_num = pos_num + neg_num
    weight[pos_index] = neg_num * 1.0 / sum_num
    weight[neg_index] = pos_num * 1.0 / sum_num
    weight[ignore_index] = 0
    return F.binary_cross_entropy_with_logits(
        log_p, target_t.clamp(0, 1), weight, reduction="mean")


def torch_edge_attention(input, target, edge):
    """JointEdgeSegLoss.edge_attention (utils.py:155-162)."""
    filler = torch.ones_like(target)
    gated = torch.where((edge.max(1)[0] > 0.8).unsqueeze(1), target, filler)
    return torch_structure_loss(input, gated)


class TorchInverseNet(torch.nn.Module):
    """modeling/InverseForm.py:20-36 with a parameterizable tile dim."""

    def __init__(self, tiled_dim=224, hidden=1000):
        super().__init__()
        self.tiled_dim = tiled_dim
        self.fc = torch.nn.Sequential(
            torch.nn.Linear(tiled_dim * tiled_dim * 2, hidden),
            torch.nn.ReLU(True),
            torch.nn.Linear(hidden, 32),
            torch.nn.ReLU(True),
            torch.nn.Linear(32, 4),
        )

    def forward(self, x1, x2):
        n = self.tiled_dim * self.tiled_dim
        x = torch.cat((x1.reshape(-1, n), x2.reshape(-1, n)), dim=1)
        return x1, x2, self.fc(x)


def torch_inverse_transform_2d(net, inputs, targets, tile_factor=3,
                               resized_dim=672):
    """InverseTransform2D.forward (utils.py:185-216), verbatim tiling."""
    tiled_dim = resized_dim // tile_factor
    inputs = F.log_softmax(inputs, dim=1)
    inputs = F.interpolate(inputs, size=(resized_dim, 2 * resized_dim),
                           mode="bilinear")
    targets = F.interpolate(targets, size=(resized_dim, 2 * resized_dim),
                            mode="bilinear")
    tiled_inputs = inputs[:, :, :tiled_dim, :tiled_dim]
    tiled_targets = targets[:, :, :tiled_dim, :tiled_dim]
    for i in range(tile_factor):
        for j in range(2 * tile_factor):
            if i + j != 0:
                tiled_targets = torch.cat(
                    (tiled_targets,
                     targets[:, :, tiled_dim * i:tiled_dim * (i + 1),
                             tiled_dim * j:tiled_dim * (j + 1)]), dim=0)
    for i in range(tile_factor):
        for j in range(2 * tile_factor):
            if i + j != 0:
                tiled_inputs = torch.cat(
                    (tiled_inputs,
                     inputs[:, :, tiled_dim * i:tiled_dim * (i + 1),
                            tiled_dim * j:tiled_dim * (j + 1)]), dim=0)
    _, _, coeffs = net(tiled_inputs, tiled_targets)
    return (((coeffs * coeffs).sum(dim=1)) ** 0.5).mean()


# --- parity tests ----------------------------------------------------------


def _edge_pair(seed=0, n=2, h=48, w=48):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((n, h, w, 1)).astype(np.float32)
    targets = (rng.random((n, h, w, 1)) > 0.6).astype(np.float32)
    # sprinkle ignore pixels (>1) the way cityscapes-style edges carry them
    ignore = rng.random((n, h, w, 1)) > 0.95
    targets = np.where(ignore, 2.0, targets).astype(np.float32)
    return logits, targets


def test_edge_bce_matches_torch_bce2d():
    logits, targets = _edge_pair()
    want = float(torch_bce2d(_nchw(logits), _nchw(targets)))
    got = float(E.edge_bce(jnp.asarray(logits), jnp.asarray(targets)))
    assert got == pytest.approx(want, rel=1e-5, abs=1e-6)


def test_structure_loss_legacy_matches_torch():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((2, 40, 40, 1)).astype(np.float32)
    masks = (rng.random((2, 40, 40, 1)) > 0.5).astype(np.float32)
    want = float(torch_structure_loss(_nchw(logits), _nchw(masks)))
    got = float(L.structure_loss(jnp.asarray(logits), jnp.asarray(masks),
                                 legacy_wbce=True))
    assert got == pytest.approx(want, rel=1e-5, abs=1e-6)


def test_edge_attention_matches_torch():
    rng = np.random.default_rng(2)
    n, h, w = 2, 40, 40
    seg_logits = rng.standard_normal((n, h, w, 1)).astype(np.float32)
    seg_masks = (rng.random((n, h, w, 1)) > 0.5).astype(np.float32)
    edge_logits = (2.0 * rng.standard_normal((n, h, w, 1))).astype(np.float32)
    want = float(torch_edge_attention(
        _nchw(seg_logits), _nchw(seg_masks), _nchw(edge_logits)))
    got = float(E.edge_attention(
        jnp.asarray(seg_logits), jnp.asarray(seg_masks),
        jnp.asarray(edge_logits),
        seg_loss=lambda p, m: L.structure_loss(p, m, legacy_wbce=True)))
    assert got == pytest.approx(want, rel=1e-5, abs=1e-6)


def test_inverse_net_forward_matches_torch_real_dims():
    """InverseNet forward at the real 224x224 tile size with random
    weights converted through inverse_net_params_from_torch (1e-4,
    VERDICT r2 #4)."""
    torch.manual_seed(0)
    net_t = TorchInverseNet(tiled_dim=224, hidden=1000)
    params = E.inverse_net_params_from_torch(
        {k: v for k, v in net_t.state_dict().items()})
    rng = np.random.default_rng(3)
    x1 = rng.standard_normal((2, 224, 224, 1)).astype(np.float32)
    x2 = rng.standard_normal((2, 224, 224, 1)).astype(np.float32)
    _, _, want = net_t(_nchw(x1), _nchw(x2))
    got = E.InverseNet().apply({"params": params}, jnp.asarray(x1),
                               jnp.asarray(x2))
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               rtol=1e-4, atol=1e-4)


def test_inverse_form_distance_matches_torch():
    """Full InverseTransform2D (log_softmax -> resize -> 3x6 tiling ->
    frozen net -> mean L2) vs the torch twin at 1e-4.  Uses the real
    672/224 dims and random net weights."""
    torch.manual_seed(1)
    net_t = TorchInverseNet(tiled_dim=224, hidden=1000)
    params = E.inverse_net_params_from_torch(
        {k: v for k, v in net_t.state_dict().items()})
    rng = np.random.default_rng(4)
    n, h, w = 1, 64, 64
    edge_logits = rng.standard_normal((n, h, w, 1)).astype(np.float32)
    edge_targets = (rng.random((n, h, w, 1)) > 0.6).astype(np.float32)
    want = float(torch_inverse_transform_2d(
        net_t, _nchw(edge_logits), _nchw(edge_targets)))
    inverse_form = E.make_inverse_form(params)
    got = float(inverse_form(jnp.asarray(edge_logits),
                             jnp.asarray(edge_targets)))
    assert got == pytest.approx(want, rel=1e-4, abs=1e-4)


def test_joint_edge_seg_loss_matches_torch():
    """JointEdgeSegLoss.forward (utils.py:164-170) end to end: 1.0*seg +
    0.3*bce2d + 0.1*edge_attention + 0.3*InverseForm."""
    torch.manual_seed(2)
    net_t = TorchInverseNet(tiled_dim=224, hidden=1000)
    params = E.inverse_net_params_from_torch(
        {k: v for k, v in net_t.state_dict().items()})
    rng = np.random.default_rng(5)
    n, h, w = 1, 48, 48
    seg_logits = rng.standard_normal((n, h, w, 1)).astype(np.float32)
    seg_masks = (rng.random((n, h, w, 1)) > 0.5).astype(np.float32)
    edge_logits = (2 * rng.standard_normal((n, h, w, 1))).astype(np.float32)
    edge_masks = (rng.random((n, h, w, 1)) > 0.6).astype(np.float32)

    want = float(
        1.0 * torch_structure_loss(_nchw(seg_logits), _nchw(seg_masks))
        + 0.3 * torch_bce2d(_nchw(edge_logits), _nchw(edge_masks))
        + 0.1 * torch_edge_attention(_nchw(seg_logits), _nchw(seg_masks),
                                     _nchw(edge_logits))
        + 0.3 * torch_inverse_transform_2d(net_t, _nchw(edge_logits),
                                           _nchw(edge_masks)))
    loss_fn = E.make_joint_edge_seg_loss(
        inverse_params=params,
        seg_loss=lambda p, m: L.structure_loss(p, m, legacy_wbce=True))
    got = float(loss_fn(jnp.asarray(seg_logits), jnp.asarray(seg_masks),
                        jnp.asarray(edge_logits), jnp.asarray(edge_masks)))
    assert got == pytest.approx(want, rel=1e-4, abs=1e-4)
