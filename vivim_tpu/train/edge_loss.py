"""Edge-aware joint loss: balanced edge BCE, edge attention, InverseForm.

Semantics from /root/reference/modeling/utils.py:105-216 (JointEdgeSegLoss)
and modeling/InverseForm.py:20-36 (InverseNet):

- ``edge_bce``: class-balanced binary cross entropy over the edge map —
  positive pixels weighted by neg/total, negatives by pos/total, labels > 1
  ignored (bce2d, utils.py:121-152).
- ``edge_attention``: the segmentation structure loss evaluated on a target
  that keeps mask values only where the predicted edge confidence exceeds
  0.8 (filled with ones elsewhere) (utils.py:155-162).
- ``joint_edge_seg_loss`` = 1.0*structure_loss + 0.3*edge_bce +
  0.1*edge_attention + 0.3*inverse_form (utils.py:164-170).
- ``InverseNet``: a frozen 4-DoF homography-coefficient regressor applied on
  224x224 tiles of the (log-softmax) edge prediction vs target; the loss is
  the mean L2 norm of the predicted coefficients (utils.py:173-216).  The
  reference loads pretrained weights from
  ``pretrained_models/distance_measures_regressor.pth``; pass them through
  ``inverse_net_params_from_torch``.  When no pretrained regressor is given
  the InverseForm term is dropped (weight 0) with a warning — matching the
  reference's optional edge mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vivim_tpu.train.losses import _weighted_structure, structure_loss

_EPS = 1e-8


def _bce_with_logits(logits, targets):
    return (jnp.maximum(logits, 0.0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def edge_bce(logits, targets):
    """Class-balanced edge BCE.  logits/targets: (N, H, W, 1)."""
    logits = logits.astype(jnp.float32).reshape(-1)
    targets = targets.astype(jnp.float32).reshape(-1)
    pos = targets == 1
    neg = targets == 0
    pos_num = jnp.sum(pos)
    neg_num = jnp.sum(neg)
    total = jnp.maximum(pos_num + neg_num, 1)
    weight = jnp.where(pos, neg_num / total,
                       jnp.where(neg, pos_num / total, 0.0))
    losses = _bce_with_logits(logits, jnp.clip(targets, 0, 1))
    return jnp.mean(weight * losses)


def edge_attention(seg_logits, seg_masks, edge_logits, seg_loss=structure_loss):
    """Structure loss on edge-gated targets (utils.py:155-162).

    seg_logits/seg_masks: (N, H, W, C); edge_logits: (N, H, W, 1).
    """
    gate = (edge_logits.max(axis=-1, keepdims=True) > 0.8)
    gated = jnp.where(gate, seg_masks, jnp.ones_like(seg_masks))
    return seg_loss(seg_logits, gated)


class InverseNet(nn.Module):
    """4-DoF coefficient regressor on 224x224 edge-map tile pairs."""

    @nn.compact
    def __call__(self, x1, x2):
        x = jnp.concatenate([
            x1.reshape(x1.shape[0], -1), x2.reshape(x2.shape[0], -1)], axis=1)
        x = nn.Dense(1000, name="fc0")(x)
        x = nn.relu(x)
        x = nn.Dense(32, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(4, name="fc2")(x)


def inverse_net_params_from_torch(state_dict):
    """torch ``fc.{0,2,4}.{weight,bias}`` -> flax params."""
    def _np(t):
        try:
            return t.detach().cpu().numpy()
        except AttributeError:
            return np.asarray(t)

    return {
        f"fc{i}": {"kernel": _np(state_dict[f"fc.{2*i}.weight"]).T,
                   "bias": _np(state_dict[f"fc.{2*i}.bias"])}
        for i in range(3)
    }


def make_inverse_form(params, tile_factor=3, resized_dim=672):
    """InverseTransform2D (utils.py:173-216): resize the (log-softmax) edge
    prediction and target to (672, 1344), cut into 224x224 tiles, regress
    4-DoF coefficients per tile with the frozen net, return the mean L2
    norm.  Returns a jittable fn(edge_logits, edge_targets) -> scalar."""
    net = InverseNet()
    tiled = resized_dim // tile_factor

    def inverse_form(edge_logits, edge_targets):
        # (N, H, W, 1) -> (N, 672, 1344, 1)
        x = jax.nn.log_softmax(edge_logits.astype(jnp.float32), axis=-1)
        size = (x.shape[0], resized_dim, 2 * resized_dim, x.shape[-1])
        x = jax.image.resize(x, size, "bilinear")
        t = jax.image.resize(edge_targets.astype(jnp.float32), size,
                             "bilinear")
        tiles_x, tiles_t = [], []
        for i in range(tile_factor):
            for j in range(2 * tile_factor):
                tiles_x.append(x[:, i * tiled:(i + 1) * tiled,
                                 j * tiled:(j + 1) * tiled])
                tiles_t.append(t[:, i * tiled:(i + 1) * tiled,
                                 j * tiled:(j + 1) * tiled])
        xt = jnp.concatenate(tiles_x, axis=0)
        tt = jnp.concatenate(tiles_t, axis=0)
        # net params are closure constants (frozen, utils.py:180-182);
        # gradients still flow through to the edge prediction
        coeffs = net.apply({"params": params}, xt, tt)
        return jnp.mean(jnp.sqrt(jnp.sum(coeffs * coeffs, axis=1)))

    return inverse_form


def _structure_on_onehot(logits, onehot_masks, eps=1e-8):
    """Per-class weighted structure loss on already-one-hot (possibly
    edge-gated) float masks — multiclass_structure_loss without the int
    one-hot step."""
    C = logits.shape[-1]
    return sum(
        _weighted_structure(logits[..., c:c + 1], onehot_masks[..., c:c + 1],
                            eps)
        for c in range(C)) / C


def make_multiclass_edge_criterion(inverse_params=None, edge_weight=0.3,
                                   att_weight=0.1, inv_weight=0.3):
    """Center-frame edge terms for the multiclass ``-with_edge`` CLIs.

    The reference's multiclass edge path is broken upstream: its
    training_step ignores the edge output entirely
    (multiclass_training_folds.py:543-573 never unpacks the tuple), while
    its validation criterion defines the intended semantics —
    JointEdgeSegLoss applied to CENTER frames
    (multiclass_training_folds.py:749-762, ``pred[nFrames//2::nFrames]``).
    This implements that intent: the main seg loss (recall_focused over all
    frames — the production training loss) stays as-is, and the edge branch
    adds the joint loss's edge terms on the center frame:
    ``0.3*edge_bce + 0.1*edge_attention + 0.3*inverse_form`` (the joint
    loss's 1.0*seg term is NOT repeated — it would double-count the main
    loss).

    Returns fn(seg_logits (B,T,H,W,C), seg_masks one-hot, edge_logits
    (B,T,H,W,1), edge_masks) -> scalar.
    """
    inverse_form = (make_inverse_form(inverse_params)
                    if inverse_params is not None else None)

    def criterion(seg_logits, seg_masks, edge_logits, edge_masks):
        T = seg_logits.shape[1]
        seg_l, seg_m = seg_logits[:, T // 2], seg_masks[:, T // 2]
        edge_l, edge_m = edge_logits[:, T // 2], edge_masks[:, T // 2]
        total = edge_weight * edge_bce(edge_l, edge_m)
        total = total + att_weight * edge_attention(
            seg_l, seg_m, edge_l, seg_loss=_structure_on_onehot)
        if inverse_form is not None:
            total = total + inv_weight * inverse_form(edge_l, edge_m)
        return total

    return criterion


def make_joint_edge_seg_loss(inverse_params=None, seg_weight=1.0,
                             edge_weight=0.3, att_weight=0.1, inv_weight=0.3,
                             seg_loss=structure_loss):
    """JointEdgeSegLoss factory (utils.py:105-170).

    Returns fn(seg_logits, seg_masks, edge_logits, edge_masks) -> scalar,
    all channels-last (N, H, W, C) / (N, H, W, 1).  ``seg_loss`` is the
    structure loss used for both the seg term and edge_attention — pass
    ``lambda p, m: structure_loss(p, m, legacy_wbce=True)`` for exact
    reference-torch behavior (see losses.structure_loss docstring).
    """
    inverse_form = None
    if inverse_params is not None:
        inverse_form = make_inverse_form(inverse_params)
    else:
        print("[edge_loss] no InverseForm regressor weights — the 0.3*"
              "InverseForm term is disabled")

    def loss_fn(seg_logits, seg_masks, edge_logits, edge_masks):
        total = seg_weight * seg_loss(seg_logits, seg_masks)
        total = total + edge_weight * edge_bce(edge_logits, edge_masks)
        total = total + att_weight * edge_attention(
            seg_logits, seg_masks, edge_logits, seg_loss=seg_loss)
        if inverse_form is not None:
            total = total + inv_weight * inverse_form(edge_logits, edge_masks)
        return total

    return loss_fn
