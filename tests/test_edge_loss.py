"""Edge loss tests: balanced BCE, edge attention, joint composition,
InverseForm net."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vivim_tpu.train import edge_loss as E


def test_edge_bce_class_balancing():
    # all-positive targets get weight neg/total = 0 -> loss 0
    logits = jnp.zeros((1, 8, 8, 1))
    ones = jnp.ones((1, 8, 8, 1))
    assert float(E.edge_bce(logits, ones)) == pytest.approx(0.0)
    # balanced targets: correct predictions give lower loss than wrong ones
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.random((1, 8, 8, 1)) > 0.5, jnp.float32)
    good = 10.0 * (2 * t - 1)
    assert float(E.edge_bce(good, t)) < float(E.edge_bce(-good, t))
    # labels > 1 are ignored (zero weight)
    t_ign = t.at[0, 0, 0, 0].set(2.0)
    v = float(E.edge_bce(good, t_ign))
    assert np.isfinite(v)


def test_edge_attention_gating():
    rng = np.random.default_rng(1)
    seg = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    masks = jnp.asarray(rng.random((1, 32, 32, 3)) > 0.5, jnp.float32)
    edge_hi = jnp.ones((1, 32, 32, 1))   # all above 0.8 -> targets kept
    edge_lo = jnp.zeros((1, 32, 32, 1))  # all below -> targets become ones
    v_hi = float(E.edge_attention(seg, masks, edge_hi))
    v_lo = float(E.edge_attention(seg, masks, edge_lo))
    assert np.isfinite(v_hi) and np.isfinite(v_lo)
    assert v_hi != v_lo


def test_joint_loss_composition_and_grads():
    rng = np.random.default_rng(2)
    seg = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    masks = jnp.asarray(rng.random((1, 32, 32, 3)) > 0.5, jnp.float32)
    edge_l = jnp.asarray(rng.standard_normal((1, 32, 32, 1)), jnp.float32)
    edge_m = jnp.asarray(rng.random((1, 32, 32, 1)) > 0.7, jnp.float32)
    loss_fn = E.make_joint_edge_seg_loss()  # no InverseForm weights
    v = float(loss_fn(seg, masks, edge_l, edge_m))
    assert np.isfinite(v) and v > 0
    g = jax.grad(lambda s: loss_fn(s, masks, edge_l, edge_m))(seg)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_inverse_net_and_converter():
    net = E.InverseNet()
    x = jnp.zeros((2, 224, 224, 1))
    params = net.init(jax.random.PRNGKey(0), x, x)["params"]
    out = net.apply({"params": params}, x, x)
    assert out.shape == (2, 4)
    # torch-style dict converts and produces identical structure
    rng = np.random.default_rng(3)
    sd = {}
    dims = [(1000, 224 * 224 * 2), (32, 1000), (4, 32)]
    for i, (o, iN) in enumerate(dims):
        sd[f"fc.{2*i}.weight"] = rng.standard_normal((o, iN)).astype(np.float32)
        sd[f"fc.{2*i}.bias"] = rng.standard_normal(o).astype(np.float32)
    conv = E.inverse_net_params_from_torch(sd)
    out2 = net.apply({"params": conv}, x, x)
    assert out2.shape == (2, 4)
    # inverse-form term runs end to end with converted params
    inv = E.make_inverse_form(conv, tile_factor=3, resized_dim=672)
    e = jnp.zeros((1, 64, 128, 1))
    val = float(inv(e, e))
    assert np.isfinite(val)


def test_multiclass_edge_criterion_center_frame():
    """The criterion depends ONLY on the center frame and composes
    0.3*edge_bce + 0.1*edge_attention (no InverseForm weights)."""
    rng = np.random.default_rng(5)
    B, T, H, W, C = 2, 5, 16, 16, 3
    seg = jnp.asarray(rng.standard_normal((B, T, H, W, C)), jnp.float32)
    masks = jax.nn.one_hot(
        jnp.asarray(rng.integers(0, C, (B, T, H, W))), C)
    edge_l = jnp.asarray(rng.standard_normal((B, T, H, W, 1)), jnp.float32)
    edge_m = jnp.asarray(rng.random((B, T, H, W, 1)) > 0.7, jnp.float32)
    crit = E.make_multiclass_edge_criterion()
    v = float(crit(seg, masks, edge_l, edge_m))
    assert np.isfinite(v) and v > 0

    # composition check against the parts on the center frame
    want = 0.3 * float(E.edge_bce(edge_l[:, T // 2], edge_m[:, T // 2]))
    want += 0.1 * float(E.edge_attention(
        seg[:, T // 2], masks[:, T // 2], edge_l[:, T // 2],
        seg_loss=E._structure_on_onehot))
    assert v == pytest.approx(want, rel=1e-6)

    # perturbing a NON-center frame must not change the loss
    seg2 = seg.at[:, 0].add(10.0)
    edge2 = edge_l.at[:, -1].add(10.0)
    assert float(crit(seg2, masks, edge2, edge_m)) == pytest.approx(v,
                                                                    rel=1e-6)
    # gradients flow to both branches
    g = jax.grad(lambda e: crit(seg, masks, e, edge_m))(edge_l)
    assert float(jnp.abs(g[:, T // 2]).sum()) > 0
    assert float(jnp.abs(g[:, 0]).sum()) == 0.0
