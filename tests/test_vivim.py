"""Vivim model assembly tests: shapes, grads, stochastic paths, edge head.

Everything runs under jit — on the 1-vCPU test machine, eager per-op
dispatch compiles each primitive separately and is pathologically slow.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vivim_tpu.nn.vivim import Vivim, VivimConfig


@pytest.fixture(scope="module")
def tiny_model():
    cfg = VivimConfig.tiny_test()
    model = Vivim(cfg)
    x = jnp.zeros((1, 5, 32, 32, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    return cfg, model, variables


def test_forward_shape(tiny_model):
    cfg, model, variables = tiny_model
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 32, 32, 3))
    logits = jax.jit(model.apply)(variables, x)
    assert logits.shape == (1, 5, 32, 32, cfg.out_chans)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_train_step_grads(tiny_model):
    cfg, model, variables = tiny_model
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 32, 32, 3))

    @jax.jit
    def loss_and_grad(params):
        def loss_fn(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                x, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(3)},
                mutable=["batch_stats"])
            return jnp.mean(out**2)

        return jax.value_and_grad(loss_fn)(params)

    loss, grads = loss_and_grad(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    # nearly every parameter receives gradient signal
    nonzero = sum(float(jnp.sum(jnp.abs(g))) > 0 for g in leaves)
    assert nonzero / len(leaves) > 0.9


def test_edge_head_and_binary():
    cfg = VivimConfig.tiny_test(with_edge=True, out_chans=1)
    model = Vivim(cfg)
    x = jnp.zeros((1, 3, 32, 32, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    logits, edge = jax.jit(model.apply)(variables, x)
    assert logits.shape == (1, 3, 32, 32, 1)
    assert edge.shape == (1, 3, 32, 32, 1)


def test_decode_fuse_commutes_with_upsampling():
    """The eval fast path's algebraic identity: conv1x1(concat(up(t_i)))
    == sum_i up(t_i @ W_i) for bilinear upsampling."""
    from vivim_tpu.nn.segformer import resize_bilinear

    rng = np.random.default_rng(0)
    BT, hid, H0, W0 = 2, 8, 16, 16
    scales = [(16, 16), (8, 8), (4, 4), (2, 2)]
    ts = [jnp.asarray(rng.standard_normal((BT, h, w, hid)), jnp.float32)
          for h, w in scales]
    Wf = jnp.asarray(rng.standard_normal((4 * hid, hid)) * 0.2, jnp.float32)

    concat = jnp.concatenate(
        [resize_bilinear(t, (H0, W0)) for t in ts][::-1], axis=-1)
    want = jnp.einsum("bhwc,cd->bhwd", concat, Wf)

    got = None
    for i, t in enumerate(ts):
        j = len(ts) - 1 - i
        w = Wf[j * hid : (j + 1) * hid]
        r = resize_bilinear(
            jnp.einsum("bhwc,cd->bhwd", t, w), (H0, W0))
        got = r if got is None else got + r
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
