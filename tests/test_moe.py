"""Switch/GShard MoE FFN: routing semantics, parity, and the MoE-Mamba LM.

No reference counterpart (the reference has no MoE); these tests pin the
beyond-reference capability against its own spec: Switch top-1 / GShard
top-2 token-choice routing with static capacity, dropped-token
passthrough, gate-weighted combine, and the load-balance aux loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vivim_tpu.nn.moe import (
    MoEMambaLM,
    MoEMambaLMConfig,
    SwitchFFN,
    moe_capacity,
    moe_dispatch,
    moe_ffn,
)


def _moe_params(rng, M=16, E=4, F=32):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "router_kernel": jax.random.normal(k1, (M, E)) * 0.5,
        "wi": jax.random.normal(k2, (E, M, F)) * 0.1,
        "wo": jax.random.normal(k3, (E, F, M)) * 0.1,
    }


def test_moe_capacity():
    assert moe_capacity(64, 4, 1.0) == 16
    assert moe_capacity(64, 4, 1.25) == 20
    assert moe_capacity(3, 8, 1.0) == 1  # never zero


def test_dispatch_top1_semantics():
    T, E, C = 12, 3, 2
    probs = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(0), (T, E)),
                           -1)
    dispatch, combine, aux = moe_dispatch(probs, C, top_k=1)
    d = np.asarray(dispatch)
    # every kept token occupies exactly one (expert, slot); over-capacity
    # tokens occupy none
    per_token = d.reshape(T, -1).sum(-1)
    assert set(np.round(per_token, 6)) <= {0.0, 1.0}
    # no slot double-booked
    assert np.max(d.sum(0)) <= 1.0 + 1e-6
    # kept tokens go to their argmax expert, in token order, first C only
    choice = np.asarray(jnp.argmax(probs, -1))
    for e in range(E):
        toks = np.where(choice == e)[0]
        kept = toks[:C]
        for slot, t in enumerate(kept):
            assert d[t, e, slot] == pytest.approx(1.0)
        for t in toks[C:]:
            assert d[t].sum() == 0.0
    # top-1 combine weight is the raw gate
    c = np.asarray(combine)
    p = np.asarray(probs)
    for t in range(T):
        e = choice[t]
        if d[t].sum() > 0:
            assert c[t, e].sum() == pytest.approx(p[t, e], rel=1e-5)
    assert float(aux) > 0.0


def test_dispatch_top2_normalizes_gates():
    T, E, C = 8, 4, 8  # capacity ample: nothing drops
    probs = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (T, E)),
                           -1)
    dispatch, combine, _ = moe_dispatch(probs, C, top_k=2)
    # each token lands on exactly two experts with gates summing to 1
    assert np.allclose(np.asarray(dispatch).reshape(T, -1).sum(-1), 2.0)
    assert np.allclose(np.asarray(combine).reshape(T, -1).sum(-1), 1.0,
                       atol=1e-5)


def test_moe_ffn_matches_dense_top1():
    """With ample capacity, top-1 MoE output == gate * FFN_argmax(x),
    computed densely per token."""
    M, E, F, T = 16, 4, 32, 10
    params = _moe_params(jax.random.PRNGKey(2), M, E, F)
    x = jax.random.normal(jax.random.PRNGKey(3), (T, M))
    y, aux = moe_ffn(params, x, capacity_factor=float(E))
    logits = x @ params["router_kernel"]
    probs = jax.nn.softmax(logits, -1)
    choice = jnp.argmax(probs, -1)
    want = []
    for t in range(T):
        e = int(choice[t])
        h = jax.nn.gelu(x[t] @ params["wi"][e])
        want.append(probs[t, e] * (h @ params["wo"][e]))
    np.testing.assert_allclose(np.asarray(y), np.asarray(jnp.stack(want)),
                               atol=1e-5, rtol=1e-5)


def test_moe_ffn_leading_dims_and_jit():
    params = _moe_params(jax.random.PRNGKey(4))
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 6, 16))
    y, aux = jax.jit(lambda p, x: moe_ffn(p, x))(params, x)
    assert y.shape == x.shape
    y2, _ = moe_ffn(params, x.reshape(12, 16))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2).reshape(2, 6, 16),
                               atol=1e-6)


def test_moe_ffn_grads_flow():
    """Router, expert, and aux-loss grads are all nonzero (dispatch is
    one-hot but the combine gate and aux loss keep the router
    differentiable — the Switch trick)."""
    params = _moe_params(jax.random.PRNGKey(6))
    x = jax.random.normal(jax.random.PRNGKey(7), (8, 16))

    def loss(p):
        y, aux = moe_ffn(p, x)
        return jnp.mean(y ** 2) + 1e-2 * aux

    g = jax.grad(loss)(params)
    for k, v in g.items():
        assert float(jnp.max(jnp.abs(v))) > 0.0, k


def test_switch_ffn_module():
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 5, 16))
    m = SwitchFFN(n_experts=4, d_ff=32)
    v = m.init(jax.random.PRNGKey(9), x)
    (y, aux), _ = m.apply(v, x), None
    assert y.shape == x.shape and float(aux) > 0.0


def test_moe_mamba_lm_forward_and_grads():
    cfg = MoEMambaLMConfig(vocab_size=40, d_model=16, n_layer=2,
                           n_experts=4, d_ff=32, moe_every=1)
    model = MoEMambaLM(cfg, scan_implementation="ref")
    toks = jax.random.randint(jax.random.PRNGKey(10), (2, 8), 0, 40)
    v = model.init(jax.random.PRNGKey(11), toks)
    logits, aux = model.apply(v, toks)
    assert logits.shape == (2, 8, cfg.padded_vocab)
    assert float(aux) > 0.0
    # both MoE blocks exist and contribute to the loss gradient
    assert "moe_0" in v["params"] and "moe_1" in v["params"]

    def loss(params):
        lg, aux = model.apply({"params": params}, toks)
        return jnp.mean(lg ** 2) + cfg.aux_loss_weight * aux

    g = jax.grad(loss)(v["params"])
    for blk in ("moe_0", "moe_1"):
        for k, leaf in g[blk].items():
            assert float(jnp.max(jnp.abs(leaf))) > 0.0, (blk, k)


def test_moe_every_zero_disables():
    cfg = MoEMambaLMConfig(vocab_size=40, d_model=16, n_layer=2,
                           moe_every=0)
    model = MoEMambaLM(cfg, scan_implementation="ref")
    toks = jax.random.randint(jax.random.PRNGKey(12), (1, 4), 0, 40)
    v = model.init(jax.random.PRNGKey(13), toks)
    assert not any(k.startswith("moe") for k in v["params"])
    _, aux = model.apply(v, toks)
    assert float(aux) == 0.0
