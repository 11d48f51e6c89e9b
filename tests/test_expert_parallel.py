"""Expert-parallel MoE: sharded == unsharded, fwd and grads, on the
8-device CPU mesh (beyond-reference: the reference has no MoE/EP)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vivim_tpu.nn.moe import MoEMambaLM, MoEMambaLMConfig, moe_ffn
from vivim_tpu.parallel.expert import ep_moe_ffn, lm_ep_forward
from vivim_tpu.parallel.mesh import make_mesh


def _moe_params(rng, M=16, E=8, F=32):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "router_kernel": jax.random.normal(k1, (M, E)) * 0.5,
        "wi": jax.random.normal(k2, (E, M, F)) * 0.1,
        "wo": jax.random.normal(k3, (E, F, M)) * 0.1,
    }


def test_ep_moe_ffn_matches_unsharded():
    params = _moe_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 6, 16))
    y_ref, aux_ref = moe_ffn(params, x)
    mesh = make_mesh(8, axis="expert")
    y_ep, aux_ep = ep_moe_ffn(params, x, mesh)
    np.testing.assert_allclose(np.asarray(y_ep), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(aux_ep), float(aux_ref), rtol=1e-6)


def test_ep_moe_ffn_grads_match():
    params = _moe_params(jax.random.PRNGKey(2))
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 16))
    mesh = make_mesh(8, axis="expert")

    def loss(fn):
        def inner(p):
            y, aux = fn(p)
            return jnp.mean(y ** 2) + 1e-2 * aux
        return inner

    g_ref = jax.grad(loss(lambda p: moe_ffn(p, x)))(params)
    g_ep = jax.grad(loss(lambda p: ep_moe_ffn(p, x, mesh)))(params)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(g_ep[k]), np.asarray(g_ref[k]), atol=1e-5,
            rtol=1e-5, err_msg=f"grad mismatch at {k}")


def test_ep_requires_divisible_experts():
    params = _moe_params(jax.random.PRNGKey(4), E=6)
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 16))
    mesh = make_mesh(8, axis="expert")
    with pytest.raises(ValueError, match="not divisible"):
        ep_moe_ffn(params, x, mesh)


def test_ep_lm_forward_matches():
    cfg = MoEMambaLMConfig(vocab_size=40, d_model=16, n_layer=2,
                           n_experts=8, d_ff=32, moe_every=1)
    model = MoEMambaLM(cfg, scan_implementation="ref")
    toks = jax.random.randint(jax.random.PRNGKey(6), (2, 8), 0, 40)
    v = model.init(jax.random.PRNGKey(7), toks)
    logits_ref, aux_ref = model.apply(v, toks)
    mesh = make_mesh(8, axis="expert")
    logits_ep, aux_ep = lm_ep_forward(cfg, v, toks, mesh,
                                      implementation="ref")
    np.testing.assert_allclose(np.asarray(logits_ep),
                               np.asarray(logits_ref),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(float(aux_ep), float(aux_ref), rtol=1e-5)


def test_ep_composes_with_dp():
    """("data", "expert") 2x4 mesh: batch-sharded tokens, expert-sharded
    FFNs, same outputs."""
    params = _moe_params(jax.random.PRNGKey(8), E=4)
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 6, 16))
    y_ref, _ = moe_ffn(params, x)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                ("data", "expert"))
    from jax.sharding import NamedSharding, PartitionSpec as P
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    y_ep, _ = ep_moe_ffn(params, xs, mesh)
    np.testing.assert_allclose(np.asarray(y_ep), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)
