"""Pipeline-parallel Mamba LM: sharded == unsharded, fwd and grads.

The reference has no pipeline parallelism (beyond-reference capability,
like TP/FSDP); these tests pin it: a GPipe schedule over a "pipe" mesh
axis — stage-sharded stacked layer params, ppermute activation hops,
lax.scan over ticks — matches the single-device ``MambaLM`` on the
8-device CPU mesh, forward and backward, alone and composed with data
parallelism on a 2-D ("data", "pipe") mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vivim_tpu.nn.lm import MambaLM, MambaLMConfig
from vivim_tpu.parallel.mesh import make_mesh
from vivim_tpu.parallel.pipeline import lm_pp_forward, stack_pipeline_params


def _lm_setup(seed=0, B=2, L=16, n_layer=8, **cfg_kw):
    cfg = MambaLMConfig(vocab_size=50, d_model=32, n_layer=n_layer,
                        **cfg_kw)
    model = MambaLM(cfg, scan_implementation="ref")
    rng = jax.random.PRNGKey(seed)
    tokens = jax.random.randint(rng, (B, L), 0, cfg.vocab_size)
    variables = model.init(jax.random.PRNGKey(seed + 1), tokens)
    return cfg, model, variables, tokens


def test_stack_pipeline_params_layout():
    cfg, model, variables, tokens = _lm_setup(n_layer=4)
    p = variables["params"]
    stacked = stack_pipeline_params(p, 4, 2)
    # stage s, local layer j holds layer s*lps + j
    np.testing.assert_array_equal(
        np.asarray(stacked["mixer"]["A_log"][1, 0]),
        np.asarray(p["mixer_2"]["A_log"]))
    np.testing.assert_array_equal(
        np.asarray(stacked["norm"]["scale"][0, 1]),
        np.asarray(p["norm_1"]["scale"]))
    with pytest.raises(ValueError, match="not divisible"):
        stack_pipeline_params(p, 4, 3)


def test_pp_lm_forward_matches():
    cfg, model, variables, tokens = _lm_setup(B=4)
    logits_ref = model.apply(variables, tokens)
    mesh = make_mesh(8, axis="pipe")
    logits_pp = lm_pp_forward(cfg, variables, tokens, mesh, n_micro=2,
                              implementation="ref")
    np.testing.assert_allclose(np.asarray(logits_pp),
                               np.asarray(logits_ref),
                               atol=1e-4, rtol=1e-4)


def test_pp_lm_forward_matches_rms_fp32_residual():
    """The pretrained-checkpoint config (rms_norm + residual_in_fp32)
    takes the fp32 residual stream through the island carry."""
    cfg, model, variables, tokens = _lm_setup(
        B=2, n_layer=8, rms_norm=True, residual_in_fp32=True)
    logits_ref = model.apply(variables, tokens)
    mesh = make_mesh(8, axis="pipe")
    logits_pp = lm_pp_forward(cfg, variables, tokens, mesh, n_micro=2,
                              implementation="ref")
    np.testing.assert_allclose(np.asarray(logits_pp),
                               np.asarray(logits_ref),
                               atol=1e-4, rtol=1e-4)


def test_pp_lm_grads_match():
    """PP is a training-path capability: grads of every param leaf through
    the pipelined forward (reverse schedule via the scan transpose) match
    the unsharded module."""
    cfg, model, variables, tokens = _lm_setup(B=4)
    mesh = make_mesh(8, axis="pipe")

    def loss_ref(params):
        return jnp.mean(model.apply({"params": params}, tokens) ** 2)

    def loss_pp(params):
        return jnp.mean(lm_pp_forward(cfg, {"params": params}, tokens,
                                      mesh, n_micro=2,
                                      implementation="ref") ** 2)

    g_ref = jax.grad(loss_ref)(variables["params"])
    g_pp = jax.grad(loss_pp)(variables["params"])
    flat_pp = {jax.tree_util.keystr(kp): v
               for kp, v in jax.tree_util.tree_leaves_with_path(g_pp)}
    for kp, ref in jax.tree_util.tree_leaves_with_path(g_ref):
        got = flat_pp[jax.tree_util.keystr(kp)]
        scale = max(float(jnp.max(jnp.abs(ref))), 1.0)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-4 * scale,
            rtol=2e-4, err_msg=f"grad mismatch at {jax.tree_util.keystr(kp)}")


def test_pp_composes_with_dp():
    """("data", "pipe") 2x4 mesh: batch-sharded tokens through a 4-stage
    pipeline still match the single-device forward."""
    cfg, model, variables, tokens = _lm_setup(B=4, n_layer=4)
    logits_ref = model.apply(variables, tokens)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                ("data", "pipe"))
    logits_pp = lm_pp_forward(cfg, variables, tokens, mesh, n_micro=2,
                              batch_axis="data", implementation="ref")
    np.testing.assert_allclose(np.asarray(logits_pp),
                               np.asarray(logits_ref),
                               atol=1e-4, rtol=1e-4)


def test_pp_validation_errors():
    cfg, model, variables, tokens = _lm_setup(B=3, n_layer=6)
    mesh = make_mesh(8, axis="pipe")
    with pytest.raises(ValueError, match="not divisible"):
        lm_pp_forward(cfg, variables, tokens, mesh)  # 6 layers, 8 stages
    mesh2 = Mesh(np.array(jax.devices()[:2]), ("pipe",))  # 6 % 2 == 0
    with pytest.raises(ValueError, match="batch 3"):
        lm_pp_forward(cfg, variables, tokens, mesh2, n_micro=2)


def test_eval_core_pp_scoring_matches():
    """The lm_eval adapter's --pp_stages path scores identically to the
    single-device forward, and refuses to combine with --tp_shards."""
    from vivim_tpu.cli.lm_eval_harness import MambaEvalCore

    class Tok:
        eos_token_id = 0

        def encode(self, s):
            return [ord(c) % 50 for c in s]

        def decode(self, ids):
            return "".join(chr(65 + (i % 26)) for i in ids)

    cfg, model, variables, _ = _lm_setup(n_layer=8)
    core1 = MambaEvalCore(model, variables, Tok())
    core8 = MambaEvalCore(model, variables, Tok(), pp_stages=8)
    ll1, greedy1 = core1.loglikelihood_pair("hello wor", "ld")
    ll8, greedy8 = core8.loglikelihood_pair("hello wor", "ld")
    assert abs(ll1 - ll8) < 1e-3 * max(abs(ll1), 1.0)
    assert greedy1 == greedy8
    with pytest.raises(ValueError, match="mutually exclusive"):
        MambaEvalCore(model, variables, Tok(), tp_shards=8, pp_stages=8)


def test_pp_more_microbatches_than_stages():
    """n_micro > k (the production regime — bubble shrinks as M grows):
    a 2-stage pipe draining 4 microbatches still matches unsharded."""
    cfg, model, variables, tokens = _lm_setup(B=8, n_layer=2)
    logits_ref = model.apply(variables, tokens)
    mesh = Mesh(np.array(jax.devices()[:2]), ("pipe",))
    logits_pp = lm_pp_forward(cfg, variables, tokens, mesh, n_micro=4,
                              implementation="ref")
    np.testing.assert_allclose(np.asarray(logits_pp),
                               np.asarray(logits_ref),
                               atol=1e-4, rtol=1e-4)
