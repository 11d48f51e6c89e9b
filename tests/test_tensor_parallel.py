"""Tensor-parallel Mamba mixer / LM: sharded == unsharded, fwd and grads.

The reference has no TP implementation (only the vestigial
``tensor_parallel`` argument in mamba/mamba_ssm/utils/generation.py:103);
these tests pin the real capability: Megatron-style column/row-parallel
Mamba over a "model" mesh axis matches the single-device module bit-for-
tolerance on the 8-device CPU mesh, forward and backward, alone and
composed with data parallelism on a 2-D ("data", "model") mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vivim_tpu.nn.lm import MambaLM, MambaLMConfig
from vivim_tpu.nn.mamba import MambaV3
from vivim_tpu.parallel.mesh import make_hybrid_mesh, make_mesh
from vivim_tpu.parallel.tensor_parallel import lm_tp_forward, tp_mamba_mixer


def _mixer_setup(d_model=32, L=24, B=2, seed=0):
    model = MambaV3(d_model=d_model, bimamba_type="none",
                    scan_implementation="ref")
    rng = jax.random.PRNGKey(seed)
    x = jax.random.normal(rng, (B, L, d_model), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed + 1), x)
    return model, variables, x


def test_tp_mixer_matches_unsharded():
    model, variables, x = _mixer_setup()
    y_ref = model.apply(variables, x)
    mesh = make_mesh(8, axis="model")
    y_tp = tp_mamba_mixer(variables["params"], x, mesh,
                          implementation="ref")
    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)


def test_tp_mixer_requires_divisible_d_inner():
    model, variables, x = _mixer_setup(d_model=30)  # d_inner=60, 60 % 8 != 0
    mesh = make_mesh(8, axis="model")
    with pytest.raises(ValueError, match="not divisible"):
        tp_mamba_mixer(variables["params"], x, mesh, implementation="ref")


def _lm_setup(seed=0, B=2, L=16):
    cfg = MambaLMConfig(vocab_size=50, d_model=32, n_layer=2)
    model = MambaLM(cfg, scan_implementation="ref")
    rng = jax.random.PRNGKey(seed)
    tokens = jax.random.randint(rng, (B, L), 0, cfg.vocab_size)
    variables = model.init(jax.random.PRNGKey(seed + 1), tokens)
    return cfg, model, variables, tokens


def test_tp_lm_forward_matches():
    cfg, model, variables, tokens = _lm_setup()
    logits_ref = model.apply(variables, tokens)
    mesh = make_mesh(8, axis="model")
    logits_tp = lm_tp_forward(cfg, variables, tokens, mesh,
                              implementation="ref")
    np.testing.assert_allclose(np.asarray(logits_tp), np.asarray(logits_ref),
                               atol=1e-4, rtol=1e-4)


def test_tp_lm_grads_match():
    """TP is a training-path capability: grads of every param leaf through
    the TP forward match the unsharded module."""
    cfg, model, variables, tokens = _lm_setup()
    mesh = make_mesh(8, axis="model")

    def loss_ref(params):
        return jnp.sum(model.apply({"params": params}, tokens) ** 2)

    def loss_tp(params):
        return jnp.sum(lm_tp_forward(cfg, {"params": params}, tokens, mesh,
                                     implementation="ref") ** 2)

    g_ref = jax.grad(loss_ref)(variables["params"])
    g_tp = jax.grad(loss_tp)(variables["params"])
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_tp = {jax.tree_util.keystr(kp): v
               for kp, v in jax.tree_util.tree_leaves_with_path(g_tp)}
    for kp, ref in flat_ref:
        got = flat_tp[jax.tree_util.keystr(kp)]
        scale = max(float(jnp.max(jnp.abs(ref))), 1.0)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-4 * scale,
            rtol=2e-4, err_msg=f"grad mismatch at {jax.tree_util.keystr(kp)}")


def test_tp_generate_matches_unsharded():
    """TP decode (prefill + scan token loop inside the shard_map island,
    sharded conv/ssm cache) emits the same greedy tokens as single-device
    generate, and the same samples at temperature > 0 (replicated rng)."""
    import functools

    from vivim_tpu.nn import streaming
    from vivim_tpu.nn.lm import generate
    from vivim_tpu.parallel.tensor_parallel import tp_generate

    cfg, model, variables, tokens = _lm_setup(B=2, L=8)
    mesh = make_mesh(8, axis="model")
    ref_prefill = functools.partial(streaming.mamba_prefill,
                                    implementation="ref")
    for kwargs in ({"temperature": 0.0, "eos_token_id": 1},
                   {"temperature": 0.8, "top_k": 5}):
        want = generate(model, variables, tokens, 6,
                        rng=jax.random.PRNGKey(3),
                        mixer_prefill=ref_prefill, **kwargs)
        got = tp_generate(model, variables, tokens, 6, mesh,
                          rng=jax.random.PRNGKey(3),
                          implementation="ref", **kwargs)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_eval_core_tp_scoring_matches():
    """The lm_eval adapter's --tp_shards path scores identically to the
    single-device forward."""
    from vivim_tpu.cli.lm_eval_harness import MambaEvalCore

    class Tok:
        eos_token_id = 0

        def encode(self, s):
            return [ord(c) % 50 for c in s]

        def decode(self, ids):
            return "".join(chr(65 + (i % 26)) for i in ids)

    cfg, model, variables, _ = _lm_setup()
    core1 = MambaEvalCore(model, variables, Tok())
    core8 = MambaEvalCore(model, variables, Tok(), tp_shards=8)
    ll1, greedy1 = core1.loglikelihood_pair("hello wor", "ld")
    ll8, greedy8 = core8.loglikelihood_pair("hello wor", "ld")
    assert abs(ll1 - ll8) < 1e-3 * max(abs(ll1), 1.0)
    assert greedy1 == greedy8


def test_bench_generation_tp_smoke(capsys):
    """--tp_shards on the generation bench runs end-to-end and reports."""
    import json

    from vivim_tpu.cli.bench_generation import main

    main(["--vocab", "64", "--d_model", "32", "--n_layer", "1",
          "--promptlen", "4", "--genlen", "2", "--repeats", "1",
          "--topk", "1", "--tp_shards", "8"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["gen_len"] == 2 and out["tokens_per_sec"] > 0


def test_tp_hybrid_data_model_mesh():
    """DP x TP on one 2-D ("data", "model") mesh: batch-sharded tokens,
    channel-sharded mixer, output matches unsharded."""
    cfg, model, variables, tokens = _lm_setup(B=4)
    logits_ref = model.apply(variables, tokens)
    mesh = make_hybrid_mesh(2, 4)
    # reuse the hybrid-mesh factory; rename its axes ("data", "seq") ->
    # ("data", "model") to make the intent explicit
    mesh = jax.sharding.Mesh(mesh.devices, ("data", "model"))
    tokens_sharded = jax.device_put(
        tokens, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data", None)))
    logits_tp = lm_tp_forward(cfg, variables, tokens_sharded, mesh,
                              batch_axis="data", implementation="ref")
    np.testing.assert_allclose(np.asarray(logits_tp), np.asarray(logits_ref),
                               atol=1e-4, rtol=1e-4)


def test_tp_mixer_with_biases_matches_unsharded():
    """bias=True mixers (in_proj_bias column-split halves, out_proj_bias
    added once after the psum) match the unsharded module."""
    model = MambaV3(d_model=32, bimamba_type="none", bias=True,
                    scan_implementation="ref")
    rng = jax.random.PRNGKey(7)
    x = jax.random.normal(rng, (2, 24, 32), jnp.float32)
    variables = model.init(jax.random.PRNGKey(8), x)
    # nonzero biases so the test actually exercises them
    p = dict(variables["params"])
    for name in ("in_proj_bias", "out_proj_bias"):
        p[name] = 0.1 * jax.random.normal(
            jax.random.PRNGKey(hash(name) % 2**31), p[name].shape)
    y_ref = model.apply({"params": p}, x)
    mesh = make_mesh(8, axis="model")
    y_tp = tp_mamba_mixer(p, x, mesh, implementation="ref")
    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)


def test_tp_generate_with_biased_mixers():
    """The TP decode path (split param tree + prefill/step twins) carries
    in/out projection biases identically to single-device generate."""
    from vivim_tpu.nn.lm import generate
    from vivim_tpu.parallel.tensor_parallel import tp_generate

    cfg, model, variables, tokens = _lm_setup(B=1, L=6)
    p = jax.tree_util.tree_map(lambda v: v, variables["params"])
    for i in range(cfg.n_layer):
        mp = dict(p[f"mixer_{i}"])
        d_inner = mp["A_log"].shape[0]
        d_model = mp["out_proj_kernel"].shape[0]
        key = jax.random.PRNGKey(100 + i)
        k1, k2 = jax.random.split(key)
        mp["in_proj_bias"] = 0.1 * jax.random.normal(k1, (2 * d_inner,))
        mp["out_proj_bias"] = 0.1 * jax.random.normal(k2, (d_model,))
        p[f"mixer_{i}"] = mp
    mesh = make_mesh(8, axis="model")
    want = generate(model, {"params": p}, tokens, 5,
                    rng=jax.random.PRNGKey(3), temperature=0.0)
    got = tp_generate(model, {"params": p}, tokens, 5, mesh,
                      rng=jax.random.PRNGKey(3), temperature=0.0,
                      implementation="ref")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_tp_unknown_mixer_param_raises():
    from vivim_tpu.parallel.tensor_parallel import _split_tp_param_tree

    cfg, model, variables, tokens = _lm_setup(B=1, L=6)
    p = {k: (dict(v) if hasattr(v, "keys") else v)
         for k, v in variables["params"].items()}
    p["mixer_0"]["mystery_kernel"] = jnp.zeros((4, 4))
    with pytest.raises(ValueError, match="mystery_kernel"):
        _split_tp_param_tree(p, "model")
