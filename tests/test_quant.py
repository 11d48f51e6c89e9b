"""int8 weight-only decode (nn/quant.py): numerics + end-to-end generate.

Beyond-reference capability: the reference decode benchmark's bandwidth
lever is fp16 (mamba/benchmarks/benchmark_generation_mamba_simple.py:52);
this path halves the weight traffic again with per-channel int8 weights
and dynamic int8 activations on the MXU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vivim_tpu.nn import quant, streaming
from vivim_tpu.nn.lm import MambaLM, MambaLMConfig, generate
from vivim_tpu.nn.mamba import MambaV3


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


def test_quantize_int8_round_trip():
    w = jax.random.normal(jax.random.PRNGKey(0), (48, 96))
    qt = quant.quantize_int8(w, axis=0)
    assert qt["q"].dtype == jnp.int8 and qt["q"].shape == w.shape
    assert qt["s"].shape == (48,)
    deq = qt["q"].astype(jnp.float32) * qt["s"][:, None]
    # int8 grid: per-channel max error = scale/2 = amax/254
    assert _rel(deq, w) < 1e-2
    assert quant.is_qtensor(qt) and not quant.is_qtensor(w)


def test_matmul_t_plain_and_quantized():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (5, 64))
    w = jax.random.normal(k2, (32, 64))
    exact = x @ w.T
    np.testing.assert_allclose(np.asarray(quant.matmul_t(x, w)),
                               np.asarray(exact), rtol=1e-6)
    approx = quant.matmul_t(x, quant.quantize_int8(w))
    assert approx.dtype == x.dtype
    assert _rel(approx, exact) < 2e-2
    # batched (B, L, d) inputs take the same dot_general path
    xb = jax.random.normal(k1, (2, 7, 64))
    approx_b = quant.matmul_t(xb, quant.quantize_int8(w))
    assert approx_b.shape == (2, 7, 32)
    assert _rel(approx_b, xb @ w.T) < 2e-2


def test_embed_lookup_and_zero_rows():
    emb = jax.random.normal(jax.random.PRNGKey(2), (11, 8))
    emb = emb.at[3].set(0.0)  # all-zero row must not divide by zero
    toks = jnp.array([[0, 3, 10, 5]])
    qt = quant.quantize_int8(emb, axis=0)
    got = quant.embed_lookup(qt, toks)
    want = quant.embed_lookup(emb, toks)
    assert _rel(got, want) < 5e-3
    assert np.all(np.asarray(got)[0, 1] == 0.0)


def test_quantize_lm_params_targets_only():
    cfg = MambaLMConfig(vocab_size=50, d_model=16, n_layer=2)
    model = MambaLM(cfg, scan_implementation="ref")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4), jnp.int32))
    qv = quant.quantize_lm_params(variables)
    qp = qv["params"]
    assert quant.is_qtensor(qp["embedding"])
    assert quant.is_qtensor(qp["mixer_0"]["in_proj_kernel"])
    assert quant.is_qtensor(qp["mixer_0"]["out_proj_kernel"])
    # precision-sensitive dt/B/C path stays float
    assert not quant.is_qtensor(qp["mixer_0"]["x_proj_kernel"])
    assert not quant.is_qtensor(qp["mixer_0"]["dt_proj_kernel"])
    assert qp["norm_0"]["scale"].dtype == jnp.float32


def test_mamba_step_quantized_close():
    m = MambaV3(d_model=16, bimamba_type="none", scan_implementation="ref")
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 12, 16)))["params"]
    qparams = quant.quantize_lm_params(params)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    conv_s, ssm_s = streaming.allocate_cache(2, 16)
    out, cs, ss = streaming.mamba_step(params, x, conv_s, ssm_s)
    qout, qcs, qss = streaming.mamba_step(qparams, x, conv_s, ssm_s)
    assert _rel(qout, out) < 5e-2
    assert _rel(qss, ss) < 5e-2


def test_qtensor_survives_frozendict():
    """QTensors must be detected through Mapping wrappers (flax freeze),
    not just plain dicts (ADVICE r3)."""
    from flax.core import freeze

    w = jax.random.normal(jax.random.PRNGKey(4), (8, 16))
    qt = freeze(quant.quantize_int8(w))
    assert quant.is_qtensor(qt)
    x = jax.random.normal(jax.random.PRNGKey(5), (3, 16))
    assert _rel(quant.matmul_t(x, qt), x @ w.T) < 2e-2


def test_scales_stay_fp32_from_bf16_weights():
    """Quantizing a bf16 tensor must not bf16-round the scales (ADVICE r3);
    and quantize_lm_params(activation_dtype=bf16) quantizes targets from
    fp32 while casting the rest."""
    w32 = jax.random.normal(jax.random.PRNGKey(6), (24, 48))
    qt = quant.quantize_int8(w32.astype(jnp.bfloat16))
    assert qt["s"].dtype == jnp.float32

    cfg = MambaLMConfig(vocab_size=50, d_model=16, n_layer=1)
    model = MambaLM(cfg, scan_implementation="ref")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4), jnp.int32))
    qv = quant.quantize_lm_params(variables, activation_dtype=jnp.bfloat16)
    qp = qv["params"]
    assert qp["embedding"]["s"].dtype == jnp.float32
    assert qp["mixer_0"]["x_proj_kernel"].dtype == jnp.bfloat16
    assert qp["norm_0"]["scale"].dtype == jnp.bfloat16
    # compute_dtype skips the fp32 scales and reports the activation dtype
    assert quant.compute_dtype(qp) == jnp.bfloat16
    assert quant.compute_dtype(variables["params"]) == jnp.float32
    # embed_lookup honors the requested output dtype
    rows = quant.embed_lookup(qp["embedding"], jnp.array([[1, 2]]),
                              dtype=jnp.bfloat16)
    assert rows.dtype == jnp.bfloat16


def test_forward_functional_matches_apply_and_scores_int8():
    """forward_functional == model.apply for float trees, and the lm-eval
    core routes int8 trees through it (loglikelihood stays close)."""
    from vivim_tpu.cli.lm_eval_harness import MambaEvalCore
    from vivim_tpu.nn.lm import forward_functional

    cfg = MambaLMConfig(vocab_size=50, d_model=16, n_layer=2, rms_norm=True,
                        residual_in_fp32=True)
    model = MambaLM(cfg, scan_implementation="ref")
    toks = jnp.array([[1, 2, 3, 4, 5, 6]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), toks)
    want = model.apply(variables, toks)
    got = forward_functional(model, variables, toks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    class _Tok:
        eos_token_id = 0

        def encode(self, text):
            return [ord(c) % 50 for c in text]

        def decode(self, ids):
            return "".join(chr(i) for i in ids)

    core_f = MambaEvalCore(model, variables, _Tok())
    core_q = MambaEvalCore(model, quant.quantize_lm_params(variables),
                           _Tok())
    ll_f, _ = core_f.loglikelihood_pair("abcd", "efgh")
    ll_q, _ = core_q.loglikelihood_pair("abcd", "efgh")
    assert abs(ll_q - ll_f) < 0.05 * max(abs(ll_f), 1.0)


def test_generate_int8_matches_bf16_greedy():
    """Greedy decode with int8 weights tracks the float model: the scores
    stay close and the token streams agree on a tiny model."""
    cfg = MambaLMConfig(vocab_size=50, d_model=16, n_layer=2)
    model = MambaLM(cfg, scan_implementation="ref")
    tokens = jnp.array([[1, 2, 3, 4]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), tokens)
    qvars = quant.quantize_lm_params(variables)

    full, scores = generate(model, variables, tokens, 6, temperature=0.0,
                            output_scores=True)
    qfull, qscores = generate(model, qvars, tokens, 6, temperature=0.0,
                              output_scores=True)
    assert qfull.shape == full.shape
    assert _rel(qscores, scores) < 5e-2
    # greedy argmax should survive ~1% logit noise at random init
    assert np.asarray(qfull == full).mean() > 0.75
