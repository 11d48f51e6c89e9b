"""Streaming decode parity and LM generation tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vivim_tpu.nn import streaming
from vivim_tpu.nn.lm import MambaLM, MambaLMConfig, generate, \
    rescale_residual_projections
from vivim_tpu.nn.mamba import MambaV3


@pytest.fixture(scope="module")
def mamba_params():
    m = MambaV3(d_model=16, bimamba_type="none", scan_implementation="ref")
    x = jnp.zeros((2, 12, 16))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    return m, params


def test_streaming_matches_parallel(mamba_params):
    """Prefill + per-token steps == one full parallel forward."""
    m, params = mamba_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 16))
    full = m.apply({"params": params}, x)

    # prefill on the first 8 tokens, then stream the last 4
    pre, conv_s, ssm_s = streaming.mamba_prefill(params, x[:, :8])
    outs = [pre]
    for t in range(8, 12):
        o, conv_s, ssm_s = streaming.mamba_step(params, x[:, t], conv_s, ssm_s)
        outs.append(o[:, None])
    stitched = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stitched), np.asarray(full),
                               rtol=2e-3, atol=2e-3)


def test_streaming_from_scratch(mamba_params):
    """Pure token-by-token decode equals the parallel forward."""
    m, params = mamba_params
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 16))
    full = m.apply({"params": params}, x)
    conv_s, ssm_s = streaming.allocate_cache(1, 16)
    outs = []
    for t in range(6):
        o, conv_s, ssm_s = streaming.mamba_step(params, x[:, t], conv_s, ssm_s)
        outs.append(o[:, None])
    np.testing.assert_allclose(np.asarray(jnp.concatenate(outs, 1)),
                               np.asarray(full), rtol=2e-3, atol=2e-3)


def test_lm_forward_and_generate():
    cfg = MambaLMConfig(vocab_size=50, d_model=16, n_layer=2)
    model = MambaLM(cfg, scan_implementation="ref")
    tokens = jnp.array([[1, 2, 3, 4]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), tokens)
    params = rescale_residual_projections(variables["params"], cfg.n_layer)
    logits = model.apply({"params": params}, tokens)
    assert logits.shape == (1, 4, cfg.padded_vocab)

    # greedy decode consistency: generate's first token == argmax of forward
    out = generate(model, {"params": params}, tokens, max_new_tokens=3,
                   temperature=0.0)
    assert out.shape == (1, 7)
    want_first = int(jnp.argmax(logits[0, -1]))
    assert int(out[0, 4]) == want_first

    # stochastic sampling with top-k/top-p runs and differs across seeds
    s1 = generate(model, {"params": params}, tokens, 5,
                  rng=jax.random.PRNGKey(1), temperature=1.0, top_k=10,
                  top_p=0.9)
    s2 = generate(model, {"params": params}, tokens, 5,
                  rng=jax.random.PRNGKey(2), temperature=1.0, top_k=10,
                  top_p=0.9)
    assert s1.shape == s2.shape == (1, 9)


class _ToyTokenizer:
    """Char-level tokenizer: 'a'..'z' -> 1..26; eos = 0."""

    eos_token_id = 0

    def encode(self, s):
        return [max(1, min(26, ord(c) - 96)) for c in s if c.isalpha()]

    def decode(self, ids):
        return "".join(chr(96 + i) for i in ids if 1 <= i <= 26)


@pytest.fixture(scope="module")
def eval_core():
    from vivim_tpu.cli.lm_eval_harness import MambaEvalCore

    cfg = MambaLMConfig(vocab_size=32, d_model=16, n_layer=2)
    model = MambaLM(cfg, scan_implementation="ref")
    tokens = jnp.ones((1, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens)
    return MambaEvalCore(model, params, _ToyTokenizer(), max_gen_toks=4), \
        model, params


def test_eval_core_loglikelihood(eval_core):
    """ll == sum of continuation log-probs from the full forward."""
    core, model, params = eval_core
    ll, greedy = core.loglikelihood_pair("abc", "de")
    ids = [1, 2, 3, 4, 5]
    logits = model.apply(params, jnp.asarray([ids], jnp.int32))[0]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    want = float(logp[2, 4] + logp[3, 5])
    assert ll == pytest.approx(want, rel=1e-5)
    assert isinstance(greedy, bool)


def test_eval_core_rolling(eval_core):
    """Rolling == loglikelihood of the text with EOT as sole context."""
    core, model, params = eval_core
    ll = core.loglikelihood_rolling_str("abcd")
    want, _ = core._score([0], [1, 2, 3, 4])
    assert ll == pytest.approx(want, rel=1e-5)


def test_eval_core_generate_until(eval_core):
    """Greedy generation matches generate(); stop strings truncate."""
    core, model, params = eval_core
    text = core.generate_until_str("ab", until=())
    out = generate(model, params, jnp.asarray([[1, 2]], jnp.int32),
                   max_new_tokens=4, temperature=0.0, eos_token_id=0)
    ids = [int(t) for t in out[0, 2:]]
    if 0 in ids:
        ids = ids[:ids.index(0)]
    assert text == _ToyTokenizer().decode(ids)
    if len(text) > 1:
        stopped = core.generate_until_str("ab", until=(text[1],))
        assert stopped == text[:text.index(text[1])]


import pytest


def test_load_lm_from_local_hf_snapshot(tmp_path):
    """``--hf_dir``: a local mamba HF snapshot (config.json +
    pytorch_model.bin) loads through ``load_lm`` with the config's
    rms_norm / residual_in_fp32 / pad_vocab_size_multiple honored — the
    zero-egress ``MambaLMHeadModel.from_pretrained`` surface
    (mamba/mamba_ssm/utils/hf.py:9-23)."""
    import json

    torch = pytest.importorskip("torch")
    from tests.torch_vivim_ref import MambaLMRefTorch
    from vivim_tpu.cli.lm_eval_harness import load_lm

    torch.manual_seed(11)
    vocab, d_model, n_layer = 48, 32, 2
    ref = MambaLMRefTorch(vocab, d_model, n_layer, rms_norm=True).eval()
    torch.save(ref.state_dict(), tmp_path / "pytorch_model.bin")
    (tmp_path / "config.json").write_text(json.dumps({
        "d_model": d_model, "n_layer": n_layer, "vocab_size": vocab,
        "ssm_cfg": {}, "rms_norm": True, "residual_in_fp32": True,
        "fused_add_norm": True, "pad_vocab_size_multiple": 8}))

    model, params = load_lm(None, 0, 0, 0, hf_dir=str(tmp_path))
    assert model.cfg.rms_norm and model.cfg.n_layer == n_layer
    tokens = torch.randint(0, vocab, (2, 7))
    with torch.no_grad():
        want = ref(tokens).numpy()
    got = model.apply(params, jnp.asarray(tokens.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_load_lm_from_hub_repo(tmp_path, monkeypatch):
    """``--hf_repo``: the networked ``from_pretrained`` surface resolves a
    repo id through huggingface_hub.snapshot_download then takes the same
    ``hf_dir`` path (hub mocked — this environment has no egress)."""
    import json

    torch = pytest.importorskip("torch")
    import huggingface_hub

    from tests.torch_vivim_ref import MambaLMRefTorch
    from vivim_tpu.cli.lm_eval_harness import load_lm

    torch.manual_seed(3)
    vocab, d_model, n_layer = 48, 16, 1
    ref = MambaLMRefTorch(vocab, d_model, n_layer).eval()
    torch.save(ref.state_dict(), tmp_path / "pytorch_model.bin")
    (tmp_path / "config.json").write_text(json.dumps({
        "d_model": d_model, "n_layer": n_layer, "vocab_size": vocab}))

    seen = {}

    def fake_download(repo_id, **kw):
        seen["repo"] = repo_id
        return str(tmp_path)

    monkeypatch.setattr(huggingface_hub, "snapshot_download", fake_download)
    model, params = load_lm(None, 0, 0, 0,
                            hf_repo="state-spaces/mamba-130m")
    assert seen["repo"] == "state-spaces/mamba-130m"
    assert model.cfg.d_model == d_model
    # offline failure is a clear actionable error, not a stack trace
    def boom(repo_id, **kw):
        raise OSError("name resolution failed")

    monkeypatch.setattr(huggingface_hub, "snapshot_download", boom)
    with pytest.raises(SystemExit, match="--hf_dir"):
        load_lm(None, 0, 0, 0, hf_repo="state-spaces/mamba-130m")


@pytest.mark.parametrize("rms", [False, True])
def test_generate_greedy_matches_full_forward_replay(rms):
    """Greedy streaming decode == repeatedly running the full forward —
    for both norm flavors (the decode loop's functional norm must track
    the module's rms_norm/norm_epsilon config)."""
    cfg = MambaLMConfig(vocab_size=32, d_model=16, n_layer=2,
                        rms_norm=rms, residual_in_fp32=rms)
    model = MambaLM(cfg, scan_implementation="ref")
    tokens = jnp.array([[5, 7]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), tokens)
    params = variables["params"]
    out = generate(model, {"params": params}, tokens, max_new_tokens=4,
                   temperature=0.0)
    # replay: feed growing sequences through the full (parallel) forward
    seq = tokens
    for _ in range(4):
        logits = model.apply({"params": params}, seq)
        nxt = jnp.argmax(logits[:, -1], axis=-1)[:, None]
        seq = jnp.concatenate([seq, nxt], axis=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(seq))


def test_generate_teacher_forcing_and_scores():
    """``teacher_outputs`` forces the emitted tokens (generation.py:164-168)
    and ``output_scores`` returns, per step, exactly the logits the full
    parallel forward produces at that position (generation.py:199-205) —
    teacher positions past the teacher length fall back to sampling."""
    cfg = MambaLMConfig(vocab_size=32, d_model=16, n_layer=2)
    model = MambaLM(cfg, scan_implementation="ref")
    prompt = jnp.array([[5, 7, 2]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), prompt)["params"]

    # teacher covers prompt + 3 of the 5 generated positions
    teacher = jnp.array([[5, 7, 2, 11, 0, 23]], jnp.int32)
    out, scores = generate(
        model, {"params": params}, prompt, max_new_tokens=5,
        temperature=0.0, teacher_outputs=teacher, output_scores=True)
    assert out.shape == (1, 8) and scores.shape == (1, 5, cfg.padded_vocab)
    # forced positions come from the teacher verbatim
    np.testing.assert_array_equal(np.asarray(out[:, 3:6]),
                                  np.asarray(teacher[:, 3:6]))
    # beyond the teacher: greedy over the scores at that step
    np.testing.assert_array_equal(
        np.asarray(out[:, 6:]),
        np.asarray(jnp.argmax(scores[:, 3:], axis=-1)))
    # scores[t] == parallel-forward logits at the position that emitted
    # token t (the decode cache must track the forced tokens, not the
    # would-have-been samples)
    full_logits = model.apply({"params": params}, out[:, :-1])
    np.testing.assert_allclose(np.asarray(scores),
                               np.asarray(full_logits[:, 2:]),
                               rtol=2e-3, atol=2e-3)
