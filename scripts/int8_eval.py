"""Task-level validation of int8 weight-only decode (VERDICT r3 item 5).

The +54%/+94% int8 serving claims (docs/DESIGN.md) were backed only by
logit closeness (~1-2% relative, tests/test_quant.py); this script attaches
a task-level accuracy cost.  No eval dataset or pretrained checkpoint ships
in this zero-egress environment (lm_eval and real checkpoints are
env-blocked, VERDICT r3 "What's missing" #2/#3), so the task is synthetic
but REAL in the sense that the model has learned structure to lose:

  1. generate a corpus from a fixed-seed order-2 Markov chain over a
     32-symbol alphabet (sentences with deterministic local grammar),
  2. train a MambaLM on it (AdamW, a few hundred steps on the TPU),
  3. score held-out continuations through the SAME request path the
     lm-eval harness uses (``cli.lm_eval_harness.MambaEvalCore
     .loglikelihood_pair`` — loglikelihood sum + greedy-match flag) with
     fp32, bf16, and int8 (weight-only, dynamic int8 activations) params,
  4. report per-token NLL (= log perplexity) and greedy-accuracy deltas.

Writes docs/int8_eval.json and prints one JSON line.

Usage (TPU host):  python scripts/int8_eval.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VOCAB = 32
D_MODEL = int(os.environ.get("INT8_EVAL_D_MODEL", 256))
N_LAYER = int(os.environ.get("INT8_EVAL_N_LAYER", 4))
SEQ = 64
TRAIN_STEPS = int(os.environ.get("INT8_EVAL_STEPS", 400))
BATCH = 32
N_EVAL = int(os.environ.get("INT8_EVAL_N_EVAL", 64))


class _ToyTokenizer:
    """Symbol-per-character tokenizer over the synthetic alphabet (gives
    MambaEvalCore its encode/decode contract)."""

    eos_token_id = 0
    _chars = [chr(ord("a") + i) for i in range(26)] + list(".,;:!?")

    def encode(self, text):
        return [self._chars.index(c) for c in text]

    def decode(self, ids):
        return "".join(self._chars[i] for i in ids)


def make_corpus(rng: np.random.Generator, n_tokens: int) -> np.ndarray:
    """Order-2 Markov chain with a sparse transition table: each (a, b)
    context allows only 3 successors with fixed probabilities — enough
    structure that a trained LM beats the uniform ln(32)=3.47 NLL by a
    wide margin, so quantization damage is measurable."""
    table = rng.integers(0, VOCAB, size=(VOCAB, VOCAB, 3))
    probs = np.array([0.6, 0.3, 0.1])
    out = np.empty(n_tokens, np.int32)
    out[0], out[1] = rng.integers(0, VOCAB, 2)
    choices = rng.choice(3, size=n_tokens, p=probs)
    for i in range(2, n_tokens):
        out[i] = table[out[i - 2], out[i - 1], choices[i]]
    return out


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from vivim_tpu.cli.lm_eval_harness import MambaEvalCore
    from vivim_tpu.nn.lm import MambaLM, MambaLMConfig
    from vivim_tpu.nn.quant import quantize_lm_params
    from vivim_tpu.train.loop import cast_floating

    rng = np.random.default_rng(0)
    corpus = make_corpus(rng, TRAIN_STEPS * BATCH * (SEQ + 1) + 10_000)

    cfg = MambaLMConfig(vocab_size=VOCAB, d_model=D_MODEL, n_layer=N_LAYER)
    model = MambaLM(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.ones((1, 8), jnp.int32))

    tx = optax.adamw(3e-3, weight_decay=1e-2)
    opt_state = tx.init(params)

    def loss_fn(p, toks):
        logits = model.apply(p, toks[:, :-1])
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        tgt = toks[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], -1).mean()
        return nll

    @jax.jit
    def train_step(p, o, toks):
        l, g = jax.value_and_grad(loss_fn)(p, toks)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, l

    stride = BATCH * (SEQ + 1)
    losses = []
    for s in range(TRAIN_STEPS):
        chunk = corpus[s * stride:(s + 1) * stride]
        toks = jnp.asarray(chunk.reshape(BATCH, SEQ + 1))
        params, opt_state, l = train_step(params, opt_state, toks)
        if s % 100 == 0:
            losses.append(round(float(l), 4))
    final_train_nll = float(l)

    # held-out eval pairs from UNSEEN corpus tail: 48-token context,
    # 16-token continuation
    tail = corpus[TRAIN_STEPS * stride:]
    tok = _ToyTokenizer()
    pairs = []
    for i in range(N_EVAL):
        seg = tail[i * (SEQ + 1):(i + 1) * (SEQ + 1)]
        pairs.append((tok.decode(seg[:48].tolist()),
                      tok.decode(seg[48:64].tolist())))

    variants = {
        "float32": params,
        "bfloat16": cast_floating(params, jnp.bfloat16),
        "int8": quantize_lm_params(params, activation_dtype=jnp.bfloat16),
    }
    results = {}
    for name, p in variants.items():
        core = MambaEvalCore(model, p, tok)
        lls, greedy = [], []
        for ctx, cont in pairs:
            ll, g = core.loglikelihood_pair(ctx, cont)
            lls.append(ll)
            greedy.append(g)
        nll = -float(np.mean(lls)) / 16.0  # per-token
        results[name] = {
            "nll_per_token": round(nll, 4),
            "ppl": round(float(np.exp(nll)), 3),
            "greedy_exact_match": round(float(np.mean(greedy)), 3),
        }

    f32 = results["float32"]["nll_per_token"]
    out = {
        "config": f"MambaLM d_model={D_MODEL} n_layer={N_LAYER} "
                  f"vocab={VOCAB}, trained {TRAIN_STEPS} steps on an "
                  f"order-2 Markov corpus; {N_EVAL} held-out 48+16-token "
                  "loglikelihood requests through MambaEvalCore (the "
                  "lm-eval request path)",
        "uniform_nll": round(float(np.log(VOCAB)), 4),
        "train_nll_curve": losses,
        "final_train_nll": round(final_train_nll, 4),
        "results": results,
        "nll_delta_bf16_vs_fp32": round(
            results["bfloat16"]["nll_per_token"] - f32, 5),
        "nll_delta_int8_vs_fp32": round(
            results["int8"]["nll_per_token"] - f32, 5),
        "backend": jax.default_backend(),
        "device_kind": jax.devices()[0].device_kind,
    }
    with open(os.path.join(REPO, "docs", "int8_eval.json"), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
