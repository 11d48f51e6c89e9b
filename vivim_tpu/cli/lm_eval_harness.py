"""lm-eval-harness adapter for MambaLM.

Equivalent of /root/reference/mamba/evals/lm_harness_eval.py:14-30 — wraps
the LM for EleutherAI's lm-evaluation-harness.  The harness is not part of
this image, so the adapter is import-gated; with ``lm_eval`` installed:

  python -m vivim_tpu.cli.lm_eval_harness --tasks lambada_openai ...
"""

from __future__ import annotations

import argparse


def build_wrapper(model, params, tokenizer):
    try:
        import lm_eval
        from lm_eval.api.model import LM
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "lm_eval is not installed in this environment; install "
            "lm-evaluation-harness to run LM evals") from e

    import jax
    import jax.numpy as jnp

    class MambaEvalWrapper(LM):
        def __init__(self):
            super().__init__()
            self._fwd = jax.jit(lambda toks: model.apply(params, toks))

        def loglikelihood(self, requests):
            out = []
            for req in requests:
                ctx, cont = req.args
                ctx_ids = tokenizer.encode(ctx)
                cont_ids = tokenizer.encode(cont)
                toks = jnp.asarray([ctx_ids + cont_ids], jnp.int32)
                logits = self._fwd(toks)[0]
                logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
                start = len(ctx_ids) - 1
                ll = 0.0
                greedy = True
                for i, tok in enumerate(cont_ids):
                    ll += float(logp[start + i, tok])
                    greedy &= int(jnp.argmax(logp[start + i])) == tok
                out.append((ll, greedy))
            return out

        def loglikelihood_rolling(self, requests):  # pragma: no cover
            raise NotImplementedError

        def generate_until(self, requests):  # pragma: no cover
            raise NotImplementedError

    return MambaEvalWrapper()


def main(argv=None):  # pragma: no cover - requires lm_eval + a checkpoint
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tasks", type=str, required=True)
    p.add_argument("--ckpt", type=str, required=True)
    p.parse_args(argv)
    raise SystemExit("install lm-evaluation-harness and a tokenizer, then "
                     "use build_wrapper() programmatically")


if __name__ == "__main__":
    main()
