"""lm-eval-harness adapter for MambaLM.

Equivalent of /root/reference/mamba/evals/lm_harness_eval.py:14-30 — wraps
the LM for EleutherAI's lm-evaluation-harness.  The request-type logic
(``loglikelihood``, ``loglikelihood_rolling``, ``generate_until``) lives in
``MambaEvalCore``, which has no lm_eval dependency and is unit-tested
directly; ``build_wrapper`` grafts it onto ``lm_eval.api.model.LM`` when
the harness is installed (it is not part of this image).

  python -m vivim_tpu.cli.lm_eval_harness --tasks lambada_openai \\
      --ckpt mamba.pt --tokenizer EleutherAI/gpt-neox-20b
"""

from __future__ import annotations

import argparse
import json


class MambaEvalCore:
    """lm_eval request semantics, implemented against a jitted forward +
    the jitted scan decode in ``nn.lm.generate``.

    ``tokenizer`` needs ``encode(str) -> list[int]`` and
    ``decode(list[int]) -> str`` (HF tokenizers qualify).

    ``tp_shards > 1`` runs everything tensor-parallel over a 1-D ``model``
    mesh — scoring through ``parallel.tensor_parallel.lm_tp_forward`` and
    decode through ``tp_generate`` (the conv/ssm decode cache lives
    sharded, 1/k of the cache HBM per device) — for LMs too large for one
    chip.

    ``pp_stages > 1`` scores pipeline-parallel instead: the layer stack
    runs as a GPipe schedule over a 1-D ``pipe`` mesh with stage-sharded
    weights (``parallel.pipeline.lm_pp_forward``; ``n_micro=1`` — scoring
    batches are single sequences, so PP here buys the k-way weight split,
    not microbatch overlap).  Decode requests fall back to the
    single-device token loop (a 1-token step has no pipeline to fill).
    Mutually exclusive with ``tp_shards``.
    """

    def __init__(self, model, params, tokenizer, max_gen_toks=128,
                 eot_token_id=None, tp_shards=1, pp_stages=1):
        import jax

        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.max_gen_toks = max_gen_toks
        self.eot_token_id = (
            eot_token_id if eot_token_id is not None
            else getattr(tokenizer, "eos_token_id", None) or 0)
        self._tp_mesh = None
        if tp_shards > 1 and pp_stages > 1:
            raise ValueError(
                "tp_shards and pp_stages are mutually exclusive — pick "
                "one sharding for the eval forward")
        if pp_stages > 1:
            from vivim_tpu.parallel.mesh import make_mesh
            from vivim_tpu.parallel.pipeline import lm_pp_forward

            pp_mesh = make_mesh(pp_stages, axis="pipe")
            self._fwd = jax.jit(lambda toks: lm_pp_forward(
                model.cfg, params, toks, pp_mesh, n_micro=1,
                implementation=model.scan_implementation))
        elif tp_shards > 1:
            from vivim_tpu.parallel.mesh import make_mesh
            from vivim_tpu.parallel.tensor_parallel import lm_tp_forward

            self._tp_mesh = make_mesh(tp_shards, axis="model")
            mesh = self._tp_mesh
            self._fwd = jax.jit(lambda toks: lm_tp_forward(
                model.cfg, params, toks, mesh,
                implementation=model.scan_implementation))
        else:
            from vivim_tpu.nn.lm import forward_functional
            from vivim_tpu.nn.quant import tree_has_qtensor

            if tree_has_qtensor(params):
                # int8 weight-only trees (quantize_lm_params) cannot flow
                # through the flax apply; score through the same functional
                # path the decode loop serves
                self._fwd = jax.jit(
                    lambda toks: forward_functional(model, params, toks))
            else:
                self._fwd = jax.jit(lambda toks: model.apply(params, toks))

    def _score(self, ctx_ids, cont_ids):
        """Sum of log p(cont | ctx) and whether cont is the greedy argmax."""
        import jax
        import jax.numpy as jnp

        toks = jnp.asarray([list(ctx_ids) + list(cont_ids)], jnp.int32)
        logits = self._fwd(toks)[0]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        start = len(ctx_ids) - 1
        positions = logp[start:start + len(cont_ids)]
        cont = jnp.asarray(cont_ids)
        ll = float(jnp.take_along_axis(
            positions, cont[:, None], axis=-1).sum())
        greedy = bool((jnp.argmax(positions, -1) == cont).all())
        return ll, greedy

    def loglikelihood_pair(self, ctx: str, cont: str):
        ctx_ids = self.tokenizer.encode(ctx) if ctx else [self.eot_token_id]
        cont_ids = self.tokenizer.encode(cont)
        return self._score(ctx_ids, cont_ids)

    def loglikelihood_rolling_str(self, text: str):
        """Full-text likelihood: every token predicted from its prefix,
        with the EOT token as context for the first (lm_eval rolling
        convention)."""
        ids = self.tokenizer.encode(text)
        ll, _ = self._score([self.eot_token_id], ids)
        return ll

    def generate_until_str(self, ctx: str, until=(), max_gen_toks=None):
        """Greedy continuation, truncated at the first stop string."""
        import jax
        import jax.numpy as jnp

        from vivim_tpu.nn import lm as lm_lib

        ctx_ids = self.tokenizer.encode(ctx) if ctx else [self.eot_token_id]
        toks = jnp.asarray([ctx_ids], jnp.int32)
        n_new = max_gen_toks or self.max_gen_toks
        if self._tp_mesh is not None:
            from vivim_tpu.parallel.tensor_parallel import tp_generate

            out = tp_generate(
                self.model, self.params, toks, n_new, self._tp_mesh,
                rng=jax.random.PRNGKey(0), temperature=0.0,
                eos_token_id=self.eot_token_id,
                implementation=self.model.scan_implementation)
        else:
            out = lm_lib.generate(
                self.model, self.params, toks, n_new,
                rng=jax.random.PRNGKey(0), temperature=0.0,
                eos_token_id=self.eot_token_id)
        new_ids = [int(t) for t in out[0, len(ctx_ids):]]
        if self.eot_token_id in new_ids:
            new_ids = new_ids[:new_ids.index(self.eot_token_id)]
        text = self.tokenizer.decode(new_ids)
        for stop in until or ():
            if stop and stop in text:
                text = text[:text.index(stop)]
        return text


def build_wrapper(model, params, tokenizer, **core_kw):
    """MambaEvalCore grafted onto lm_eval's LM interface (requires
    lm-evaluation-harness; mirrors evals/lm_harness_eval.py:14-30)."""
    try:
        from lm_eval.api.model import LM
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "lm_eval is not installed in this environment; install "
            "lm-evaluation-harness to run LM evals") from e

    core = MambaEvalCore(model, params, tokenizer, **core_kw)

    class MambaEvalWrapper(LM):  # pragma: no cover - needs lm_eval
        def loglikelihood(self, requests):
            return [core.loglikelihood_pair(*req.args) for req in requests]

        def loglikelihood_rolling(self, requests):
            return [core.loglikelihood_rolling_str(req.args[0])
                    for req in requests]

        def generate_until(self, requests):
            out = []
            for req in requests:
                ctx, gen_kwargs = req.args
                out.append(core.generate_until_str(
                    ctx, until=gen_kwargs.get("until", ()),
                    max_gen_toks=gen_kwargs.get("max_gen_toks")))
            return out

    return MambaEvalWrapper()


def resolve_hf_repo(repo_id: str) -> str:
    """Download (or reuse the local cache of) a mamba LM snapshot from the
    HF hub and return its directory — the networked half of the
    reference's ``MambaLMHeadModel.from_pretrained``
    (mamba/mamba_ssm/utils/hf.py:9-23 ``load_config_hf`` /
    ``load_state_dict_hf``).  In a zero-egress environment this raises a
    clear error and ``--hf_dir`` (a pre-fetched snapshot) is the route."""
    try:
        from huggingface_hub import snapshot_download

        return snapshot_download(
            repo_id, allow_patterns=["config.json", "pytorch_model.bin",
                                     "*.safetensors"])
    except Exception as e:
        raise SystemExit(
            f"could not download {repo_id!r} from the HF hub ({e}); in an "
            "offline environment pass --hf_dir with a local snapshot "
            "(config.json + pytorch_model.bin) instead") from e


def load_lm(ckpt, vocab_size, d_model, n_layer, hf_dir=None, hf_repo=None):
    """Build a MambaLM and load params from a torch state-dict file (via
    mamba_lm_params_from_torch), from a local HF snapshot directory
    (``hf_dir`` with config.json + pytorch_model.bin — the
    ``MambaLMHeadModel.from_pretrained`` surface, zero-egress variant:
    config keys incl. rms_norm/residual_in_fp32 are honored), from the
    hub by repo id (``hf_repo``, e.g. ``state-spaces/mamba-130m`` —
    requires network), or random-init when all are None."""
    if hf_repo and not hf_dir:
        hf_dir = resolve_hf_repo(hf_repo)
    import jax
    import jax.numpy as jnp

    from vivim_tpu.nn.lm import MambaLM, MambaLMConfig, config_from_mamba_json

    if hf_dir:
        import os

        with open(os.path.join(hf_dir, "config.json")) as f:
            cfg = config_from_mamba_json(json.load(f))
        ckpt = ckpt or os.path.join(hf_dir, "pytorch_model.bin")
    else:
        cfg = MambaLMConfig(vocab_size=vocab_size, d_model=d_model,
                            n_layer=n_layer)
    model = MambaLM(cfg)
    if ckpt:
        import torch

        from vivim_tpu.convert.torch_to_jax import mamba_lm_params_from_torch

        sd = torch.load(ckpt, map_location="cpu", weights_only=True)
        if "state_dict" in sd:
            sd = sd["state_dict"]
        params = {"params": mamba_lm_params_from_torch(sd, cfg.n_layer)}
    else:
        toks = jnp.ones((1, 8), jnp.int32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), toks)
    return model, params


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tasks", type=str, required=True,
                   help="comma-separated lm_eval task names")
    p.add_argument("--ckpt", type=str, default=None,
                   help="torch state-dict checkpoint (HF mamba layout)")
    p.add_argument("--hf_dir", type=str, default=None,
                   help="local HF mamba snapshot dir (config.json + "
                        "pytorch_model.bin); overrides the dim flags")
    p.add_argument("--hf_repo", type=str, default=None,
                   help="HF hub repo id (e.g. state-spaces/mamba-130m) — "
                        "the reference's from_pretrained model name; "
                        "downloads the snapshot (needs network)")
    p.add_argument("--tokenizer", type=str,
                   default="EleutherAI/gpt-neox-20b")
    p.add_argument("--vocab", type=int, default=50277)
    p.add_argument("--d_model", type=int, default=768)
    p.add_argument("--n_layer", type=int, default=24)
    p.add_argument("--max_gen_toks", type=int, default=128)
    p.add_argument("--tp_shards", type=int, default=1,
                   help="tensor-parallel shards for scoring (Megatron "
                        "column/row split of every mixer over a 'model' "
                        "mesh axis)")
    p.add_argument("--pp_stages", type=int, default=1,
                   help="pipeline-parallel stages for scoring (GPipe "
                        "stage-sharded layer stack over a 'pipe' mesh "
                        "axis; mutually exclusive with --tp_shards)")
    p.add_argument("--limit", type=int, default=None,
                   help="cap examples per task (smoke runs)")
    args = p.parse_args(argv)

    try:
        import lm_eval
    except ImportError:
        raise SystemExit(
            "lm_eval is not installed in this environment. Install "
            "lm-evaluation-harness to run evals; the adapter logic "
            "(MambaEvalCore) works without it and is unit-tested.")

    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
    model, params = load_lm(args.ckpt, args.vocab, args.d_model,
                            args.n_layer, hf_dir=args.hf_dir,
                            hf_repo=args.hf_repo)
    wrapper = build_wrapper(model, params, tokenizer,
                            max_gen_toks=args.max_gen_toks,
                            tp_shards=args.tp_shards,
                            pp_stages=args.pp_stages)
    results = lm_eval.simple_evaluate(
        model=wrapper, tasks=args.tasks.split(","), limit=args.limit)
    print(json.dumps(results.get("results", results), indent=2,
                     default=str))
    return results


if __name__ == "__main__":
    main()
