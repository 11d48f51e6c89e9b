"""LM generation latency benchmark.

Equivalent of /root/reference/mamba/benchmarks/
benchmark_generation_mamba_simple.py:17-90: times prompt prefill + token
decode for a MambaLM and reports tokens/sec (the jitted lax.scan decode
replaces the CUDA-graph replay).  Like the reference, it can run a real
checkpoint (``--hf_dir`` local snapshot / ``--ckpt``, the zero-egress
``--model-name`` analogue) and a real ``--prompt`` through a tokenizer,
printing the decoded continuation.

Usage:
  python -m vivim_tpu.cli.bench_generation --d_model 768 --n_layer 24 \\
      --promptlen 128 --genlen 128
  python -m vivim_tpu.cli.bench_generation --hf_dir /path/snapshot \\
      --prompt "My cat wrote all this CUDA code for a new language model"
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--vocab", type=int, default=50277)
    p.add_argument("--d_model", type=int, default=768)
    p.add_argument("--n_layer", type=int, default=24)
    p.add_argument("--hf_dir", type=str, default=None,
                   help="local HF mamba snapshot dir (config.json + "
                        "pytorch_model.bin); overrides the dim flags — the "
                        "reference's --model-name, zero-egress variant")
    p.add_argument("--hf_repo", type=str, default=None,
                   help="HF hub repo id (e.g. state-spaces/mamba-130m) — "
                        "the reference's --model-name; downloads the "
                        "snapshot (needs network)")
    p.add_argument("--ckpt", type=str, default=None,
                   help="torch state-dict checkpoint (HF mamba layout)")
    p.add_argument("--prompt", type=str, default=None,
                   help="text prompt; needs --tokenizer, prints the decoded "
                        "continuation (benchmark_generation_mamba_simple.py:19,"
                        "33-43,88)")
    p.add_argument("--tokenizer", type=str, default=None,
                   help="HF tokenizer name/path for --prompt")
    p.add_argument("--promptlen", type=int, default=128)
    p.add_argument("--genlen", type=int, default=128)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--topk", type=int, default=1)
    p.add_argument("--topp", type=float, default=1.0)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--tp_shards", type=int, default=1,
                   help="tensor-parallel decode over a 'model' mesh axis "
                        "(sharded conv/ssm cache; parallel/tensor_parallel)")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16", "int8"],
                   help="weight/activation dtype for decode.  Single-token "
                        "decode is HBM-bandwidth-bound (every weight is "
                        "read once per token), so bfloat16 halves the "
                        "per-token traffic — the TPU analogue of the "
                        "reference benchmark's fp16 decode "
                        "(benchmark_generation_mamba_simple.py:52) — and "
                        "int8 (per-channel weights, nn/quant.py) halves "
                        "the in/out-proj + tied-embedding traffic again, "
                        "with dynamic per-row int8 activation quantization "
                        "at the quantized matmuls (int8 x int8 MXU) and "
                        "bf16 elsewhere.  The SSM state recurrence and "
                        "A/D/dt_bias stay fp32 (the kernel numerics "
                        "contract) in every mode")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from vivim_tpu.cli.lm_eval_harness import load_lm
    from vivim_tpu.nn.lm import generate

    model, variables = load_lm(args.ckpt, args.vocab, args.d_model,
                               args.n_layer, hf_dir=args.hf_dir,
                               hf_repo=args.hf_repo)
    if args.dtype == "bfloat16":
        from vivim_tpu.train.loop import cast_floating

        variables = cast_floating(variables, jnp.bfloat16)
    elif args.dtype == "int8":
        if args.tp_shards > 1:
            raise SystemExit("--dtype int8 is single-device decode only "
                             "(the TP island shards plain param trees)")
        from vivim_tpu.nn.quant import quantize_lm_params

        # quantize from the original fp32 weights (scales stay fp32);
        # non-quantized leaves become bf16 activations in the same walk
        variables = quantize_lm_params(variables,
                                       activation_dtype=jnp.bfloat16)

    tokenizer = None
    if args.prompt is not None:
        if args.tokenizer is None:
            raise SystemExit("--prompt needs --tokenizer")
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
        ids = tokenizer.encode(args.prompt)
        tokens = jnp.asarray([ids] * args.batch, jnp.int32)
    else:
        tokens = jnp.ones((args.batch, args.promptlen), jnp.int32)

    if args.tp_shards > 1:
        from vivim_tpu.parallel.mesh import make_mesh
        from vivim_tpu.parallel.tensor_parallel import tp_generate

        mesh = make_mesh(args.tp_shards, axis="model")
        gen = jax.jit(lambda params, toks: tp_generate(
            model, params, toks, args.genlen, mesh,
            rng=jax.random.PRNGKey(1), temperature=args.temperature,
            top_k=args.topk, top_p=args.topp))
    else:
        gen = jax.jit(lambda params, toks: generate(
            model, params, toks, args.genlen, rng=jax.random.PRNGKey(1),
            temperature=args.temperature, top_k=args.topk, top_p=args.topp))

    # NOTE: block_until_ready does not synchronize through the axon TPU
    # tunnel — timing must force a device->host VALUE fetch instead.
    def fetch(o):
        return int(jnp.sum(o[:, -1]))

    out = gen(variables, tokens)  # compile
    fetch(out)
    t0 = time.time()
    for _ in range(args.repeats):
        out = gen(variables, tokens)
    fetch(out)
    dt = (time.time() - t0) / args.repeats
    print(json.dumps({
        "prompt_len": int(tokens.shape[1]),
        "gen_len": args.genlen,
        "batch": args.batch,
        "total_sec": round(dt, 4),
        "tokens_per_sec": round(args.batch * args.genlen / dt, 2),
        "dtype": args.dtype,
    }))
    if tokenizer is not None:
        import numpy as np

        print(tokenizer.batch_decode(np.asarray(out))[0])


if __name__ == "__main__":
    main()
