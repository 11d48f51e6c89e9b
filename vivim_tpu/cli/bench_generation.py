"""LM generation latency benchmark.

Equivalent of /root/reference/mamba/benchmarks/
benchmark_generation_mamba_simple.py:17-90: times prompt prefill + token
decode for a MambaLM and reports tokens/sec (the jitted lax.scan decode
replaces the CUDA-graph replay).

Usage:
  python -m vivim_tpu.cli.bench_generation --d_model 768 --n_layer 24 \\
      --promptlen 128 --genlen 128
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
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from vivim_tpu.nn.lm import MambaLM, MambaLMConfig, generate

    cfg = MambaLMConfig(vocab_size=args.vocab, d_model=args.d_model,
                        n_layer=args.n_layer)
    model = MambaLM(cfg)
    tokens = jnp.ones((args.batch, args.promptlen), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), tokens)

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
    out = gen(variables, tokens)  # compile
    out.block_until_ready()
    t0 = time.time()
    for _ in range(args.repeats):
        out = gen(variables, tokens)
    out.block_until_ready()
    dt = (time.time() - t0) / args.repeats
    print(json.dumps({
        "prompt_len": args.promptlen,
        "gen_len": args.genlen,
        "batch": args.batch,
        "total_sec": round(dt, 4),
        "tokens_per_sec": round(args.batch * args.genlen / dt, 2),
    }))


if __name__ == "__main__":
    main()
