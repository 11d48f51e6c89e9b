"""Mamba language model + generation (vendored-package capability parity).

TPU-native equivalents of the reference LM stack:

- ``MambaLM`` == MixerModel + MambaLMHeadModel
  (/root/reference/mamba/mamba_ssm/models/mixer_seq_simple.py:83-233):
  embedding -> n x [prenorm LayerNorm + Mamba mixer (single-direction)] ->
  final norm -> tied lm_head.  GPT-2-style init (:51-80): normal(0.02)
  embeddings/linears, residual-out projections rescaled by
  1/sqrt(n_residuals_per_layer * n_layer).
- ``generate`` == mamba_ssm/utils/generation.py:39-200: prompt prefill via
  the parallel scan, then a jitted ``lax.scan`` token loop over carried
  (conv_state, ssm_state) — the TPU replacement for the CUDA-graph decode
  cache (:256-377) — with temperature / top-k / top-p sampling and greedy
  decoding, stopping masked at eos.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from vivim_tpu.nn.mamba import MambaV3
from vivim_tpu.nn import quant, streaming


@dataclasses.dataclass(frozen=True)
class MambaLMConfig:
    vocab_size: int
    d_model: int = 768
    n_layer: int = 24
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    pad_vocab_multiple: int = 8
    initializer_range: float = 0.02
    # MixerModel norm options (mixer_seq_simple.py:24-27,90-94).  Real
    # pretrained mamba checkpoints (state-spaces/mamba-*) set rms_norm=True
    # and residual_in_fp32=True.  The reference's ``fused_add_norm`` is a
    # Triton kernel-fusion detail with identical math — XLA fuses the
    # residual add into the norm on its own, so it has no flag here.
    rms_norm: bool = False
    norm_epsilon: float = 1e-5
    residual_in_fp32: bool = False

    @property
    def padded_vocab(self):
        m = self.pad_vocab_multiple
        return ((self.vocab_size + m - 1) // m) * m


def config_from_mamba_json(d: dict, **overrides) -> MambaLMConfig:
    """MambaLMConfig from a mamba HF-snapshot ``config.json`` dict — the
    key map ``MambaLMHeadModel.from_pretrained`` consumes via
    ``load_config_hf`` (mamba/mamba_ssm/utils/hf.py:9-13,
    mixer_seq_simple.py:173-191).  Real checkpoints (state-spaces/mamba-*)
    set rms_norm=true / residual_in_fp32=true / pad_vocab_size_multiple=8.
    """
    ssm = d.get("ssm_cfg") or {}
    kw = dict(
        vocab_size=d["vocab_size"], d_model=d["d_model"],
        n_layer=d["n_layer"],
        d_state=ssm.get("d_state", 16), d_conv=ssm.get("d_conv", 4),
        expand=ssm.get("expand", 2),
        pad_vocab_multiple=d.get("pad_vocab_size_multiple", 8),
        rms_norm=d.get("rms_norm", False),
        norm_epsilon=d.get("norm_epsilon", 1e-5),
        residual_in_fp32=d.get("residual_in_fp32", False),
    )
    kw.update(overrides)
    return MambaLMConfig(**kw)


class MambaLM(nn.Module):
    cfg: MambaLMConfig
    scan_implementation: str | None = None

    def _mixer(self, i):
        return MambaV3(
            d_model=self.cfg.d_model, d_state=self.cfg.d_state,
            d_conv=self.cfg.d_conv, expand=self.cfg.expand,
            bimamba_type="none",
            scan_implementation=self.scan_implementation,
            name=f"mixer_{i}")

    def _norm(self, name):
        # reference norm_epsilon=1e-5 (mixer_seq_simple.py:24,90) — NOT
        # flax's 1e-6 default; with embedding-scale variances (~4e-4)
        # the eps choice shifts post-norm activations by ~1%
        if self.cfg.rms_norm:
            return nn.RMSNorm(epsilon=self.cfg.norm_epsilon, name=name)
        return nn.LayerNorm(epsilon=self.cfg.norm_epsilon, name=name)

    @nn.compact
    def __call__(self, tokens):
        """tokens (B, L) int32 -> logits (B, L, padded_vocab)."""
        cfg = self.cfg
        emb = self.param(
            "embedding",
            nn.initializers.normal(cfg.initializer_range),
            (cfg.padded_vocab, cfg.d_model))
        h = emb[tokens]
        dtype = h.dtype
        if cfg.residual_in_fp32:
            # the residual stream accumulates in fp32 while the mixers run
            # in the compute dtype (Block.forward, mamba_simple.py:480-489)
            h = h.astype(jnp.float32)
        for i in range(cfg.n_layer):
            res = h
            hn = self._norm(f"norm_{i}")(h).astype(dtype)
            out = self._mixer(i)(hn)
            h = res + out.astype(res.dtype)
        h = self._norm("norm_f")(h).astype(dtype)
        return h @ emb.T  # tied lm_head (mixer_seq_simple.py:193-204)


def rescale_residual_projections(params, n_layer, n_residuals_per_layer=1):
    """GPT-2 depth rescaling of out_proj kernels (mixer_seq_simple.py:64-80)."""
    scale = 1.0 / math.sqrt(n_residuals_per_layer * n_layer)

    def fix(path, p):
        names = [getattr(k, "key", "") for k in path]
        if "out_proj_kernel" in names:
            return p * scale
        return p

    return jax.tree_util.tree_map_with_path(fix, params)


def layer_norm(np_, h, eps=1e-5):
    """Functional twin of the model's ``nn.LayerNorm`` (same eps: the
    reference's norm_epsilon=1e-5, mixer_seq_simple.py:24), applied from a
    ``{"scale", "bias"}`` param dict — shared by ``generate``'s decode loop
    and the tensor-parallel functional forwards so the norm math lives in
    exactly one place."""
    mean = h.mean(-1, keepdims=True)
    var = ((h - mean) ** 2).mean(-1, keepdims=True)
    hn = (h - mean) * jax.lax.rsqrt(var + eps)
    return hn * np_["scale"] + np_["bias"]


def rms_norm(np_, h, eps=1e-5):
    """Functional twin of ``nn.RMSNorm`` (the reference's Triton
    ``rms_norm_ref``, ops/triton/layernorm.py:35-48: x·rsqrt(mean(x²)+eps)
    ·weight, no bias) from a ``{"scale"}`` param dict."""
    hn = h * jax.lax.rsqrt(jnp.mean(h * h, -1, keepdims=True) + eps)
    return hn * np_["scale"]


def norm_fn_for(cfg):
    """The functional norm matching ``MambaLM``'s config (shared by
    ``generate`` and the tensor-parallel forwards)."""
    import functools

    fn = rms_norm if getattr(cfg, "rms_norm", False) else layer_norm
    return functools.partial(fn, eps=getattr(cfg, "norm_epsilon", 1e-5))


def forward_functional(model: "MambaLM", params, tokens) -> jax.Array:
    """Full-sequence logits through the functional path ``generate``'s
    prefill uses — unlike ``model.apply`` this handles int8 QTensor trees
    (``quant.quantize_lm_params``), so loglikelihood scoring can run the
    SAME quantized weights the decode path serves.  Matches ``model.apply``
    exactly for plain float trees (same ops: embed -> n x [norm + mixer
    prefill] -> norm_f -> tied lm_head)."""
    cfg = model.cfg
    p = params["params"] if "params" in params else params
    emb = p["embedding"]
    apply_norm = norm_fn_for(cfg)
    dtype = quant.compute_dtype(p)
    h = quant.embed_lookup(emb, tokens, dtype=dtype)
    if cfg.residual_in_fp32:
        h = h.astype(jnp.float32)
    for i in range(cfg.n_layer):
        res = h
        out, _, _ = streaming.mamba_prefill(
            p[f"mixer_{i}"], apply_norm(p[f"norm_{i}"], h).astype(dtype),
            implementation=model.scan_implementation)
        h = res + out.astype(res.dtype)
    h = apply_norm(p["norm_f"], h).astype(dtype)
    return quant.lm_head(h, emb)


def _sample_logits(rng, logits, temperature, top_k, top_p):
    """Temperature / top-k / top-p filtering (generation.py:39-89)."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1)
    logits = logits / temperature
    if top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest set with cumulative prob >= top_p
        cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1)


def generate(model: MambaLM, params, tokens, max_new_tokens, rng=None,
             temperature=1.0, top_k=0, top_p=1.0, eos_token_id=None,
             mixer_prefill=None, mixer_step=None, teacher_outputs=None,
             output_scores=False):
    """Prefill + jitted scan decode.

    Args: tokens (B, L0) prompt.  Returns (B, L0 + max_new_tokens) tokens,
    or ``(tokens, scores)`` with scores (B, max_new_tokens, vocab) when
    ``output_scores=True`` — ``scores[:, t]`` are the logits that produced
    token t, the reference's ``output_scores``/``scores`` contract
    (generation.py:199-205,214-223).

    ``teacher_outputs`` (B, L_teacher): positions < L_teacher of the FULL
    sequence (prompt included) are forced from it instead of sampled,
    later positions fall back to sampling — the reference's test hook
    (generation.py:101,116-117,164-168).

    ``mixer_prefill`` / ``mixer_step`` override the per-mixer prefill and
    decode-step functions (default: ``streaming.mamba_prefill`` /
    ``streaming.mamba_step``) — the hook the tensor-parallel decode uses
    to run this same loop with sharded mixers
    (``parallel.tensor_parallel.tp_generate``).
    """
    cfg = model.cfg
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    p = params["params"] if "params" in params else params
    mixer_prefill = mixer_prefill or streaming.mamba_prefill
    mixer_step = mixer_step or streaming.mamba_step

    # the embedding may be an int8 QTensor (nn/quant.quantize_lm_params):
    # lookups dequantize the gathered rows, the tied lm_head runs the
    # int8 x int8 MXU matmul — decode is HBM-bound, so int8 weights halve
    # the per-token traffic vs bf16
    emb = p["embedding"]

    def layer_params(i):
        return p[f"mixer_{i}"], p[f"norm_{i}"]

    apply_norm = norm_fn_for(cfg)
    dtype = quant.compute_dtype(p)

    def residual(h):
        return h.astype(jnp.float32) if cfg.residual_in_fp32 else h

    # ---- prefill over the prompt ----
    h = residual(quant.embed_lookup(emb, tokens, dtype=dtype))
    conv_states, ssm_states = [], []
    for i in range(cfg.n_layer):
        mp, np_ = layer_params(i)
        res = h
        out, cs, ss = mixer_prefill(mp, apply_norm(np_, h).astype(dtype))
        h = res + out.astype(h.dtype)
        conv_states.append(cs)
        ssm_states.append(ss)
    h = apply_norm(p["norm_f"], h).astype(dtype)
    last_logits = quant.lm_head(h[:, -1], emb)
    conv_states = jnp.stack(conv_states)
    ssm_states = jnp.stack(ssm_states)

    prompt_len = tokens.shape[1]

    def step(carry, t):
        rng, logits, conv_states, ssm_states, done = carry
        rng, sub = jax.random.split(rng)
        next_tok = _sample_logits(sub, logits, temperature, top_k, top_p)
        if teacher_outputs is not None:
            tlen = teacher_outputs.shape[1]
            pos = prompt_len + t
            forced = teacher_outputs[:, jnp.minimum(pos, tlen - 1)]
            next_tok = jnp.where(pos < tlen, forced, next_tok)
        if eos_token_id is not None:
            next_tok = jnp.where(done, eos_token_id, next_tok)
            done = done | (next_tok == eos_token_id)
        h = residual(quant.embed_lookup(emb, next_tok, dtype=dtype))
        new_cs, new_ss = [], []
        for i in range(cfg.n_layer):
            mp, np_ = layer_params(i)
            res = h
            out, cs, ss = mixer_step(
                mp, apply_norm(np_, h).astype(dtype), conv_states[i],
                ssm_states[i])
            h = res + out.astype(h.dtype)
            new_cs.append(cs)
            new_ss.append(ss)
        h = apply_norm(p["norm_f"], h).astype(dtype)
        new_logits = quant.lm_head(h, emb)
        new_carry = (rng, new_logits, jnp.stack(new_cs), jnp.stack(new_ss),
                     done)
        return new_carry, ((next_tok, logits) if output_scores else next_tok)

    done0 = jnp.zeros((tokens.shape[0],), bool)
    carry = (rng, last_logits, conv_states, ssm_states, done0)
    _, out = jax.lax.scan(step, carry, jnp.arange(max_new_tokens))
    new_tokens = out[0] if output_scores else out
    full = jnp.concatenate([tokens, jnp.moveaxis(new_tokens, 0, 1)], axis=1)
    if output_scores:
        return full, jnp.moveaxis(out[1], 0, 1)
    return full
