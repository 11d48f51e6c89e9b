"""Weight-only int8 quantization for the LM decode path (beyond-reference).

Single-token decode reads every weight once per token, so it is
HBM-bandwidth-bound; the reference's decode benchmark runs fp16 for exactly
this reason (/root/reference/mamba/benchmarks/
benchmark_generation_mamba_simple.py:52).  bf16 already halves fp32 traffic
(see ``cli/bench_generation --dtype bfloat16``); int8 halves it again for
the quantized tensors.  The MXU multiplies int8 natively, so the int8
weights are consumed directly from HBM — no bf16 copy is materialized.

Scheme: symmetric per-output-channel weight quantization (scale =
amax/127 over the input dim) with dynamic symmetric per-row activation
quantization at the matmul (int8 x int8 -> int32 ``dot_general``, then one
fused rescale).  Quantized tensors travel as ``{"q": int8, "s": float}``
dicts ("QTensor"), so they remain ordinary pytrees under ``jit``/``scan``
and the decode loop carries them untouched; the bf16->int8 quantize of the
weights is loop-invariant and hoisted out of the token loop by XLA.

What gets quantized (``quantize_lm_params``): the mixer in/out projections
and the tied embedding/lm-head — together >95% of the LM's weight bytes.
``x_proj``/``dt_proj`` stay high-precision: they are tiny (<5% of bytes)
and feed the dt/B/C selective-scan inputs, where precision sets the state
recurrence quality.  A_log/D/dt_bias/conv/norm params are untouched (the
scan kernel's fp32 numerics contract).
"""

from __future__ import annotations

from collections.abc import Mapping

import jax
import jax.numpy as jnp


def is_qtensor(w) -> bool:
    # Mapping (not plain dict) so QTensors survive flax.core.freeze /
    # FrozenDict wrapping
    return isinstance(w, Mapping) and set(w.keys()) == {"q", "s"}


def quantize_int8(w: jax.Array, axis: int = 0) -> dict:
    """Symmetric per-channel int8 quantization of a float tensor.

    ``axis`` is the kept (per-channel) axis — for a ``(out, in)`` kernel
    used as ``x @ W.T`` that is axis 0.  Returns ``{"q": int8 same-shape,
    "s": float32 per-channel scales}`` with ``q * s ~= w``.  Scales stay
    float32 regardless of ``w``'s dtype: ``matmul_t`` rescales in fp32
    anyway, and a bf16 scale would add ~0.4% per-channel error for one
    scalar per channel of savings.
    """
    reduce_axes = tuple(i for i in range(w.ndim) if i != axis)
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=reduce_axes,
                   keepdims=True)
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127)
    return {"q": q.astype(jnp.int8),
            "s": jnp.squeeze(s, reduce_axes).astype(jnp.float32)}


def _quantize_rows(x: jax.Array):
    """Dynamic per-row int8 quantization of activations (last axis)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


def matmul_t(x: jax.Array, w) -> jax.Array:
    """``x @ w.T`` where ``w`` is a plain ``(out, in)`` kernel OR a QTensor.

    The int8 path dynamically quantizes ``x`` per row and runs an
    int8 x int8 -> int32 ``dot_general`` (native MXU int8 multiply), then
    applies the two scales in one fused elementwise rescale.
    """
    if not is_qtensor(w):
        return x @ w.T.astype(x.dtype)
    xq, xs = _quantize_rows(x)
    acc = jax.lax.dot_general(
        xq, w["q"],
        (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * xs * w["s"].astype(jnp.float32)
    return out.astype(x.dtype)


def tree_has_qtensor(params) -> bool:
    """True if any node of the tree is a QTensor (the dispatch test the
    eval harness uses to route scoring through the quant-aware functional
    forward instead of ``model.apply``)."""
    if is_qtensor(params):
        return True
    if isinstance(params, Mapping):
        return any(tree_has_qtensor(v) for v in params.values())
    return False


def compute_dtype(params, default=jnp.float32):
    """Activation/compute dtype of a (possibly quantized) parameter tree:
    the dtype of the first floating-point non-QTensor leaf (QTensor scales
    are storage fp32, not the compute dtype, so they are skipped)."""

    def walk(node):
        if is_qtensor(node):
            return None
        if isinstance(node, Mapping):
            for v in node.values():
                r = walk(v)
                if r is not None:
                    return r
            return None
        if hasattr(node, "dtype") and jnp.issubdtype(node.dtype,
                                                     jnp.floating):
            return node.dtype
        return None

    return walk(params) or default


def embed_lookup(emb, tokens, dtype=None) -> jax.Array:
    """Embedding-row gather; dequantizes the gathered rows exactly
    (per-row scales make the lookup path lossless up to int8 rounding).
    ``dtype`` is the output dtype for the quantized path (default: the
    fp32 of the scales)."""
    if not is_qtensor(emb):
        return emb[tokens]
    rows = (emb["q"][tokens].astype(jnp.float32)
            * emb["s"][tokens][..., None])
    return rows.astype(dtype) if dtype is not None else rows


def lm_head(h: jax.Array, emb) -> jax.Array:
    """Tied lm-head ``h @ emb.T`` for a plain or quantized embedding."""
    return matmul_t(h, emb)


_DEFAULT_TARGETS = ("in_proj_kernel", "out_proj_kernel", "embedding")


def quantize_lm_params(variables, targets=_DEFAULT_TARGETS,
                       activation_dtype=None):
    """Quantize an LM parameter tree for int8 decode.

    Walks the tree and replaces each leaf whose key is in ``targets`` with
    its QTensor (per-output-channel int8 + fp32 scales).  The result plugs
    straight into ``nn.lm.generate`` / ``nn.streaming.mamba_step`` — the
    matmul call sites dispatch on the QTensor shape.

    Quantize from the ORIGINAL (fp32) weights, not a bf16 copy — a bf16
    pre-cast stacks ~0.4% rounding on top of the int8 rounding for zero
    benefit.  ``activation_dtype`` (e.g. ``jnp.bfloat16``) additionally
    casts the remaining non-quantized float32 leaves, so one call produces
    the whole mixed int8-weights / bf16-activations tree.
    """

    def walk(node):
        if isinstance(node, Mapping) and not is_qtensor(node):
            return {k: (quantize_int8(v, axis=0)
                        if k in targets and not isinstance(v, Mapping)
                        else walk(v))
                    for k, v in node.items()}
        if (activation_dtype is not None and hasattr(node, "dtype")
                and node.dtype == jnp.float32):
            return node.astype(activation_dtype)
        return node

    return walk(variables)
