"""Streaming (single-token / clip-by-clip) Mamba state recurrence.

TPU-native equivalent of the reference decode path
(/root/reference/mamba/mamba_ssm/modules/mamba_simple.py:356-414 ``step`` /
``allocate_inference_cache``, causal_conv1d_update.cu, and the Triton
selective_state_update): a functional per-token step over carried
``(conv_state, ssm_state)``, plus a parallel prefill that runs the chunked
Pallas scan and emits the states for subsequent streaming.  The CUDA-graph
decode cache (generation.py:256-377) is unnecessary on TPU — the jitted
``lax.scan`` decode loop compiles once and replays without launch overhead.

All functions operate on a ``MambaV3`` parameter dict (forward-direction
parameter set — the reference ``step`` likewise uses only the forward
parameters) with time-major activations.
"""

from __future__ import annotations

import jax.numpy as jnp

from vivim_tpu.kernels.causal_conv1d import causal_conv1d, causal_conv1d_update
from vivim_tpu.kernels.refs import selective_state_update_ref
from vivim_tpu.kernels.selective_scan import selective_scan
from vivim_tpu.nn.quant import matmul_t


def allocate_cache(batch: int, d_model: int, d_state: int = 16,
                   d_conv: int = 4, expand: int = 2, dtype=jnp.float32):
    """(conv_state (B, W, d_inner), ssm_state (B, d_inner, N)) of zeros."""
    d_inner = expand * d_model
    return (jnp.zeros((batch, d_conv, d_inner), dtype),
            jnp.zeros((batch, d_inner, d_state), jnp.float32))


def _split_proj(params, x):
    # matmul_t dispatches on quantized (int8 QTensor) vs plain kernels —
    # the int8 weight-only decode path (nn/quant.py) flows through here
    xz = matmul_t(x, params["in_proj_kernel"])
    if "in_proj_bias" in params:
        xz = xz + params["in_proj_bias"]
    d_inner = xz.shape[-1] // 2
    return xz[..., :d_inner], xz[..., d_inner:]


def mamba_step(params, x, conv_state, ssm_state):
    """One decoding step (mamba_simple.py:356-401).

    Args: params: MambaV3 param dict; x: (B, d_model) token embedding;
    conv_state: (B, W, d_inner); ssm_state: (B, d_inner, N).

    Returns (out (B, d_model), new_conv_state, new_ssm_state).
    """
    xw, z = _split_proj(params, x)  # (B, d_inner)
    conv_w = params["conv1d_kernel"]
    xw, conv_state = causal_conv1d_update(
        xw, conv_state, conv_w, params.get("conv1d_bias"), "silu")
    x_dbl = xw @ params["x_proj_kernel"].T
    dt_rank = params["dt_proj_kernel"].shape[1]
    n = params["A_log"].shape[1]
    dt = x_dbl[..., :dt_rank] @ params["dt_proj_kernel"].T
    Bv = x_dbl[..., dt_rank : dt_rank + n]
    Cv = x_dbl[..., dt_rank + n :]
    A = -jnp.exp(params["A_log"].astype(jnp.float32))
    y, ssm_state = selective_state_update_ref(
        ssm_state, xw, dt, A, Bv, Cv, D=params["D"].astype(jnp.float32),
        z=z, dt_bias=params["dt_proj_bias"].astype(jnp.float32),
        dt_softplus=True)
    out = matmul_t(y, params["out_proj_kernel"])
    if "out_proj_bias" in params:
        out = out + params["out_proj_bias"]
    return out, conv_state, ssm_state


def mamba_prefill(params, x, implementation=None):
    """Parallel prefill: full forward over the prompt, emitting the states.

    Args: x (B, L, d_model).  Returns (out (B, L, d_model), conv_state,
    ssm_state) such that continuing with ``mamba_step`` matches running the
    full forward over the extended sequence.
    """
    xw, z = _split_proj(params, x)  # (B, L, d_inner)
    conv_w = params["conv1d_kernel"]
    width = conv_w.shape[0]
    # conv_state = last `width` pre-conv inputs, left-padded with zeros
    pad = jnp.pad(xw, ((0, 0), (max(width - x.shape[1], 0), 0), (0, 0)))
    conv_state = pad[:, -width:, :]
    xc = causal_conv1d(xw, conv_w, params.get("conv1d_bias"), "silu")
    x_dbl = jnp.einsum("bld,rd->blr", xc, params["x_proj_kernel"])
    dt_rank = params["dt_proj_kernel"].shape[1]
    n = params["A_log"].shape[1]
    delta = jnp.einsum("blr,dr->bld", x_dbl[..., :dt_rank],
                       params["dt_proj_kernel"])
    Bv = x_dbl[..., dt_rank : dt_rank + n]
    Cv = x_dbl[..., dt_rank + n :]
    A = -jnp.exp(params["A_log"].astype(jnp.float32))
    y, ssm_state = selective_scan(
        xc, delta, A, Bv, Cv, D=params["D"].astype(jnp.float32), z=z,
        delta_bias=params["dt_proj_bias"].astype(jnp.float32),
        delta_softplus=True, return_last_state=True,
        implementation=implementation)
    out = matmul_t(y, params["out_proj_kernel"])
    if "out_proj_bias" in params:
        out = out + params["out_proj_bias"]
    return out, conv_state, ssm_state
