"""Fused Mamba inner function — conv1d -> projections -> selective scan.

TPU equivalent of ``mamba_inner_fn_no_out_proj`` / ``mamba_inner_fn``
(/root/reference/mamba/mamba_ssm/ops/selective_scan_interface.py:155-434).
The CUDA version hand-fuses the causal conv, the x_proj/dt_proj matmuls and
the scan into one autograd Function with checkpoint_lvl=1 (conv output and
delta recomputed in the backward, :228-241).  On TPU the matmuls belong on
the MXU and XLA fuses the elementwise chain, so this is a jnp composition
around the Pallas scan; the same recompute-in-backward memory behavior is
obtained with ``jax.checkpoint`` (remat) around the pre-scan chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vivim_tpu.kernels.causal_conv1d import causal_conv1d
from vivim_tpu.kernels.selective_scan import selective_scan


@functools.partial(jax.checkpoint, static_argnums=(5,))
def _pre_scan(xz, conv1d_weight, conv1d_bias, x_proj_weight, delta_proj_weight,
              dstate):
    """Conv + projections: recomputed in the backward pass (checkpoint_lvl=1)."""
    d_inner = xz.shape[-1] // 2
    delta_rank = delta_proj_weight.shape[1]
    x, z = xz[..., :d_inner], xz[..., d_inner:]
    x = causal_conv1d(x, conv1d_weight, conv1d_bias, activation="silu")
    # keep the projection matmuls (and hence the scan I/O) in the activation
    # dtype — fp32 weights would silently promote everything to fp32
    x_dbl = jnp.einsum("bld,rd->blr", x, x_proj_weight.astype(x.dtype))
    delta = jnp.einsum(
        "blr,dr->bld", x_dbl[..., :delta_rank],
        delta_proj_weight.astype(x.dtype))
    B = x_dbl[..., delta_rank : delta_rank + dstate]
    C = x_dbl[..., delta_rank + dstate :]
    return x, z, delta, B, C


def mamba_inner(
    xz,
    conv1d_weight,
    conv1d_bias,
    x_proj_weight,
    delta_proj_weight,
    A,
    D=None,
    delta_bias=None,
    out_proj_weight=None,
    out_proj_bias=None,
    delta_softplus=True,
    implementation=None,
):
    """Fused Mamba-block inner function, time-major.

    Args match ``refs.mamba_inner_ref``: xz (batch, L, 2*d_inner),
    conv1d_weight (width, d_inner), x_proj_weight (dt_rank+2*dstate, d_inner),
    delta_proj_weight (d_inner, dt_rank), A (d_inner, dstate).

    Returns (batch, L, d_inner), or (batch, L, d_model) with out_proj.
    """
    dstate = A.shape[1]
    x, z, delta, B, C = _pre_scan(
        xz, conv1d_weight, conv1d_bias, x_proj_weight, delta_proj_weight,
        dstate)
    y = selective_scan(
        x, delta, A, B, C, D=D, z=z, delta_bias=delta_bias,
        delta_softplus=delta_softplus, implementation=implementation)
    if out_proj_weight is not None:
        y = jnp.einsum("bld,od->blo", y, out_proj_weight)
        if out_proj_bias is not None:
            y = y + out_proj_bias[None, None, :]
    return y
