"""Causal depthwise conv1d — TPU implementation.

The reference implements this as a CUDA kernel
(/root/reference/causal-conv1d/csrc/causal_conv1d_fwd.cu and _bwd.cu) because
on GPU the launch/memory cost of an unfused width-4 depthwise conv is large.
On TPU the op is a handful of vector shifts and FMAs that XLA fuses into the
surrounding computation (it rides the VPU with the 128-wide ``dim`` axis on
lanes), so the production implementation is plain jnp — no kernel needed.
The streaming ``update`` op (causal_conv1d_update.cu:46-67) is a functional
state-carrying step used by the decode path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def causal_conv1d(x, weight, bias=None, activation=None):
    """Depthwise causal conv, time-major.

    Args:
      x: (batch, L, dim).
      weight: (width, dim) — width in [2, 4] typically.
      bias: (dim,) optional.
      activation: None | "silu" | "swish".

    Returns: (batch, L, dim) in x.dtype.
    """
    if activation not in (None, "silu", "swish"):
        raise NotImplementedError("activation must be None, silu, or swish")
    dtype_in = x.dtype
    width = weight.shape[0]
    xf = x.astype(jnp.float32)
    wf = weight.astype(jnp.float32)
    # Left-pad once, then accumulate `width` shifted slices — XLA fuses this
    # into a few vector ops; avoids conv_general_dilated's im2col overhead
    # for tiny depthwise widths.
    L = x.shape[1]
    xp = jnp.pad(xf, ((0, 0), (width - 1, 0), (0, 0)))
    out = xp[:, 0:L, :] * wf[0][None, None, :]
    for w in range(1, width):
        out = out + xp[:, w : w + L, :] * wf[w][None, None, :]
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, None, :]
    if activation is not None:
        out = jax.nn.silu(out)
    return out.astype(dtype_in)


def causal_conv1d_cm(x, weight, bias=None, activation=None):
    """Channel-major wrapper with the exact reference signature
    (causal_conv1d_fn, causal_conv1d_interface.py:14-46): ``x`` is
    (batch, dim, seqlen) and ``weight`` is (dim, width).  Transposes to the
    time-major production layout and back."""
    out = causal_conv1d(jnp.swapaxes(x, 1, 2), weight.T, bias, activation)
    return jnp.swapaxes(out, 1, 2)


def causal_conv1d_update(x, conv_state, weight, bias=None, activation=None):
    """Streaming single-step conv (functional state update).

    Args:
      x: (batch, dim) new token.
      conv_state: (batch, width, dim) rolling window of past inputs.
      weight: (width, dim); bias: (dim,) optional.

    Returns: (out (batch, dim), new_conv_state).
    """
    if activation not in (None, "silu", "swish"):
        raise NotImplementedError("activation must be None, silu, or swish")
    dtype_in = x.dtype
    new_state = jnp.concatenate([conv_state[:, 1:, :], x[:, None, :]], axis=1)
    out = jnp.sum(new_state.astype(jnp.float32) * weight.astype(jnp.float32)[None], axis=1)
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :]
    if activation is not None:
        out = jax.nn.silu(out)
    return out.astype(dtype_in), new_state
