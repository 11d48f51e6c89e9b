"""Pure-jnp reference implementations — the ground-truth semantics.

These are sequential, memory-light, differentiable references used to
validate the Pallas kernels, mirroring the reference project's ref-twin
pattern (every CUDA/Triton kernel ships a pure-PyTorch reference next to
it).  Behavioral contracts:

- ``selective_scan_ref``:  semantics of
  /root/reference/mamba/mamba_ssm/ops/selective_scan_interface.py:86-152
  (``selective_scan_ref``): first-order linear recurrence
  ``x_t = exp(dt*A) * x_{t-1} + dt*B_t*u_t``, ``y_t = C_t . x_t + D*u_t``,
  gated by ``silu(z)``, computed in fp32 and cast back to the input dtype.
- ``causal_conv1d_ref``:  semantics of
  /root/reference/causal-conv1d/causal_conv1d/causal_conv1d_interface.py:49-66
  (depthwise causal conv of width 2-4, optional fused SiLU).
- ``causal_conv1d_update_ref`` / ``selective_state_update_ref``: streaming
  single-token variants
  (causal_conv1d_interface.py:83-105,
  mamba_ssm/ops/triton/selective_state_update.py:157-192) — functional
  (state in, state out) rather than in-place.
- ``mamba_inner_ref``: the fused path
  conv1d -> x_proj -> (dt, B, C) split -> dt_proj -> selective_scan(z-gated)
  of mamba_ssm/ops/selective_scan_interface.py:155-289
  (``MambaInnerFnNoOutProj``), optionally + out_proj.

Layout convention: this framework is **time-major** — activations are
``(batch, seqlen, dim)`` (the natural TPU layout where ``dim`` rides the
128-wide lane axis).  The reference project is channel-major
``(batch, dim, seqlen)``; channel-major parity wrappers with the exact
reference signature are provided for test/parity use.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Selective scan
# ---------------------------------------------------------------------------


def selective_scan_ref(
    u,
    delta,
    A,
    B,
    C,
    D=None,
    z=None,
    delta_bias=None,
    delta_softplus=False,
    return_last_state=False,
    initial_state=None,
):
    """Sequential selective-scan reference, time-major layout.

    Args:
      u:      (batch, L, dim) input sequence.
      delta:  (batch, L, dim) timestep.
      A:      (dim, dstate) state matrix (real; S4D-real init is ``-exp(A_log)``).
      B:      (batch, L, dstate), (batch, L, groups, dstate) grouped, or
              (dim, dstate) constant input matrix.  Grouped B/C assign
              contiguous channel blocks of size dim/groups to each group
              (the reference kernel's layout is (batch, groups, dstate, L)
              with group = channel // (dim/groups),
              selective_scan.cpp:254-268).
      C:      same shapes as B.
      D:      (dim,) skip connection, optional.
      z:      (batch, L, dim) gate, optional — output is multiplied by silu(z).
      delta_bias: (dim,) added to delta before softplus, optional.
      delta_softplus: apply softplus to delta.
      return_last_state: also return the final (batch, dim, dstate) state.
      initial_state: (batch, dim, dstate) starting state (zeros if None).

    Returns:
      out: (batch, L, dim), cast back to u.dtype;
      optionally (out, last_state) with last_state in fp32.
    """
    dtype_in = u.dtype
    u = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    if delta_bias is not None:
        db = delta_bias.astype(jnp.float32)
        delta = delta + (db[:, None, :] if db.ndim == 2 else db[None, None, :])
    if delta_softplus:
        delta = jax.nn.softplus(delta)
    batch, seqlen, dim = u.shape
    dstate = A.shape[-1]
    # A may be (dim, N) shared or (batch, dim, N) per-batch
    A = A.astype(jnp.float32)
    if A.ndim == 2:
        A = jnp.broadcast_to(A[None], (batch, dim, dstate))
    is_variable_B = B.ndim >= 3
    is_variable_C = C.ndim >= 3
    B = B.astype(jnp.float32)
    C = C.astype(jnp.float32)
    # grouped variable B/C: (b, L, G, n) -> per-channel (b, L, d, n) by
    # repeating each group over its contiguous dim/G channel block
    if B.ndim == 4:
        B = jnp.repeat(B, dim // B.shape[2], axis=2).reshape(
            batch, seqlen, dim, dstate)
    if C.ndim == 4:
        C = jnp.repeat(C, dim // C.shape[2], axis=2).reshape(
            batch, seqlen, dim, dstate)
    per_channel_B = is_variable_B and B.ndim == 4
    per_channel_C = is_variable_C and C.ndim == 4

    x0 = (
        jnp.zeros((batch, dim, dstate), jnp.float32)
        if initial_state is None
        else initial_state.astype(jnp.float32)
    )

    def step(x, inputs):
        delta_t, u_t, B_t, C_t = inputs  # (b,d), (b,d), (b,n)|(b,d,n)|None
        dA = jnp.exp(delta_t[:, :, None] * A)  # (b, d, n)
        if per_channel_B:
            dBu = delta_t[:, :, None] * B_t * u_t[:, :, None]
        elif is_variable_B:
            dBu = delta_t[:, :, None] * B_t[:, None, :] * u_t[:, :, None]
        else:
            dBu = delta_t[:, :, None] * B[None, :, :] * u_t[:, :, None]
        x = dA * x + dBu  # (b, d, n)
        if per_channel_C:
            y = jnp.einsum("bdn,bdn->bd", x, C_t)
        elif is_variable_C:
            y = jnp.einsum("bdn,bn->bd", x, C_t)
        else:
            y = jnp.einsum("bdn,dn->bd", x, C)
        return x, y

    # time-major scan inputs
    delta_t = jnp.moveaxis(delta, 1, 0)  # (L, b, d)
    u_t = jnp.moveaxis(u, 1, 0)
    B_t = jnp.moveaxis(B, 1, 0) if is_variable_B else jnp.zeros((seqlen, 0))
    C_t = jnp.moveaxis(C, 1, 0) if is_variable_C else jnp.zeros((seqlen, 0))
    last_state, ys = jax.lax.scan(step, x0, (delta_t, u_t, B_t, C_t))
    y = jnp.moveaxis(ys, 0, 1)  # (b, L, d)

    if D is None:
        out = y
    else:
        Df = D.astype(jnp.float32)
        out = y + u * (Df[:, None, :] if Df.ndim == 2 else Df[None, None, :])
    if z is not None:
        z = z.astype(jnp.float32)
        out = out * jax.nn.silu(z)
    out = out.astype(dtype_in)
    return (out, last_state) if return_last_state else out


def selective_scan_ref_cm(
    u,
    delta,
    A,
    B,
    C,
    D=None,
    z=None,
    delta_bias=None,
    delta_softplus=False,
    return_last_state=False,
):
    """Channel-major ``(batch, dim, L)`` parity wrapper matching the exact
    reference signature (selective_scan_interface.py:86-152)."""
    tm = lambda x: jnp.swapaxes(x, 1, 2) if x is not None else None
    B_ = tm(B) if B.ndim == 3 else B  # (b, n, L) -> (b, L, n)
    C_ = tm(C) if C.ndim == 3 else C
    out = selective_scan_ref(
        tm(u), tm(delta), A, B_, C_, D, tm(z), delta_bias, delta_softplus,
        return_last_state,
    )
    if return_last_state:
        out, last = out
        return tm(out), last
    return tm(out)


# ---------------------------------------------------------------------------
# Causal depthwise conv1d
# ---------------------------------------------------------------------------


def causal_conv1d_ref(x, weight, bias=None, activation=None):
    """Depthwise causal conv reference, time-major.

    Args:
      x: (batch, L, dim); weight: (width, dim); bias: (dim,) optional;
      activation: None | "silu" | "swish".

    ``y[b, l, d] = sum_w x[b, l - (width-1) + w, d] * weight[w, d]`` with
    zero left-padding (causal), then optional SiLU.  Matches
    causal_conv1d_interface.py:49-66 transposed to time-major.
    """
    if activation not in (None, "silu", "swish"):
        raise NotImplementedError("activation must be None, silu, or swish")
    dtype_in = x.dtype
    x = x.astype(weight.dtype)
    width = weight.shape[0]
    out = jnp.zeros_like(x)
    for w in range(width):
        shift = width - 1 - w
        xs = jnp.pad(x, ((0, 0), (shift, 0), (0, 0)))[:, : x.shape[1], :]
        out = out + xs * weight[w][None, None, :]
    if bias is not None:
        out = out + bias[None, None, :]
    if activation is not None:
        out = jax.nn.silu(out)
    return out.astype(dtype_in)


def causal_conv1d_update_ref(x, conv_state, weight, bias=None, activation=None):
    """Streaming single-step conv: roll state, append x, dot with weight.

    Functional version of causal_conv1d_interface.py:83-105.

    Args:
      x: (batch, dim); conv_state: (batch, width, dim); weight: (width, dim).

    Returns:
      (out (batch, dim), new_conv_state (batch, width, dim))
    """
    if activation not in (None, "silu", "swish"):
        raise NotImplementedError("activation must be None, silu, or swish")
    dtype_in = x.dtype
    conv_state = jnp.concatenate([conv_state[:, 1:, :], x[:, None, :]], axis=1)
    out = jnp.sum(conv_state * weight[None], axis=1)
    if bias is not None:
        out = out + bias[None, :]
    if activation is not None:
        out = jax.nn.silu(out)
    return out.astype(dtype_in), conv_state


def selective_state_update_ref(
    state, x, dt, A, B, C, D=None, z=None, dt_bias=None, dt_softplus=False
):
    """Single-token SSM recurrence (streaming decode step).

    Functional version of
    mamba_ssm/ops/triton/selective_state_update.py:157-192:
    ``state' = state*exp(dt*A) + dt*B*x;  out = C . state' + D*x; out*silu(z)``.

    Args:
      state: (batch, dim, dstate); x/dt/z: (batch, dim);
      A: (dim, dstate); B/C: (batch, dstate); D: (dim,).

    Returns: (out (batch, dim), new_state (batch, dim, dstate)).
    """
    dtype_in = x.dtype
    dt = dt.astype(jnp.float32)
    if dt_bias is not None:
        dt = dt + dt_bias.astype(jnp.float32)[None, :]
    if dt_softplus:
        dt = jax.nn.softplus(dt)
    xf = x.astype(jnp.float32)
    dA = jnp.exp(dt[:, :, None] * A.astype(jnp.float32)[None])  # (b, d, n)
    dB = dt[:, :, None] * B.astype(jnp.float32)[:, None, :]  # (b, d, n)
    new_state = state.astype(jnp.float32) * dA + dB * xf[:, :, None]
    out = jnp.einsum("bdn,bn->bd", new_state, C.astype(jnp.float32))
    if D is not None:
        out = out + D.astype(jnp.float32)[None, :] * xf
    if z is not None:
        out = out * jax.nn.silu(z.astype(jnp.float32))
    return out.astype(dtype_in), new_state.astype(state.dtype)


# ---------------------------------------------------------------------------
# Fused mamba inner reference
# ---------------------------------------------------------------------------


def mamba_inner_ref(
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
    scan_fn=None,
):
    """Fused Mamba-block inner function (time-major).

    Semantics of mamba_inner_fn_no_out_proj / mamba_inner_fn
    (selective_scan_interface.py:155-434, refs at :636-671) with
    input-dependent B and C:

      x, z = split(xz);  x = silu(causal_conv1d(x));
      dt, B, C = split(x @ x_proj^T);  delta = dt @ delta_proj^T;
      y = selective_scan(x, delta, A, B, C, D, z=z, softplus)
      out = y (@ out_proj^T + bias, if given)

    Args:
      xz: (batch, L, 2*d_inner) — concatenation of x and z on the last axis.
      conv1d_weight: (width, d_inner); conv1d_bias: (d_inner,) or None.
      x_proj_weight: (dt_rank + 2*dstate, d_inner).
      delta_proj_weight: (d_inner, dt_rank).
      A: (d_inner, dstate); D: (d_inner,); delta_bias: (d_inner,).
      out_proj_weight: (d_model, d_inner) optional; out_proj_bias optional.
      scan_fn: selective-scan implementation (defaults to selective_scan_ref).

    Returns: (batch, L, d_inner) if no out_proj, else (batch, L, d_model).
    """
    if scan_fn is None:
        scan_fn = selective_scan_ref
    d_inner = xz.shape[-1] // 2
    delta_rank = delta_proj_weight.shape[1]
    dstate = A.shape[1]
    x, z = xz[..., :d_inner], xz[..., d_inner:]
    x = causal_conv1d_ref(x, conv1d_weight, conv1d_bias, activation="silu")
    x_dbl = jnp.einsum("bld,rd->blr", x, x_proj_weight)
    dt = x_dbl[..., :delta_rank]
    B = x_dbl[..., delta_rank : delta_rank + dstate]
    C = x_dbl[..., delta_rank + dstate :]
    delta = jnp.einsum("blr,dr->bld", dt, delta_proj_weight)
    y = scan_fn(
        x, delta, A, B, C, D=D, z=z, delta_bias=delta_bias,
        delta_softplus=delta_softplus,
    )
    if out_proj_weight is not None:
        y = jnp.einsum("bld,od->blo", y, out_proj_weight)
        if out_proj_bias is not None:
            y = y + out_proj_bias[None, None, :]
    return y
