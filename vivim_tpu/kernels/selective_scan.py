"""Selective scan (Mamba S6 recurrence) — Pallas TPU kernel with custom VJP.

TPU-native re-design of the reference CUDA kernels
(/root/reference/mamba/csrc/selective_scan/selective_scan_fwd_kernel.cuh and
selective_scan_bwd_kernel.cuh).  Same algorithmic structure — a chunked
first-order linear-recurrence scan with a carried running prefix and
chunk-boundary states saved for the backward pass — but mapped to TPU:

- Grid ``(batch, d_inner/DT, L/CHUNK)`` with the L axis innermost and
  sequential; the running state lives in a VMEM scratch ``(N, DT)`` carried
  across chunk iterations (the CUDA version carries it in shared memory
  across 2048-element chunks, selective_scan_fwd_kernel.cuh:131-254).
- Within a chunk, the inclusive scan over pairs ``(exp(dt*A), dt*B*u)``
  under ``(a2,b2)∘(a1,b1) = (a1*a2, a2*b1 + b2)`` runs as a work-efficient
  ``jax.lax.associative_scan`` over the leading (untiled) chunk axis of
  ``(CHUNK, N, DT)`` fp32 VMEM values — the TPU analogue of the CUDA
  cub::BlockScan parallel prefix scan.
- The backward pass is itself a linear recurrence run in reverse
  (``g_t = C_t⊗dy_t + a_{t+1}*g_{t+1}``): one kernel visits chunks
  right-to-left, recomputes the forward states within each chunk from the
  saved chunk-start states (the CUDA bwd does the same,
  selective_scan_bwd_kernel.cuh:269-391), reverse-scans the adjoint, and
  emits all eight gradients without atomics (per-batch partials for
  dA/dD/ddelta_bias are reduced in VMEM across chunks and over batch
  outside the kernel).
- fp32 state and accumulation with bf16/fp32 I/O, matching the reference
  numerics contract (fp16/bf16 inputs, fp32 weights/state,
  selective_scan.cpp:14-26).

Layout is time-major: ``u/delta/z: (B, L, D)``, ``Bv/Cv: (B, L, N)``,
``A: (D, N)`` — D rides the 128-lane axis, N the sublane axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vivim_tpu.kernels import refs

import logging
import os

_log = logging.getLogger("vivim_tpu.kernels.selective_scan")

# 128 and 256 both fit the backward's VMEM envelope; 256 measures ~2%
# faster end-to-end on v5e (halves the grid-iteration overhead; 512 OOMs
# the backward's scoped vmem).
DEFAULT_CHUNK = int(os.environ.get("VIVIM_SCAN_CHUNK", 256))
DEFAULT_DTILE = 128

_NEG_INF = -1e9  # delta pad that softplus maps to 0 (=> a = exp(0*A) = 1)


def _take0(x):
    """x[0] without dynamic_slice (Mosaic-unsupported): static slice + reshape."""
    return jax.lax.slice_in_dim(x, 0, 1, axis=0).reshape(x.shape[1:])


def _take_last(x):
    n = x.shape[0]
    return jax.lax.slice_in_dim(x, n - 1, n, axis=0).reshape(x.shape[1:])


def _combine(left, right):
    """Associative combine for the first-order recurrence h' = a*h + b."""
    a1, b1 = left
    a2, b2 = right
    return a1 * a2, a2 * b1 + b2


def _chunk_scan(a, b):
    """Work-efficient inclusive scan of (a, b) pairs along axis 0.

    Recursive even/odd (Blelloch-style) decomposition using only
    leading-axis reshapes, concatenations and full-array elementwise ops —
    the forms Mosaic lowers well (jax.lax.associative_scan's strided and
    zero-length slices do not lower on TPU).  Requires len power of two.
    """
    C = a.shape[0]
    if C == 1:
        return a, b
    rest = a.shape[1:]
    ar = a.reshape((C // 2, 2) + rest)
    br = b.reshape((C // 2, 2) + rest)
    half = (C // 2,) + rest
    ae = jax.lax.slice_in_dim(ar, 0, 1, axis=1).reshape(half)
    ao = jax.lax.slice_in_dim(ar, 1, 2, axis=1).reshape(half)
    be = jax.lax.slice_in_dim(br, 0, 1, axis=1).reshape(half)
    bo = jax.lax.slice_in_dim(br, 1, 2, axis=1).reshape(half)
    # combine neighbor pairs (even is the left operand)
    a_pair = ae * ao
    b_pair = ao * be + bo
    oddA, oddB = _chunk_scan(a_pair, b_pair)  # inclusive scan at odd slots
    if C == 2:
        evenA, evenB = ae, be
    else:
        prevA = jnp.concatenate([jnp.ones_like(oddA[:1]), oddA[:-1]], axis=0)
        prevB = jnp.concatenate([jnp.zeros_like(oddB[:1]), oddB[:-1]], axis=0)
        evenA = prevA * ae
        evenB = ae * prevB + be
    outA = jnp.stack([evenA, oddA], axis=1).reshape((C,) + rest)
    outB = jnp.stack([evenB, oddB], axis=1).reshape((C,) + rest)
    return outA, outB


def _prefix_scan_b(a, b):
    """Inclusive prefix scan returning only the b chain (the carried state
    is folded into b[0] by the caller, so the cumulative-a chain that
    ``_chunk_scan`` also materializes is unnecessary — ~20% fewer VPU ops)."""
    C = a.shape[0]
    if C == 1:
        return b
    rest = a.shape[1:]
    half = (C // 2,) + rest
    ar = a.reshape((C // 2, 2) + rest)
    br = b.reshape((C // 2, 2) + rest)
    ae = jax.lax.slice_in_dim(ar, 0, 1, axis=1).reshape(half)
    ao = jax.lax.slice_in_dim(ar, 1, 2, axis=1).reshape(half)
    be = jax.lax.slice_in_dim(br, 0, 1, axis=1).reshape(half)
    bo = jax.lax.slice_in_dim(br, 1, 2, axis=1).reshape(half)
    a_pair = ae * ao
    b_pair = ao * be + bo
    oddB = _prefix_scan_b(a_pair, b_pair)
    if C == 2:
        evenB = be
    else:
        prevB = jnp.concatenate([jnp.zeros_like(oddB[:1]), oddB[:-1]], axis=0)
        evenB = ae * prevB + be
    return jnp.stack([evenB, oddB], axis=1).reshape((C,) + rest)


def _suffix_scan(a, b):
    """Suffix scan ``out[t] = b[t] + a[t] * out[t+1]`` along axis 0 (len
    power of two).  Used for the adjoint recurrence, which runs in reverse
    time — implemented directly rather than flip+scan+flip because lax.rev
    does not lower in Mosaic."""
    C = a.shape[0]
    if C == 1:
        return b
    rest = a.shape[1:]
    half = (C // 2,) + rest
    ar = a.reshape((C // 2, 2) + rest)
    br = b.reshape((C // 2, 2) + rest)
    a0 = jax.lax.slice_in_dim(ar, 0, 1, axis=1).reshape(half)
    a1 = jax.lax.slice_in_dim(ar, 1, 2, axis=1).reshape(half)
    b0 = jax.lax.slice_in_dim(br, 0, 1, axis=1).reshape(half)
    b1 = jax.lax.slice_in_dim(br, 1, 2, axis=1).reshape(half)
    a_pair = a0 * a1
    b_pair = b0 + a0 * b1
    even = _suffix_scan(a_pair, b_pair)       # S at even slots
    if C == 2:
        odd = b1
    else:
        next_even = jnp.concatenate(
            [even[1:], jnp.zeros_like(even[:1])], axis=0)
        odd = b1 + a1 * next_even
    return jnp.stack([even, odd], axis=1).reshape((C,) + rest)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(delta_ref, u_ref, B_ref, C_ref, z_ref, A_ref, D_ref, bias_ref,
                h0_ref, y_ref, cs_ref, ls_ref, state, *,
                softplus: bool, has_z: bool, save_cs: bool):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        state[...] = h0_ref[0].astype(jnp.float32)

    if save_cs:
        # Save the chunk-start state for the backward pass (cf. the CUDA fwd
        # kernel's x[b, d, chunk, 2*dstate] stash,
        # selective_scan_fwd_kernel.cuh:236-254).  Inference-only calls skip
        # this output entirely.
        cs_ref[0, 0] = state[...]

    dp = delta_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    if softplus:
        dp = jax.nn.softplus(dp)
    uf = u_ref[0].astype(jnp.float32)               # (C, DT)
    A = A_ref[0].astype(jnp.float32)                # (N, DT)
    a = jnp.exp(dp[:, None, :] * A[None])           # (C, N, DT)
    Bt = B_ref[0].astype(jnp.float32)               # (C, N)
    bu = (dp * uf)[:, None, :] * Bt[:, :, None]     # (C, N, DT)

    # fold the carried state into the first step: h = prefix-scan of b only
    bu = jnp.concatenate(
        [(_take0(bu) + _take0(a) * state[...])[None], bu[1:]], axis=0)
    h = _prefix_scan_b(a, bu)
    state[...] = _take_last(h)

    Ct = C_ref[0].astype(jnp.float32)               # (C, N)
    y = jnp.sum(h * Ct[:, :, None], axis=1)         # (C, DT)
    y = y + D_ref[0].astype(jnp.float32) * uf
    if has_z:
        # in-kernel gating is the INFERENCE path only; under autodiff the
        # gating runs outside the kernel (see _core_fwd) so the backward
        # kernel never touches z
        zf = z_ref[0].astype(jnp.float32)
        y = y * (zf * jax.nn.sigmoid(zf))
    y_ref[0] = y.astype(y_ref.dtype)

    @pl.when(k == nk - 1)
    def _():
        ls_ref[0] = state[...]


# ---------------------------------------------------------------------------
# Backward kernel (reverse-time scan; visits chunks right-to-left)
# ---------------------------------------------------------------------------


def _bwd_kernel(delta_ref, u_ref, B_ref, C_ref, A_ref, D_ref, bias_ref,
                dout_ref, dlast_ref, cs_ref,
                ddelta_ref, du_ref, dB_ref, dC_ref, dA_ref, dD_ref,
                dbias_ref, dh0_ref, g_carry, *, softplus: bool):
    # (the silu(z) gating and its gradients live OUTSIDE the kernel — the
    # training path never passes z; see _core_fwd/_core_bwd)
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    # Recompute the forward within this chunk from the saved start state.
    delta_raw = delta_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    dp = jax.nn.softplus(delta_raw) if softplus else delta_raw
    uf = u_ref[0].astype(jnp.float32)
    A = A_ref[0].astype(jnp.float32)                # (N, DT)
    a = jnp.exp(dp[:, None, :] * A[None])           # (C, N, DT)
    Bt = B_ref[0].astype(jnp.float32)
    Ct = C_ref[0].astype(jnp.float32)
    bu = (dp * uf)[:, None, :] * Bt[:, :, None]
    h0 = cs_ref[0, 0].astype(jnp.float32)           # (N, DT) chunk-start state
    bu = jnp.concatenate(
        [(_take0(bu) + _take0(a) * h0)[None], bu[1:]], axis=0)
    h = _prefix_scan_b(a, bu)
    h_prev = jnp.concatenate([h0[None], h[:-1]], axis=0)

    dy = dout_ref[0].astype(jnp.float32)            # (C, DT)
    Dsk = D_ref[0].astype(jnp.float32)

    dC = jnp.sum(h * dy[:, None, :], axis=2)        # (C, N)
    dC_ref[0] = dC.astype(dC_ref.dtype)
    dD_contrib = jnp.sum(dy * uf, axis=0)           # (DT,)

    # Adjoint reverse scan: g_t = C_t⊗dy_t + a_{t+1}·g_{t+1}.  The rightmost
    # visited chunk (k == 0 in reversed order) seeds the carry with the
    # cotangent of the final state.
    @pl.when(k == 0)
    def _():
        g_carry[...] = dlast_ref[0].astype(jnp.float32)

    v = dy[:, None, :] * Ct[:, :, None]             # (C, N, DT)
    v = jnp.concatenate([v[:-1], (_take_last(v) + g_carry[...])[None]], axis=0)
    a_shift = jnp.concatenate([a[1:], jnp.ones_like(a[:1])], axis=0)
    g = _suffix_scan(a_shift, v)                    # (C, N, DT)
    g_carry[...] = _take0(a) * _take0(g)

    gB = jnp.sum(g * Bt[:, :, None], axis=1)        # (C, DT)
    du = dp * gB + Dsk * dy
    du_ref[0] = du.astype(du_ref.dtype)
    dla = g * h_prev * a                            # d/d(dp*A)
    ddelta_post = uf * gB + jnp.sum(dla * A[None], axis=1)
    if softplus:
        ddelta_pre = ddelta_post * jax.nn.sigmoid(delta_raw)
    else:
        ddelta_pre = ddelta_post
    ddelta_ref[0] = ddelta_pre.astype(ddelta_ref.dtype)
    dB = jnp.sum(g * (dp * uf)[:, None, :], axis=2)  # (C, N)
    dB_ref[0] = dB.astype(dB_ref.dtype)

    dA_contrib = jnp.sum(dla * dp[:, None, :], axis=0)   # (N, DT)
    dbias_contrib = jnp.sum(ddelta_pre, axis=0)           # (DT,)

    # after the leftmost chunk, the carry is the initial-state gradient
    @pl.when(k == nk - 1)
    def _():
        dh0_ref[0] = g_carry[...]

    @pl.when(k == 0)
    def _():
        dA_ref[0] = dA_contrib
        dD_ref[0, 0] = dD_contrib
        dbias_ref[0, 0] = dbias_contrib

    @pl.when(k > 0)
    def _():
        dA_ref[0] += dA_contrib
        dD_ref[0, 0] += dD_contrib
        dbias_ref[0, 0] += dbias_contrib


# ---------------------------------------------------------------------------
# Host-side padding / invocation
# ---------------------------------------------------------------------------


def _pad_args(u, delta, B, C, z, A, Dskip, bias, softplus, chunk, dtile):
    """Pad L to a chunk multiple and D to a tile multiple (padding is inert:
    padded timesteps keep a == 1 so the carried state is unchanged).

    A may be (dim, N) shared or (batch, dim, N) per-batch (the batched
    tri-directional path stacks direction-specific parameters along batch);
    Dskip/bias likewise (dim,) or (batch, dim).  All are normalized to the
    batched form here.
    """
    batch, L, d = u.shape
    n = A.shape[-1]
    Lp, dp_ = _round_up(L, chunk), _round_up(d, dtile)
    pad_l, pad_d = Lp - L, dp_ - d
    delta_pad_value = _NEG_INF if softplus else 0.0
    if A.ndim == 2:
        A = jnp.broadcast_to(A[None], (batch,) + A.shape)
    if Dskip.ndim == 1:
        Dskip = jnp.broadcast_to(Dskip[None], (batch,) + Dskip.shape)
    if bias.ndim == 1:
        bias = jnp.broadcast_to(bias[None], (batch,) + bias.shape)
    if pad_l or pad_d:
        u = jnp.pad(u, ((0, 0), (0, pad_l), (0, pad_d)))
        delta = jnp.pad(delta, ((0, 0), (0, pad_l), (0, pad_d)),
                        constant_values=delta_pad_value)
        B = jnp.pad(B, ((0, 0), (0, pad_l), (0, 0)))
        C = jnp.pad(C, ((0, 0), (0, pad_l), (0, 0)))
        if z is not None:
            z = jnp.pad(z, ((0, 0), (0, pad_l), (0, pad_d)))
        A = jnp.pad(A, ((0, 0), (0, pad_d), (0, 0)))
        Dskip = jnp.pad(Dskip, ((0, 0), (0, pad_d)))
        bias = jnp.pad(bias, ((0, 0), (0, pad_d)))
    return u, delta, B, C, z, A, Dskip, bias, (batch, L, d, n, Lp, dp_)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_call(u, delta, A, B, C, Dskip, z, bias, h0, softplus, chunk, dtile,
              save_cs=True):
    u, delta, B, C, z, A, Dskip, bias, dims = _pad_args(
        u, delta, B, C, z, A, Dskip, bias, softplus, chunk, dtile)
    batch, L, d, n, Lp, dpad = dims
    if h0 is None:
        h0 = jnp.zeros((batch, n, dpad), jnp.float32)
    else:
        # public layout (B, dim, N) -> kernel layout (B, N, dim), padded
        h0 = jnp.swapaxes(h0.astype(jnp.float32), 1, 2)
        h0 = jnp.pad(h0, ((0, 0), (0, 0), (0, dpad - d)))
    nk, nd = Lp // chunk, dpad // dtile
    A_t = jnp.swapaxes(A, 1, 2).astype(jnp.float32)  # (B, N, Dp)
    D2 = Dskip.astype(jnp.float32)[:, None, :]       # (B, 1, Dp)
    b2 = bias.astype(jnp.float32)[:, None, :]        # (B, 1, Dp)
    has_z = z is not None

    ld_spec = pl.BlockSpec((1, chunk, dtile), lambda b, j, k: (b, k, j))
    ln_spec = pl.BlockSpec((1, chunk, n), lambda b, j, k: (b, k, 0))
    row_spec = pl.BlockSpec((1, 1, dtile), lambda b, j, k: (b, 0, j))

    in_specs = [ld_spec, ld_spec, ln_spec, ln_spec]
    inputs = [delta, u, B, C]
    if has_z:
        in_specs.append(ld_spec)
        inputs.append(z)
    else:
        in_specs.append(pl.BlockSpec((1, 1), lambda b, j, k: (0, 0)))
        inputs.append(jnp.zeros((1, 1), u.dtype))
    in_specs += [
        pl.BlockSpec((1, n, dtile), lambda b, j, k: (b, 0, j)),  # A
        row_spec, row_spec,
        pl.BlockSpec((1, n, dtile), lambda b, j, k: (b, 0, j)),  # h0
    ]
    inputs += [A_t, D2, b2, h0]

    kernel = functools.partial(_fwd_kernel, softplus=softplus, has_z=has_z,
                               save_cs=save_cs)
    cs_spec = (pl.BlockSpec((1, 1, n, dtile), lambda b, j, k: (b, k, 0, j))
               if save_cs else
               pl.BlockSpec((1, 1, n, dtile), lambda b, j, k: (0, 0, 0, 0)))
    cs_shape = ((batch, nk, n, dpad) if save_cs else (1, 1, n, dtile))
    y, chunk_states, last_state = pl.pallas_call(
        kernel,
        grid=(batch, nd, nk),
        in_specs=in_specs,
        out_specs=[
            ld_spec,
            cs_spec,
            pl.BlockSpec((1, n, dtile), lambda b, j, k: (b, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, Lp, dpad), u.dtype),
            jax.ShapeDtypeStruct(cs_shape, jnp.float32),
            jax.ShapeDtypeStruct((batch, n, dpad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((n, dtile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*inputs)
    # public layout for the state is (batch, dim, dstate), matching the ref
    return (y[:, :L, :d], chunk_states,
            jnp.swapaxes(last_state, 1, 2)[:, :d, :])


def _bwd_call(u, delta, A, B, C, Dskip, bias, chunk_states, dout,
              dlast, softplus, chunk, dtile):
    # (gradient w.r.t. the initial state is emitted as dh0; z never reaches
    # the backward kernel — the gating grads run in XLA, _core_bwd)
    u, delta, B, C, _, A, Dskip, bias, dims = _pad_args(
        u, delta, B, C, None, A, Dskip, bias, softplus, chunk, dtile)
    batch, L, d, n, Lp, dpad = dims
    nk, nd = Lp // chunk, dpad // dtile
    dout = jnp.pad(dout, ((0, 0), (0, Lp - L), (0, dpad - d)))
    dlast = jnp.swapaxes(dlast, 1, 2)  # (B, dim, N) -> kernel layout (B, N, dim)
    dlast = jnp.pad(dlast, ((0, 0), (0, 0), (0, dpad - d)))
    A_t = jnp.swapaxes(A, 1, 2).astype(jnp.float32)  # (B, N, Dp)
    D2 = Dskip.astype(jnp.float32)[:, None, :]       # (B, 1, Dp)
    b2 = bias.astype(jnp.float32)[:, None, :]        # (B, 1, Dp)

    # Visit chunks right-to-left: reverse the k index in every L-blocked map.
    rev = lambda b, j, k: (b, nk - 1 - k, j)
    rev_n = lambda b, j, k: (b, nk - 1 - k, 0)
    ld_spec = pl.BlockSpec((1, chunk, dtile), rev)
    ln_spec = pl.BlockSpec((1, chunk, n), rev_n)
    row_spec = pl.BlockSpec((1, 1, dtile), lambda b, j, k: (b, 0, j))

    in_specs = [
        ld_spec, ld_spec, ln_spec, ln_spec,
        pl.BlockSpec((1, n, dtile), lambda b, j, k: (b, 0, j)),  # A
        row_spec,
        row_spec,
        ld_spec,  # dout
        pl.BlockSpec((1, n, dtile), lambda b, j, k: (b, 0, j)),  # dlast
        pl.BlockSpec((1, 1, n, dtile), lambda b, j, k: (b, nk - 1 - k, 0, j)),
    ]
    inputs = [delta, u, B, C, A_t, D2, b2, dout, dlast, chunk_states]

    kernel = functools.partial(_bwd_kernel, softplus=softplus)
    f32 = jnp.float32
    # Sequence grads (ddelta/du/dz/dB/dC) are emitted in the activation
    # dtype: they feed straight into further bf16 backward matmuls, and f32
    # stores would double the kernel's HBM writes plus add separate
    # convert-element-type ops outside (~3 ms/step at the bench config).
    # Parameter grads (dA/dD/dbias/dh0) stay f32 — they are reduced over
    # batch/chunks and feed fp32 parameter islands.
    seq_dt = u.dtype
    outs = pl.pallas_call(
        kernel,
        grid=(batch, nd, nk),
        in_specs=in_specs,
        out_specs=[
            ld_spec,                                             # ddelta
            ld_spec,                                             # du
            ln_spec,                                             # dB
            ln_spec,                                             # dC
            pl.BlockSpec((1, n, dtile), lambda b, j, k: (b, 0, j)),  # dA part
            pl.BlockSpec((1, 1, dtile), lambda b, j, k: (b, 0, j)),   # dD part
            pl.BlockSpec((1, 1, dtile), lambda b, j, k: (b, 0, j)),   # dbias part
            pl.BlockSpec((1, n, dtile), lambda b, j, k: (b, 0, j)),   # dh0
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, Lp, dpad), seq_dt),
            jax.ShapeDtypeStruct((batch, Lp, dpad), seq_dt),
            jax.ShapeDtypeStruct((batch, Lp, n), seq_dt),
            jax.ShapeDtypeStruct((batch, Lp, n), seq_dt),
            jax.ShapeDtypeStruct((batch, n, dpad), f32),
            jax.ShapeDtypeStruct((batch, 1, dpad), f32),
            jax.ShapeDtypeStruct((batch, 1, dpad), f32),
            jax.ShapeDtypeStruct((batch, n, dpad), f32),
        ],
        scratch_shapes=[pltpu.VMEM((n, dtile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*inputs)
    ddelta, du, dB, dC, dA_p, dD_p, dbias_p, dh0 = outs
    ddelta = ddelta[:, :L, :d]
    du = du[:, :L, :d]
    dB = dB[:, :L, :]
    dC = dC[:, :L, :]
    # per-batch parameter grads (B, dim, N) / (B, dim); the caller reduces
    # over batch when the input parameter was shared
    dA = jnp.swapaxes(dA_p, 1, 2)[:, :d, :]
    dD = dD_p[:, 0, :d]
    dbias = dbias_p[:, 0, :d]
    dh0 = jnp.swapaxes(dh0, 1, 2)[:, :d, :]  # -> (B, dim, N)
    return ddelta, du, dB, dC, dA, dD, dbias, dh0


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def _selective_scan_core(u, delta, A, B, C, Dskip, z, delta_bias, h0,
                         delta_softplus, chunk, dtile):
    y, _, last_state = _fwd_call(u, delta, A, B, C, Dskip, z, delta_bias,
                                 h0, delta_softplus, chunk, dtile,
                                 save_cs=False)
    return y, last_state


def _core_fwd(u, delta, A, B, C, Dskip, z, delta_bias, h0, delta_softplus,
              chunk, dtile):
    # Training path: the silu(z) gating runs OUTSIDE the kernel.  The
    # kernel then never touches z (fwd saves one gated-y store; the
    # backward kernel drops the z read, the y_pre read, the dz write and
    # all the silu math — ~3 HBM arrays/layer), and XLA fuses the gating
    # with the surrounding elementwise chains (the z slice of xz never
    # materializes).  The inference primal (`_selective_scan_core`) keeps
    # in-kernel gating — no y_pre round-trip there.
    y_pre, chunk_states, last_state = _fwd_call(
        u, delta, A, B, C, Dskip, None, delta_bias, h0, delta_softplus,
        chunk, dtile)
    if z is not None:
        zf = z.astype(jnp.float32)
        y = (y_pre.astype(jnp.float32) * (zf * jax.nn.sigmoid(zf))).astype(
            y_pre.dtype)
    else:
        y = y_pre
    return (y, last_state), (u, delta, A, B, C, Dskip, z, delta_bias, h0,
                             chunk_states, y_pre)


def _core_bwd(delta_softplus, chunk, dtile, res, cts):
    u, delta, A, B, C, Dskip, z, delta_bias, h0, chunk_states, y_pre = res
    dout, dlast = cts
    if z is not None:
        # gating grads in XLA (fused elementwise); the kernel sees the
        # pre-gate cotangent and no z at all
        zf = z.astype(jnp.float32)
        sig = jax.nn.sigmoid(zf)
        silu = zf * sig
        doutf = dout.astype(jnp.float32)
        dz = (doutf * y_pre.astype(jnp.float32)
              * (sig + silu * (1.0 - sig))).astype(z.dtype)
        dout = (doutf * silu).astype(dout.dtype)
    else:
        dz = None
    ddelta, du, dB, dC, dA, dD, dbias, dh0 = _bwd_call(
        u, delta, A, B, C, Dskip, delta_bias, chunk_states,
        dout, dlast.astype(jnp.float32),
        delta_softplus, chunk, dtile)
    if A.ndim == 2:
        dA = jnp.sum(dA, axis=0)
    if Dskip.ndim == 1:
        dD = jnp.sum(dD, axis=0)
    if delta_bias.ndim == 1:
        dbias = jnp.sum(dbias, axis=0)
    cast = lambda g, x: g.astype(x.dtype)
    return (cast(du, u), cast(ddelta, delta), cast(dA, A), cast(dB, B),
            cast(dC, C), cast(dD, Dskip),
            cast(dz, z) if z is not None else None,
            cast(dbias, delta_bias),
            cast(dh0, h0) if h0 is not None else None)


_selective_scan_core.defvjp(_core_fwd, _core_bwd)


def selective_scan(
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
    implementation=None,
    chunk=DEFAULT_CHUNK,
    dtile=DEFAULT_DTILE,
    seq_axis=None,
    mesh=None,
):
    """Selective scan, time-major: see ``refs.selective_scan_ref`` for the
    semantic contract.  ``implementation``: "pallas" (default; interpreted
    off-TPU) or "ref" (sequential lax.scan).  Variable (input-dependent)
    B and C of shape (batch, L, dstate) run the Pallas path directly;
    grouped 4-D (batch, L, groups, dstate) B/C also run the Pallas kernel,
    via group->batch folding (``_grouped_selective_scan``).  Constant
    (dim, dstate) B or C — including mixed constant+grouped — falls back
    to the sequential reference implementation.
    ``initial_state``: (batch, dim, dstate) carried scan state (streaming /
    sequence-parallel shards); differentiable.

    ``seq_axis`` + ``mesh``: shard the L axis over the named mesh axis and
    run the sequence-parallel two-pass scan (a shard_map island inside the
    surrounding pjit program; parallel/seq_scan.py).  Requires
    delta_softplus=True and no initial_state.
    """
    n_shards = (dict(zip(mesh.axis_names, mesh.devices.shape))[seq_axis]
                if (seq_axis is not None and mesh is not None) else 1)
    if n_shards > 1:
        # One structured line per compile (this dispatch runs at trace
        # time): seq_axis users can see which layers actually sharded vs
        # fell back on L-divisibility.
        if u.shape[1] % n_shards == 0:
            _log.info("seq-sharded scan: L=%d sharded over %d '%s' devices "
                      "(shape %s)", u.shape[1], n_shards, seq_axis,
                      u.shape)
        else:
            _log.info("seq-shard FALLBACK: L=%d %% %d shards != 0 -> "
                      "single-device scan (shape %s)", u.shape[1], n_shards,
                      u.shape)
    if n_shards > 1 and u.shape[1] % n_shards == 0:
        # L indivisible by the axis falls through to the single-device scan
        # (deep Vivim stages have tiny L; the long-clip win is at the
        # high-resolution stages)
        from vivim_tpu.parallel.seq_scan import seq_sharded_selective_scan

        if not delta_softplus or initial_state is not None:
            raise ValueError(
                "seq-sharded scan requires delta_softplus=True and no "
                "initial_state")
        y, last = seq_sharded_selective_scan(
            u, delta, A, B, C, D=D, z=z, delta_bias=delta_bias,
            mesh=mesh, axis_name=seq_axis, implementation=implementation)
        return (y, last) if return_last_state else y
    if B.ndim == 4 or C.ndim == 4:
        # grouped variable B/C (n_groups > 1): contiguous channel blocks of
        # size dim/G share one (dstate,) B/C per timestep (the reference
        # kernel's (batch, groups, dstate, L) surface,
        # selective_scan.cpp:254-268).  Mapped to TPU by FOLDING GROUPS INTO
        # THE BATCH AXIS — the scan is independent per channel and the
        # kernel already supports per-batch A/D/bias, so (b, L, d) becomes
        # (b*G, L, d/G) and the same Pallas grid runs unchanged.
        if B.ndim >= 3 and C.ndim >= 3:
            return _grouped_selective_scan(
                u, delta, A, B, C, D, z, delta_bias, delta_softplus,
                return_last_state, initial_state, implementation, chunk,
                dtile)
        # mixed constant + grouped (the reference's is_variable_B/C are
        # independent toggles): the constant side is a per-CHANNEL
        # (dim, dstate) matrix, which group->batch folding cannot express
        # as a per-position B/C — use the sequential reference, which
        # handles each side independently.
        return refs.selective_scan_ref(
            u, delta, A, B, C, D, z, delta_bias, delta_softplus,
            return_last_state, initial_state=initial_state)
    if implementation == "ref" or B.ndim != 3 or C.ndim != 3:
        return refs.selective_scan_ref(
            u, delta, A, B, C, D, z, delta_bias, delta_softplus,
            return_last_state, initial_state=initial_state)
    if chunk & (chunk - 1):
        raise ValueError(f"chunk must be a power of two, got {chunk}")
    if chunk > 256:
        # the backward holds ~7 (chunk, N, 128) fp32 arrays in VMEM
        # (~56KB * chunk with N=16); 512 exceeds the 16MB scoped-vmem limit.
        # 128 and 256 measure within noise of each other on v5e.
        raise ValueError(f"chunk {chunk} exceeds the VMEM envelope (max 256)")
    d = u.shape[-1]
    Dskip = jnp.zeros((d,), jnp.float32) if D is None else D
    bias = jnp.zeros((d,), jnp.float32) if delta_bias is None else delta_bias
    dtile = min(dtile, _round_up(d, 128))
    y, last_state = _selective_scan_core(
        u, delta, A, B, C, Dskip, z, bias, initial_state, delta_softplus,
        chunk, dtile)
    return (y, last_state) if return_last_state else y


def _grouped_selective_scan(u, delta, A, B, C, D, z, delta_bias,
                            delta_softplus, return_last_state, initial_state,
                            implementation, chunk, dtile):
    """Grouped-B/C dispatch: fold the group axis into batch and recurse.

    All reshapes are linear, so autodiff flows straight through to the
    custom-VJP core; both the Pallas and ref implementations are reached
    with plain (b*G, L, d/G) shapes.
    """
    batch, L, d = u.shape
    G = B.shape[2] if B.ndim == 4 else C.shape[2]
    if d % G:
        raise ValueError(f"dim {d} not divisible by n_groups {G}")
    dpg = d // G

    def fold_seq(x):  # (b, L, d) -> (b*G, L, d/G)
        if x is None:
            return None
        return (x.reshape(batch, L, G, dpg).transpose(0, 2, 1, 3)
                .reshape(batch * G, L, dpg))

    def fold_bc(x):  # (b, L, G, n) -> (b*G, L, n); (b, L, n) broadcasts
        if x.ndim == 3:
            x = jnp.broadcast_to(x[:, :, None, :],
                                 (batch, L, G, x.shape[-1]))
        return x.transpose(0, 2, 1, 3).reshape(batch * G, L, x.shape[-1])

    def fold_param(p, base_ndim):
        """(d, ...) shared or (b, d, ...) per-batch -> per-batch
        (b*G, d/G, ...).  ``base_ndim`` is the shared form's rank (2 for A,
        1 for D/delta_bias), disambiguating d == batch coincidences."""
        if p is None:
            return None
        if p.ndim == base_ndim + 1:  # already per-batch
            rest = p.shape[2:]
            return p.reshape((batch, G, dpg) + rest).reshape(
                (batch * G, dpg) + rest)
        rest = p.shape[1:]
        pg = p.reshape((G, dpg) + rest)
        return jnp.broadcast_to(pg[None], (batch,) + pg.shape).reshape(
            (batch * G, dpg) + rest)

    h0 = None
    if initial_state is not None:
        h0 = initial_state.reshape(batch, G, dpg, -1).reshape(
            batch * G, dpg, -1)
    out = selective_scan(
        fold_seq(u), fold_seq(delta), fold_param(A, 2), fold_bc(B),
        fold_bc(C), D=fold_param(D, 1), z=fold_seq(z),
        delta_bias=fold_param(delta_bias, 1),
        delta_softplus=delta_softplus, return_last_state=return_last_state,
        initial_state=h0, implementation=implementation, chunk=chunk,
        dtile=dtile)
    unfold = lambda y: (y.reshape(batch, G, L, dpg).transpose(0, 2, 1, 3)
                        .reshape(batch, L, d))
    if return_last_state:
        y, last = out
        last = last.reshape(batch, G, dpg, -1).reshape(batch, d, -1)
        return unfold(y), last
    return unfold(out)


def selective_scan_cm(u, delta, A, B, C, D=None, z=None, delta_bias=None,
                      delta_softplus=False, return_last_state=False,
                      **kwargs):
    """Channel-major ``(batch, dim, L)`` wrapper with the exact reference
    signature (selective_scan_fn, selective_scan_interface.py:59-83) around
    the time-major Pallas kernel.  Grouped B/C arrive in the reference
    layout (batch, groups, dstate, L) and are moved to time-major
    (batch, L, groups, dstate)."""
    tm = lambda x: jnp.swapaxes(x, 1, 2) if x is not None else None
    bc = lambda x: (x.transpose(0, 3, 1, 2) if x.ndim == 4
                    else (tm(x) if x.ndim == 3 else x))
    B_ = bc(B)
    C_ = bc(C)
    out = selective_scan(tm(u), tm(delta), A, B_, C_, D, tm(z), delta_bias,
                         delta_softplus, return_last_state, **kwargs)
    if return_last_state:
        y, last = out
        return tm(y), last
    return tm(out)
