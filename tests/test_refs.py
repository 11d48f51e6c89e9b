"""Validate the jnp reference kernels against independent numpy loops.

The numpy implementations here are written directly from the recurrence
definition (x' = exp(dt*A)x + dt*B*u; y = C.x + D*u; out = y*silu(z)) and
serve as an implementation-independent oracle for refs.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vivim_tpu.kernels import refs


def _np_silu(x):
    return x / (1.0 + np.exp(-x))


def _np_softplus(x):
    return np.logaddexp(0.0, x)


def np_selective_scan(u, delta, A, B, C, D=None, z=None, delta_bias=None,
                      delta_softplus=False):
    b, L, d = u.shape
    n = A.shape[1]
    delta = delta.astype(np.float64)
    if delta_bias is not None:
        delta = delta + delta_bias[None, None, :]
    if delta_softplus:
        delta = _np_softplus(delta)
    x = np.zeros((b, d, n))
    out = np.zeros((b, L, d))
    for t in range(L):
        dA = np.exp(delta[:, t, :, None] * A[None])
        dBu = delta[:, t, :, None] * B[:, t, None, :] * u[:, t, :, None]
        x = dA * x + dBu
        out[:, t] = np.einsum("bdn,bn->bd", x, C[:, t])
    if D is not None:
        out = out + u * D[None, None, :]
    if z is not None:
        out = out * _np_silu(z)
    return out, x


@pytest.mark.parametrize("L", [1, 7, 64])
@pytest.mark.parametrize("with_extras", [False, True])
def test_selective_scan_ref_matches_numpy(L, with_extras):
    rng = np.random.default_rng(0)
    b, d, n = 2, 6, 4
    u = rng.standard_normal((b, L, d)).astype(np.float32)
    delta = (0.5 * rng.standard_normal((b, L, d))).astype(np.float32)
    A = (-0.5 - rng.random((d, n))).astype(np.float32)
    B = rng.standard_normal((b, L, n)).astype(np.float32)
    C = rng.standard_normal((b, L, n)).astype(np.float32)
    D = rng.standard_normal(d).astype(np.float32) if with_extras else None
    z = rng.standard_normal((b, L, d)).astype(np.float32) if with_extras else None
    bias = (0.1 * rng.standard_normal(d)).astype(np.float32) if with_extras else None

    want, want_last = np_selective_scan(
        u, delta, A, B, C, D, z, bias, delta_softplus=with_extras)
    got, got_last = refs.selective_scan_ref(
        jnp.asarray(u), jnp.asarray(delta), jnp.asarray(A), jnp.asarray(B),
        jnp.asarray(C), None if D is None else jnp.asarray(D),
        None if z is None else jnp.asarray(z),
        None if bias is None else jnp.asarray(bias),
        delta_softplus=with_extras, return_last_state=True)
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=2e-3)
    np.testing.assert_allclose(got_last, want_last, rtol=3e-3, atol=2e-3)


def test_selective_scan_ref_constant_BC():
    rng = np.random.default_rng(1)
    b, L, d, n = 2, 9, 5, 3
    u = rng.standard_normal((b, L, d)).astype(np.float32)
    delta = np.abs(rng.standard_normal((b, L, d))).astype(np.float32)
    A = (-0.5 - rng.random((d, n))).astype(np.float32)
    B = rng.standard_normal((d, n)).astype(np.float32)
    C = rng.standard_normal((d, n)).astype(np.float32)

    x = np.zeros((b, d, n))
    want = np.zeros((b, L, d))
    for t in range(L):
        dA = np.exp(delta[:, t, :, None] * A[None])
        x = dA * x + delta[:, t, :, None] * B[None] * u[:, t, :, None]
        want[:, t] = np.einsum("bdn,dn->bd", x, C)
    got = refs.selective_scan_ref(u, delta, A, B, C)
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-3, atol=2e-3)


@pytest.mark.parametrize("width", [2, 3, 4])
@pytest.mark.parametrize("activation", [None, "silu"])
def test_causal_conv1d_ref_matches_numpy(width, activation):
    rng = np.random.default_rng(2)
    b, L, d = 2, 11, 5
    x = rng.standard_normal((b, L, d)).astype(np.float32)
    w = rng.standard_normal((width, d)).astype(np.float32)
    bias = rng.standard_normal(d).astype(np.float32)

    xp = np.pad(x, ((0, 0), (width - 1, 0), (0, 0)))
    want = np.zeros_like(x)
    for t in range(L):
        want[:, t] = np.einsum("bwd,wd->bd", xp[:, t : t + width], w) + bias
    if activation:
        want = _np_silu(want)
    got = refs.causal_conv1d_ref(x, jnp.asarray(w), jnp.asarray(bias), activation)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_causal_conv1d_update_matches_full_conv():
    """Streaming update replays the full conv one token at a time."""
    rng = np.random.default_rng(3)
    b, L, d, width = 2, 10, 4, 4
    x = rng.standard_normal((b, L, d)).astype(np.float32)
    w = rng.standard_normal((width, d)).astype(np.float32)
    bias = rng.standard_normal(d).astype(np.float32)

    full = refs.causal_conv1d_ref(x, w, bias, "silu")
    state = jnp.zeros((b, width, d))
    outs = []
    for t in range(L):
        o, state = refs.causal_conv1d_update_ref(x[:, t], state, w, bias, "silu")
        outs.append(o)
    stepped = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


def test_selective_state_update_matches_scan():
    """Single-token state updates replay the full selective scan."""
    rng = np.random.default_rng(4)
    b, L, d, n = 2, 8, 5, 3
    u = rng.standard_normal((b, L, d)).astype(np.float32)
    delta = rng.standard_normal((b, L, d)).astype(np.float32)
    A = (-0.5 - rng.random((d, n))).astype(np.float32)
    B = rng.standard_normal((b, L, n)).astype(np.float32)
    C = rng.standard_normal((b, L, n)).astype(np.float32)
    D = rng.standard_normal(d).astype(np.float32)
    z = rng.standard_normal((b, L, d)).astype(np.float32)
    bias = (0.1 * rng.standard_normal(d)).astype(np.float32)

    full, last = refs.selective_scan_ref(
        u, delta, A, B, C, D, z, bias, delta_softplus=True,
        return_last_state=True)
    state = jnp.zeros((b, d, n))
    outs = []
    for t in range(L):
        o, state = refs.selective_state_update_ref(
            state, u[:, t], delta[:, t], A, B[:, t], C[:, t], D, z[:, t],
            dt_bias=bias, dt_softplus=True)
        outs.append(o)
    stepped = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(full),
                               rtol=3e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(state), np.asarray(last),
                               rtol=3e-3, atol=2e-3)
