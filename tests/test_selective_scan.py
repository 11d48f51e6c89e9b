"""Pallas selective-scan parity vs the jnp reference.

Replicates the parameter matrix and tolerance discipline of the reference
kernel tests (/root/reference/mamba/tests/ops/test_selective_scan.py):
forward allclose at dtype-scaled tolerances, then gradients of every input
compared against autodiff through the sequential reference.
The Pallas kernel runs in interpreter mode on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vivim_tpu.kernels import refs
from vivim_tpu.kernels.selective_scan import selective_scan
from vivim_tpu.kernels.mamba_inner import mamba_inner


def _make_inputs(rng, b, L, d, n, dtype, has_D=True, has_z=True, has_bias=True):
    u = jnp.asarray(rng.standard_normal((b, L, d)), dtype)
    delta = jnp.asarray(0.5 * rng.standard_normal((b, L, d)), dtype)
    A = jnp.asarray(-0.5 - rng.random((d, n)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((b, L, n)), dtype)
    C = jnp.asarray(rng.standard_normal((b, L, n)), dtype)
    D = jnp.asarray(rng.standard_normal(d), jnp.float32) if has_D else None
    z = jnp.asarray(rng.standard_normal((b, L, d)), dtype) if has_z else None
    bias = (jnp.asarray(0.1 * rng.standard_normal(d), jnp.float32)
            if has_bias else None)
    return u, delta, A, B, C, D, z, bias


@pytest.mark.parametrize("L", [16, 200])
@pytest.mark.parametrize("d,n", [(24, 16)])
def test_fwd_parity(L, d, n):
    rng = np.random.default_rng(42)
    u, delta, A, B, C, D, z, bias = _make_inputs(rng, 2, L, d, n, jnp.float32)
    want, want_last = refs.selective_scan_ref(
        u, delta, A, B, C, D, z, bias, delta_softplus=True,
        return_last_state=True)
    got, got_last = selective_scan(
        u, delta, A, B, C, D, z, bias, delta_softplus=True,
        return_last_state=True, chunk=64, dtile=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=6e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_last), np.asarray(want_last),
                               rtol=6e-4, atol=2e-3)


@pytest.mark.parametrize("has_D,has_z,has_bias,softplus", [
    (True, True, True, True),
    (False, True, False, True),
    (True, False, True, False),
    (False, False, False, False),
])
def test_fwd_parity_toggles(has_D, has_z, has_bias, softplus):
    rng = np.random.default_rng(7)
    u, delta, A, B, C, D, z, bias = _make_inputs(
        rng, 1, 48, 12, 8, jnp.float32, has_D, has_z, has_bias)
    want = refs.selective_scan_ref(
        u, delta, A, B, C, D, z, bias, delta_softplus=softplus)
    got = selective_scan(
        u, delta, A, B, C, D, z, bias, delta_softplus=softplus,
        chunk=32, dtile=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=6e-4, atol=2e-3)


@pytest.mark.parametrize("L", [96])
@pytest.mark.parametrize("has_z", [True, False])
def test_grad_parity(L, has_z):
    rng = np.random.default_rng(3)
    u, delta, A, B, C, D, z, bias = _make_inputs(
        rng, 2, L, 8, 4, jnp.float32, has_z=has_z)

    def loss(fn, args):
        u, delta, A, B, C, D, z, bias = args
        out = fn(u, delta, A, B, C, D, z, bias, delta_softplus=True)
        # weighted sum so every position contributes distinctly
        w = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape) / out.size
        return jnp.sum(out * w)

    args = (u, delta, A, B, C, D, z, bias)
    diff_idx = [0, 1, 2, 3, 4, 5] + ([6] if has_z else []) + [7]
    ref_fn = lambda *a: loss(refs.selective_scan_ref, a)
    pal_fn = lambda *a: loss(
        lambda *k, **kw: selective_scan(*k, **kw, chunk=64, dtile=128), a)
    g_ref = jax.grad(ref_fn, argnums=diff_idx)(*args)
    g_pal = jax.grad(pal_fn, argnums=diff_idx)(*args)
    names = ["du", "ddelta", "dA", "dB", "dC", "dD", "dz", "dbias"]
    for i, (gr, gp) in enumerate(zip(g_ref, g_pal)):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr), rtol=1e-3, atol=2e-3,
            err_msg=f"grad mismatch: {names[diff_idx[i]] if diff_idx[i] < 8 else i}")


def test_grad_with_last_state_cotangent():
    """The final-state output participates in autodiff (streaming training)."""
    rng = np.random.default_rng(9)
    u, delta, A, B, C, D, z, bias = _make_inputs(rng, 1, 40, 8, 4, jnp.float32)

    def loss(fn):
        out, last = fn(u, delta, A, B, C, D, z, bias, delta_softplus=True,
                       return_last_state=True)
        return jnp.sum(out) + 2.0 * jnp.sum(last**2)

    g_ref = jax.grad(lambda _: loss(refs.selective_scan_ref))(0.0)  # smoke
    ref_grad = jax.grad(
        lambda u_: loss(lambda *a, **k: refs.selective_scan_ref(u_, *a[1:], **k)))(u)
    pal_grad = jax.grad(
        lambda u_: loss(lambda *a, **k: selective_scan(u_, *a[1:], chunk=32, **k)))(u)
    np.testing.assert_allclose(np.asarray(pal_grad), np.asarray(ref_grad),
                               rtol=1e-3, atol=2e-3)


def test_bf16_io_tolerance():
    """bf16 inputs with fp32 state: reference tolerance discipline
    (test_selective_scan.py:45-48 — bf16 rtol 3e-2 / atol 5e-2)."""
    rng = np.random.default_rng(11)
    u, delta, A, B, C, D, z, bias = _make_inputs(
        rng, 1, 64, 16, 8, jnp.bfloat16)
    want = refs.selective_scan_ref(u, delta, A, B, C, D, z, bias,
                                   delta_softplus=True)
    got = selective_scan(u, delta, A, B, C, D, z, bias, delta_softplus=True,
                         chunk=64)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=3e-2, atol=5e-2)


def test_mamba_inner_parity():
    rng = np.random.default_rng(21)
    b, L, d_model, d_inner, n, width = 2, 60, 16, 32, 8, 4
    dt_rank = 2
    xz = jnp.asarray(rng.standard_normal((b, L, 2 * d_inner)), jnp.float32)
    conv_w = jnp.asarray(rng.standard_normal((width, d_inner)), jnp.float32)
    conv_b = jnp.asarray(rng.standard_normal(d_inner), jnp.float32)
    x_proj = jnp.asarray(
        rng.standard_normal((dt_rank + 2 * n, d_inner)) * 0.2, jnp.float32)
    dt_proj = jnp.asarray(
        rng.standard_normal((d_inner, dt_rank)) * 0.2, jnp.float32)
    A = jnp.asarray(-0.5 - rng.random((d_inner, n)), jnp.float32)
    D = jnp.asarray(rng.standard_normal(d_inner), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal(d_inner), jnp.float32)
    out_w = jnp.asarray(
        rng.standard_normal((d_model, d_inner)) * 0.1, jnp.float32)

    want = refs.mamba_inner_ref(xz, conv_w, conv_b, x_proj, dt_proj, A, D,
                                bias, out_w)
    got = mamba_inner(xz, conv_w, conv_b, x_proj, dt_proj, A, D, bias, out_w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=2e-3)

    # gradient parity through the full fused path
    def loss(fn, xz_):
        out = fn(xz_, conv_w, conv_b, x_proj, dt_proj, A, D, bias, out_w)
        return jnp.sum(out**2)

    g_ref = jax.grad(lambda x_: loss(refs.mamba_inner_ref, x_))(xz)
    g_pal = jax.grad(lambda x_: loss(mamba_inner, x_))(xz)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=5e-3, atol=5e-3)


def test_initial_state_chaining():
    """scan(full) == scan(half1) then scan(half2, initial_state=mid)."""
    rng = np.random.default_rng(33)
    u, delta, A, B, C, D, z, bias = _make_inputs(rng, 2, 128, 8, 4,
                                                 jnp.float32)
    full, full_last = selective_scan(
        u, delta, A, B, C, D, z, bias, delta_softplus=True,
        return_last_state=True, chunk=32)
    h = 64
    y1, mid = selective_scan(
        u[:, :h], delta[:, :h], A, B[:, :h], C[:, :h], D, z[:, :h], bias,
        delta_softplus=True, return_last_state=True, chunk=32)
    y2, last = selective_scan(
        u[:, h:], delta[:, h:], A, B[:, h:], C[:, h:], D, z[:, h:], bias,
        delta_softplus=True, return_last_state=True, initial_state=mid,
        chunk=32)
    np.testing.assert_allclose(np.asarray(jnp.concatenate([y1, y2], axis=1)),
                               np.asarray(full), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(last), np.asarray(full_last),
                               rtol=1e-4, atol=1e-4)


def test_initial_state_grad():
    rng = np.random.default_rng(34)
    u, delta, A, B, C, D, z, bias = _make_inputs(rng, 1, 48, 8, 4,
                                                 jnp.float32)
    h0 = jnp.asarray(rng.standard_normal((1, 8, 4)), jnp.float32)

    def loss(fn, h0_):
        out, last = fn(u, delta, A, B, C, D, z, bias, delta_softplus=True,
                       return_last_state=True, initial_state=h0_)
        return jnp.sum(out**2) + jnp.sum(last)

    g_ref = jax.grad(lambda h_: loss(refs.selective_scan_ref, h_))(h0)
    g_pal = jax.grad(lambda h_: loss(
        lambda *a, **k: selective_scan(*a, chunk=16, **k), h_))(h0)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-3)


def test_grouped_equals_separate_directions():
    """mamba_inner_grouped == three separate mamba_inner calls."""
    from vivim_tpu.kernels.mamba_inner import mamba_inner_grouped

    rng = np.random.default_rng(5)
    G, nb, L, d_inner, n, width, rank = 3, 2, 24, 16, 4, 4, 2
    xz = jnp.asarray(rng.standard_normal((G * nb, L, 2 * d_inner)),
                     jnp.float32)
    conv_w = jnp.asarray(rng.standard_normal((G, width, d_inner)) * 0.3,
                         jnp.float32)
    conv_b = jnp.asarray(rng.standard_normal((G, d_inner)) * 0.1, jnp.float32)
    x_proj = jnp.asarray(rng.standard_normal((G, rank + 2 * n, d_inner)) * 0.2,
                         jnp.float32)
    dt_proj = jnp.asarray(rng.standard_normal((G, d_inner, rank)) * 0.2,
                          jnp.float32)
    A_log = jnp.asarray(np.log(1.0 + rng.random((G, d_inner, n))),
                        jnp.float32)
    D = jnp.asarray(rng.standard_normal((G, d_inner)), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal((G, d_inner)), jnp.float32)

    got = mamba_inner_grouped(xz, conv_w, conv_b, x_proj, dt_proj, A_log, D,
                              bias, nb=nb, implementation="ref")
    for g in range(G):
        want = mamba_inner(
            xz[g * nb : (g + 1) * nb], conv_w[g], conv_b[g], x_proj[g],
            dt_proj[g], -jnp.exp(A_log[g]), D=D[g], delta_bias=bias[g],
            implementation="ref")
        np.testing.assert_allclose(
            np.asarray(got[g * nb : (g + 1) * nb]), np.asarray(want),
            rtol=2e-3, atol=2e-3, err_msg=f"direction {g}")
