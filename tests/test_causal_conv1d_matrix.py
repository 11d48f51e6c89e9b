"""Port of the reference causal-conv1d test matrix.

Mirrors /root/reference/causal-conv1d/tests/test_causal_conv1d.py:14-105:
seqlens including non-multiples (151, 372, 1134), widths 2-4, bias/silu
toggles, fp32/bf16 with the reference's dtype-scaled tolerances, forward
AND gradients (dx, dweight, dbias), the channel-major (reference-layout)
wrapper, and the streaming update op vs its reference (:108-138).

The production op is plain jnp (XLA fuses a width-4 depthwise conv into
neighbor ops on TPU — kernels/causal_conv1d.py module doc), so "kernel vs
ref" here is production-path vs the independent numpy-style reference twin
in kernels/refs.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vivim_tpu.kernels import refs
from vivim_tpu.kernels.causal_conv1d import (
    causal_conv1d,
    causal_conv1d_cm,
    causal_conv1d_update,
)


def _tols(dtype):
    return (3e-4, 1e-3) if dtype == jnp.float32 else (1e-2, 5e-2)


@pytest.mark.parametrize("seqlen", [8, 151, 372, 1134])
@pytest.mark.parametrize("width", [2, 3, 4])
@pytest.mark.parametrize("has_bias", [False, True])
@pytest.mark.parametrize("silu", [False, True])
def test_conv_matrix_fwd(seqlen, width, has_bias, silu):
    rng = np.random.default_rng(seqlen * 10 + width)
    b, d = 2, 36  # dim not divisible by 32 (reference uses 4096+32)
    x = jnp.asarray(rng.standard_normal((b, seqlen, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((width, d)), jnp.float32)
    bias = (jnp.asarray(rng.standard_normal(d), jnp.float32)
            if has_bias else None)
    act = "silu" if silu else None
    got = causal_conv1d(x, w, bias, act)
    want = refs.causal_conv1d_ref(x, w, bias, act)
    rtol, atol = _tols(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=rtol, atol=atol)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_conv_matrix_dtypes(dtype):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 151, 36)), dtype)
    w = jnp.asarray(rng.standard_normal((4, 36)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(36), jnp.float32)
    got = causal_conv1d(x, w, bias, "silu")
    want = refs.causal_conv1d_ref(x, w, bias, "silu")
    rtol, atol = _tols(dtype)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=rtol, atol=atol)
    assert got.dtype == dtype


def test_conv_matrix_grads():
    """dx/dweight/dbias parity (reference grad tolerances, :66-105)."""
    rng = np.random.default_rng(7)
    b, L, d, width = 2, 151, 24, 4
    x = jnp.asarray(rng.standard_normal((b, L, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((width, d)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(d), jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, L, d)), jnp.float32)

    def loss(fn, x, w, bias):
        return jnp.sum(fn(x, w, bias, "silu") * g)

    got = jax.grad(lambda *a: loss(causal_conv1d, *a),
                   argnums=(0, 1, 2))(x, w, bias)
    want = jax.grad(lambda *a: loss(refs.causal_conv1d_ref, *a),
                    argnums=(0, 1, 2))(x, w, bias)
    for name, a, e in zip(("dx", "dweight", "dbias"), got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-3, atol=1e-3, err_msg=name)


def test_conv_cm_reference_layout():
    """causal_conv1d_cm takes the exact reference layout: x (b, dim, L),
    weight (dim, width) (causal_conv1d_interface.py:14-46)."""
    rng = np.random.default_rng(9)
    b, d, L, width = 2, 24, 72, 3
    x_cm = jnp.asarray(rng.standard_normal((b, d, L)), jnp.float32)
    w_cm = jnp.asarray(rng.standard_normal((d, width)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(d), jnp.float32)
    got = causal_conv1d_cm(x_cm, w_cm, bias, "silu")
    want = refs.causal_conv1d_ref(jnp.swapaxes(x_cm, 1, 2), w_cm.T, bias,
                                  "silu")
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(jnp.swapaxes(want, 1, 2)),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("width", [2, 3, 4])
@pytest.mark.parametrize("has_bias", [False, True])
@pytest.mark.parametrize("silu", [False, True])
def test_conv_update_matrix(width, has_bias, silu):
    """Streaming update vs full conv, the reference update test
    (:108-138): stepping token-by-token equals the full causal conv."""
    rng = np.random.default_rng(width)
    b, L, d = 2, 12, 16
    x = jnp.asarray(rng.standard_normal((b, L, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((width, d)), jnp.float32)
    bias = (jnp.asarray(rng.standard_normal(d), jnp.float32)
            if has_bias else None)
    act = "silu" if silu else None
    full = causal_conv1d(x, w, bias, act)
    state = jnp.zeros((b, width, d), jnp.float32)
    outs = []
    for t in range(L):
        o, state = causal_conv1d_update(x[:, t], state, w, bias, act)
        outs.append(o)
    np.testing.assert_allclose(np.asarray(jnp.stack(outs, axis=1)),
                               np.asarray(full), rtol=1e-5, atol=1e-5)
    # functional-ref twin agrees too
    o_ref, _ = refs.causal_conv1d_update_ref(
        x[:, 0], jnp.zeros((b, width, d), jnp.float32), w, bias, act)
    o_got, _ = causal_conv1d_update(
        x[:, 0], jnp.zeros((b, width, d), jnp.float32), w, bias, act)
    np.testing.assert_allclose(np.asarray(o_got), np.asarray(o_ref),
                               rtol=1e-6, atol=1e-6)
