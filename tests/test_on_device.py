"""Real-hardware kernel parity (opt-in).

The regular suite runs the Pallas kernels in interpreter mode on a virtual
CPU mesh (conftest.py); this module compiles them through Mosaic on the
actual accelerator and re-asserts the reference parity contract
(/root/reference/mamba/tests/ops/test_selective_scan.py tolerances) on
hardware.  Run with::

    VIVIM_TESTS_ON_DEVICE=1 python -m pytest tests/test_on_device.py -q

Skipped (not failed) in the normal CPU suite, so `pytest tests/` stays
green everywhere.  Shapes are kept small but deliberately UNALIGNED to the
(8, 128) tile and the chunk size — padding-lane bugs only show up on the
real memory layout.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vivim_tpu.kernels import refs
from vivim_tpu.kernels.mamba_inner import mamba_inner, mamba_inner_grouped
from vivim_tpu.kernels.selective_scan import selective_scan

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="real-hardware parity subset (VIVIM_TESTS_ON_DEVICE=1 on a TPU host)",
)


def _make_inputs(rng, b, L, d, n, dtype, has_D=True, has_z=True,
                 has_bias=True):
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


@pytest.mark.parametrize("L,d", [(200, 24), (256, 128)])
def test_fwd_parity_on_device(L, d):
    rng = np.random.default_rng(42)
    u, delta, A, B, C, D, z, bias = _make_inputs(rng, 2, L, d, 16,
                                                 jnp.float32)
    want, want_last = refs.selective_scan_ref(
        u, delta, A, B, C, D, z, bias, delta_softplus=True,
        return_last_state=True)
    got, got_last = jax.jit(
        lambda *a: selective_scan(*a, delta_softplus=True,
                                  return_last_state=True, chunk=64)
    )(u, delta, A, B, C, D, z, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=6e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_last), np.asarray(want_last),
                               rtol=6e-4, atol=2e-3)


def test_fwd_parity_bf16_on_device():
    rng = np.random.default_rng(11)
    u, delta, A, B, C, D, z, bias = _make_inputs(rng, 1, 150, 40, 16,
                                                 jnp.bfloat16)
    want = refs.selective_scan_ref(u, delta, A, B, C, D, z, bias,
                                   delta_softplus=True)
    got = jax.jit(
        lambda *a: selective_scan(*a, delta_softplus=True, chunk=64)
    )(u, delta, A, B, C, D, z, bias)
    # reference bf16 tolerance discipline (test_selective_scan.py:45-48)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=3e-2, atol=5e-2)


def test_grad_parity_on_device():
    """All eight input gradients through the Mosaic backward kernel."""
    rng = np.random.default_rng(3)
    u, delta, A, B, C, D, z, bias = _make_inputs(rng, 2, 96, 24, 16,
                                                 jnp.float32)

    def loss(fn, *args):
        out = fn(*args, delta_softplus=True)
        w = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape)
        return jnp.sum(out * w) / out.size

    args = (u, delta, A, B, C, D, z, bias)
    idx = list(range(8))
    g_ref = jax.grad(lambda *a: loss(refs.selective_scan_ref, *a),
                     argnums=idx)(*args)
    g_pal = jax.jit(jax.grad(
        lambda *a: loss(
            lambda *k, **kw: selective_scan(*k, chunk=64, **kw), *a),
        argnums=idx))(*args)
    names = ["du", "ddelta", "dA", "dB", "dC", "dD", "dz", "dbias"]
    for name, gr, gp in zip(names, g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr), rtol=1e-3, atol=2e-3,
            err_msg=f"on-device grad mismatch: {name}")


def test_initial_state_chaining_on_device():
    """Streaming contract on hardware: full == half1 then half2(mid)."""
    rng = np.random.default_rng(33)
    u, delta, A, B, C, D, z, bias = _make_inputs(rng, 2, 128, 16, 16,
                                                 jnp.float32)
    run = jax.jit(lambda *a, **k: selective_scan(
        *a, delta_softplus=True, return_last_state=True, chunk=32, **k))
    full, full_last = run(u, delta, A, B, C, D, z, bias)
    h = 64
    y1, mid = run(u[:, :h], delta[:, :h], A, B[:, :h], C[:, :h], D,
                  z[:, :h], bias)
    y2, last = run(u[:, h:], delta[:, h:], A, B[:, h:], C[:, h:], D,
                   z[:, h:], bias, initial_state=mid)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([y1, y2], axis=1)), np.asarray(full),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(last), np.asarray(full_last),
                               rtol=1e-4, atol=1e-4)


def test_grouped_bc_on_device():
    """Grouped variable B/C (n_groups=2) runs the kernel via group->batch
    folding (the reference kernel's (batch, groups, dstate, L) surface)."""
    rng = np.random.default_rng(8)
    b, L, d, n, G = 2, 100, 32, 16, 2
    u, delta, A, _, _, D, z, bias = _make_inputs(rng, b, L, d, n,
                                                 jnp.float32)
    B = jnp.asarray(rng.standard_normal((b, L, G, n)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((b, L, G, n)), jnp.float32)
    want = refs.selective_scan_ref(u, delta, A, B, C, D, z, bias,
                                   delta_softplus=True)
    got = jax.jit(lambda *a: selective_scan(*a, delta_softplus=True,
                                            chunk=32))(
        u, delta, A, B, C, D, z, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=6e-4, atol=2e-3)


def test_mamba_inner_grouped_on_device():
    """The production path: the batched tri-directional mixer (per-batch
    A/D/bias stacked over directions) through the Mosaic kernel, fwd + grad."""
    rng = np.random.default_rng(5)
    G, nb, L, d_inner, n, width, rank = 3, 2, 80, 32, 16, 4, 2
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

    def out_sum(impl, xz_):
        y = mamba_inner_grouped(xz_, conv_w, conv_b, x_proj, dt_proj, A_log,
                                D, bias, nb=nb, implementation=impl)
        return jnp.sum(y ** 2), y

    (want_l, want), g_ref = jax.value_and_grad(
        lambda x_: out_sum("ref", x_), has_aux=True)(xz)
    (got_l, got), g_pal = jax.jit(jax.value_and_grad(
        lambda x_: out_sum("pallas", x_), has_aux=True))(xz)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=5e-3, atol=5e-3)


def test_tiny_vivim_train_step_on_device():
    """One full optimizer step of a tiny Vivim with the Pallas scan vs the
    sequential reference scan — loss and gradients must agree on hardware."""
    import dataclasses

    from vivim_tpu.nn.vivim import Vivim, VivimConfig
    from vivim_tpu.train import loop as loop_lib

    cfg_ref = VivimConfig.tiny_test(scan_implementation="ref")
    cfg_pal = dataclasses.replace(cfg_ref, scan_implementation=None)
    clip = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 32, 32, 3),
                             jnp.float32)
    labels = jax.random.randint(jax.random.PRNGKey(1), (1, 5, 32, 32), 0, 3)
    batch = {"clip": clip, "masks": jax.nn.one_hot(labels, 3)}

    results = {}
    for name, cfg in (("ref", cfg_ref), ("pallas", cfg_pal)):
        model = Vivim(cfg)
        state, tx = loop_lib.create_train_state(
            model, clip, jax.random.PRNGKey(2), lr=1e-3, weight_decay=1e-2,
            total_steps=4)
        step = loop_lib.make_train_step(model, "recall_focused", 3, tx)
        _, metrics = step(state, batch)
        results[name] = (float(metrics["loss"]), float(metrics["grad_norm"]))
    (l_r, g_r), (l_p, g_p) = results["ref"], results["pallas"]
    assert abs(l_p - l_r) < 1e-3 * max(abs(l_r), 1.0), (l_p, l_r)
    assert abs(g_p - g_r) < 5e-3 * max(abs(g_r), 1.0), (g_p, g_r)
