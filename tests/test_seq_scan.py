"""Sequence-sharded scan parity on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vivim_tpu.kernels import refs
from vivim_tpu.parallel.mesh import make_mesh
from vivim_tpu.parallel.seq_scan import seq_sharded_selective_scan


@pytest.mark.parametrize("implementation", ["ref", None])
def test_seq_sharded_matches_single_device(implementation):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(8, axis="seq")
    rng = np.random.default_rng(0)
    b, L, d, n = 2, 8 * 32, 8, 4
    u = jnp.asarray(rng.standard_normal((b, L, d)), jnp.float32)
    delta = jnp.asarray(0.3 * rng.standard_normal((b, L, d)), jnp.float32)
    A = jnp.asarray(-0.5 - rng.random((d, n)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((b, L, n)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((b, L, n)), jnp.float32)
    D = jnp.asarray(rng.standard_normal(d), jnp.float32)
    z = jnp.asarray(rng.standard_normal((b, L, d)), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal(d), jnp.float32)

    want, want_last = refs.selective_scan_ref(
        u, delta, A, B, C, D, z, bias, delta_softplus=True,
        return_last_state=True)
    got, got_last = seq_sharded_selective_scan(
        u, delta, A, B, C, D, z, bias, mesh=mesh,
        implementation=implementation)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_last), np.asarray(want_last),
                               rtol=2e-3, atol=2e-3)
