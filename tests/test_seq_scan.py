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


def test_seq_sharded_vivim_forward_matches_single_device():
    """Tiny Vivim forward with Mamba tokens sharded over a `seq` axis ==
    the unsharded forward (VERDICT #3: the tri-directional flip and the
    frame<->position permute must survive sequence sharding — GSPMD
    inserts the reshard collectives; the scan itself runs as the
    sequence-parallel shard_map island)."""
    import dataclasses

    from vivim_tpu.nn.vivim import Vivim, VivimConfig

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(8, axis="seq")
    cfg = VivimConfig.tiny_test()
    cfg_seq = dataclasses.replace(cfg, seq_axis="seq", mesh=mesh)
    # T*H*W must divide over 8 shards: T=5, 16x16 stage-0 -> L=1280
    clip = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 64, 64, 3),
                             jnp.float32)
    model = Vivim(cfg)
    variables = model.init(jax.random.PRNGKey(1), clip)
    want = model.apply(variables, clip, deterministic=True)
    got = jax.jit(
        lambda v, c: Vivim(cfg_seq).apply(v, c, deterministic=True)
    )(variables, clip)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_seq_sharded_grouped_per_batch_params():
    """Per-batch A/D/bias stacks (the tri-directional path) work through
    the seq-sharded scan."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(8, axis="seq")
    rng = np.random.default_rng(3)
    b, L, d, n = 3, 8 * 16, 8, 4
    u = jnp.asarray(rng.standard_normal((b, L, d)), jnp.float32)
    delta = jnp.asarray(0.3 * rng.standard_normal((b, L, d)), jnp.float32)
    A = jnp.asarray(-0.5 - rng.random((b, d, n)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((b, L, n)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((b, L, n)), jnp.float32)
    D = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((b, L, d)), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal((b, d)), jnp.float32)

    want, want_last = refs.selective_scan_ref(
        u, delta, A, B, C, D, z, bias, delta_softplus=True,
        return_last_state=True)
    got, got_last = seq_sharded_selective_scan(
        u, delta, A, B, C, D, z, bias, mesh=mesh, implementation="ref")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_last), np.asarray(want_last),
                               rtol=2e-3, atol=2e-3)
