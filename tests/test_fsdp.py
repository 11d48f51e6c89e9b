"""ZeRO/FSDP-sharded training parity on the virtual 8-device CPU mesh.

The reference has no parameter sharding of any kind (single-GPU; DDP
imported but unused, multiclass_training_folds.py:30,800-811) — this is
beyond-reference capability (parallel/fsdp.py): params + AdamW moments
sharded leaf-wise over the ``data`` axis, batch sharded over the same
axis, XLA/GSPMD inserting the gather/reduce-scatter collectives.  The
sharded optimizer step must be EXACTLY the replicated-DP step.

The micro test model's leaves are all below the production
MIN_SHARD_ELEMS threshold, so the tests pass ``min_shard_elems=64`` —
real sharding must engage or the parity check would be vacuous (asserted
explicitly).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vivim_tpu.nn.vivim import Vivim, VivimConfig
from vivim_tpu.parallel.fsdp import (fsdp_state_shardings, shard_state_fsdp,
                                     state_bytes_per_device)
from vivim_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from vivim_tpu.train import loop as loop_lib

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")

MIN_ELEMS = 64  # test threshold: the micro model's leaves are small


def _setup():
    mesh = make_mesh(8)
    model = Vivim(VivimConfig.micro_test(scan_implementation="ref"))
    rng = jax.random.PRNGKey(0)
    clip = jax.random.normal(rng, (8, 5, 32, 32, 3), jnp.float32)
    labels = jax.random.randint(jax.random.PRNGKey(1), (8, 5, 32, 32), 0, 3)
    batch = {"clip": clip, "masks": jax.nn.one_hot(labels, 3)}
    state, tx = loop_lib.create_train_state(
        model, clip, rng, lr=1e-3, weight_decay=1e-2, total_steps=10)
    return mesh, model, batch, state, tx


def _sharded_leaves(tree):
    return [p for p in jax.tree_util.tree_leaves(tree)
            if any(s == "data" for s in tuple(p.sharding.spec))]


def test_fsdp_two_steps_match_replicated_dp():
    mesh, model, batch, state, tx = _setup()
    step = loop_lib.make_train_step(model, "recall_focused", 3, tx)

    with mesh:
        sharded_batch = shard_batch(batch, mesh)
        s_dp = replicate(state, mesh)
        for _ in range(2):
            s_dp, m_dp = step(s_dp, sharded_batch)

        s_z, shardings = shard_state_fsdp(state, mesh,
                                          min_shard_elems=MIN_ELEMS)
        # the parity check must not be vacuous: real sharding engaged
        assert len(_sharded_leaves(s_z.params)) >= 10
        step_z = loop_lib.make_train_step(
            model, "recall_focused", 3, tx, state_shardings=shardings)
        for _ in range(2):
            s_z, m_z = step_z(s_z, sharded_batch)

    assert abs(float(m_z["loss"]) - float(m_dp["loss"])) < 1e-5
    np.testing.assert_allclose(float(m_z["grad_norm"]),
                               float(m_dp["grad_norm"]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_dp.params),
                    jax.tree_util.tree_leaves(s_z.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)

    # the carried state STAYS sharded across steps (out_shardings pin)
    for p in _sharded_leaves(s_z.params):
        assert p.addressable_shards[0].data.size == p.size // 8

    # the analytic per-device state footprint shrinks
    repl_b = state_bytes_per_device(state)
    fsdp_b = state_bytes_per_device(
        state, fsdp_state_shardings(state, mesh, min_shard_elems=MIN_ELEMS))
    assert fsdp_b < 0.5 * repl_b, (fsdp_b, repl_b)


def test_fsdp_leaf_spec_prefers_largest_divisible_dim():
    from jax.sharding import PartitionSpec as P

    from vivim_tpu.parallel.fsdp import _leaf_spec

    x = jnp.zeros((3, 3, 64, 256))
    assert _leaf_spec(x, 8, "data") == P(None, None, None, "data")
    # nothing divisible -> replicated
    assert _leaf_spec(jnp.zeros((129, 129, 3)), 8, "data") == P()
    # tiny -> replicated even when divisible (production threshold)
    assert _leaf_spec(jnp.zeros((8, 8)), 8, "data") == P()
    # ties -> the later dim
    assert _leaf_spec(jnp.zeros((256, 256)), 8, "data",
                      min_shard_elems=64) == P(None, "data")
