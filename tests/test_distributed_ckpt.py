"""Checkpoint/restore of SHARDED train states.

The reference's resume path is single-GPU (Lightning ``fit(ckpt_path=...)``);
here the orbax round-trip must also hold for states living on a device
mesh: restoring with a live sharded target must come back with the same
values AND the same NamedShardings (orbax preserves sharding through
``to_shape_dtype_struct``) — the property multi-host resume relies on.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vivim_tpu.nn import segformer as sf
from vivim_tpu.nn.vivim import Vivim, VivimConfig
from vivim_tpu.parallel.mesh import make_mesh
from vivim_tpu.train import loop as loop_lib
from vivim_tpu.train.checkpoints import CheckpointManager


def test_last_pruning_keeps_previous_until_next_save(tmp_path):
    """Orbax saves are async (committed by an atomic rename); the previous
    'last' must survive until the NEXT save so a crash while the new one is
    in flight never leaves zero resumable checkpoints."""
    import os

    d = str(tmp_path / "ck")
    mgr = CheckpointManager(d, monitor="val/dice", mode="max", top_k=1)
    mgr.save({"w": jnp.arange(4.0)}, 1, {})
    mgr.wait()
    mgr.save({"w": jnp.arange(4.0) + 1}, 2, {})
    mgr.wait()
    lasts = sorted(x for x in os.listdir(d) if x.startswith("last_"))
    assert lasts == ["last_1", "last_2"]
    mgr.save({"w": jnp.arange(4.0) + 2}, 3, {})
    mgr.wait()
    lasts = sorted(x for x in os.listdir(d) if x.startswith("last_"))
    assert lasts == ["last_2", "last_3"]
    assert mgr.last_path().endswith("last_3")
    restored = mgr.restore({"w": jnp.zeros(4)})
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.arange(4.0) + 2)


def test_sharded_train_state_roundtrip(tmp_path):
    mesh = make_mesh(8)
    cfg = VivimConfig.tiny_test(scan_implementation="ref")
    model = Vivim(cfg)
    clip = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 32, 32, 3),
                             jnp.float32)
    state, _ = loop_lib.create_train_state(
        model, clip, jax.random.PRNGKey(1), lr=1e-3, weight_decay=1e-2,
        total_steps=10, mesh=mesh)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), monitor="val/dice",
                            mode="max", top_k=1)
    mgr.save(state, step=1, metrics={"val/dice": 0.5})
    mgr.wait()

    restored = mgr.restore(state)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(state.params),
            jax.tree_util.tree_leaves_with_path(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(kp))
        assert b.sharding == a.sharding, (
            f"sharding lost at {jax.tree_util.keystr(kp)}: "
            f"{b.sharding} != {a.sharding}")
