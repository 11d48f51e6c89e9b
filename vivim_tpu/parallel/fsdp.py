"""ZeRO-style fully-sharded data parallelism (FSDP) over the ``data`` axis.

Beyond-reference (the reference is single-GPU: DDP imported but unused,
multiclass_training_folds.py:30,800-811, and no parameter sharding of any
kind).  Plain data parallelism replicates params + AdamW moments on every
chip — ~0.72 GB at the 60M-param Vivim config (240 MB params + 480 MB
mu/nu), and proportionally more for larger LM-family models.  FSDP shards
every large parameter and optimizer leaf across the ``data`` mesh axis
instead, the TPU-idiomatic way: we only PLACE the state sharded
(``NamedSharding`` per leaf) and give the jitted train step matching
``out_shardings``; XLA's SPMD partitioner inserts the all-gathers where a
full parameter is consumed (forward/backward) and reduce-scatters the
gradient straight into the shard that owns the optimizer update — the
GSPMD formulation of ZeRO-3 (no wrapper modules, no manual collectives).

Memory per chip for the state goes from ``P_state`` to ``P_state / N`` (+
transient gather buffers, bounded by the largest single layer); gradient
traffic is the same volume as DP's all-reduce (a reduce-scatter + the
next step's all-gather is exactly one all-reduce), riding ICI.

Composes with the package's other modes: the batch still shards over
``data`` (same axis), the scan islands (parallel/seq_scan.py) and TP
(parallel/tensor_parallel.py) use their own axes.

Use:
    state, tx = create_train_state(model, clip, rng, ..., mesh=mesh)
    shardings = fsdp_state_shardings(state, mesh)
    state = jax.device_put(state, shardings)       # re-places replicated -> sharded
    step = make_train_step(model, ..., state_shardings=shardings)
or pass ``zero=True`` to the Trainer / ``-zero true`` on the training CLIs.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Leaves smaller than this stay replicated: sharding a 768-element bias
# saves nothing and costs a collective per use.
MIN_SHARD_ELEMS = 16384


class _AnalyticLeaf:
    """nbytes carrier for ShapeDtypeStruct leaves (state_bytes_per_device)."""

    def __init__(self, nbytes: int):
        self.nbytes = nbytes


def _leaf_spec(x, n_shards: int, axis: str,
               min_shard_elems: int = MIN_SHARD_ELEMS) -> P:
    """PartitionSpec sharding the LARGEST divisible dimension of ``x``
    (ties -> the later dim: conv kernels are HWIO, so I/O are the big,
    layout-friendly dims), or replicated when nothing divides / too small."""
    shape = getattr(x, "shape", ())
    if not shape or int(np.prod(shape)) < min_shard_elems:
        return P()
    best = -1
    for d, s in enumerate(shape):
        if s % n_shards == 0 and s >= (shape[best] if best >= 0 else 0):
            best = d
    if best < 0:
        return P()
    spec = [None] * len(shape)
    spec[best] = axis
    return P(*spec)


def fsdp_state_shardings(state, mesh: Mesh, axis: str = "data",
                         min_shard_elems: int = MIN_SHARD_ELEMS):
    """A pytree of ``NamedSharding`` matching ``state``: params and the
    shape-matched optimizer moments sharded leaf-wise over ``axis``;
    scalars, rng, batch_stats (small, BN-mutated) replicated."""
    n = mesh.shape[axis]

    def leaf_sharding(x):
        return NamedSharding(mesh, _leaf_spec(x, n, axis, min_shard_elems))

    repl = NamedSharding(mesh, P())
    return state.replace(
        step=repl,
        params=jax.tree_util.tree_map(leaf_sharding, state.params),
        batch_stats=jax.tree_util.tree_map(lambda _: repl, state.batch_stats),
        opt_state=jax.tree_util.tree_map(leaf_sharding, state.opt_state),
        rng=repl,
    )


def shard_state_fsdp(state, mesh: Mesh, axis: str = "data",
                     min_shard_elems: int = MIN_SHARD_ELEMS):
    """Place (or re-place) a train state FSDP-sharded; returns
    ``(state, shardings)`` — pass ``shardings`` to ``make_train_step``'s
    ``state_shardings`` so the carried output stays sharded."""
    shardings = fsdp_state_shardings(state, mesh, axis, min_shard_elems)
    return jax.device_put(state, shardings), shardings


def state_bytes_per_device(state, shardings=None) -> int:
    """Analytic per-device bytes of the state under ``shardings`` (or
    replicated when None) — the number the memory claim is made from.

    Accepts real arrays OR ``jax.eval_shape`` trees (ShapeDtypeStruct has
    shape/dtype but no nbytes), so the production-config footprint can be
    computed without materializing a 60M-param state."""
    total = 0
    leaves, treedef = jax.tree_util.tree_flatten(state)
    shard_leaves = (jax.tree_util.tree_flatten(shardings)[0]
                    if shardings is not None else [None] * len(leaves))
    for x, s in zip(leaves, shard_leaves):
        if not hasattr(x, "nbytes"):
            shape = getattr(x, "shape", None)
            dtype = getattr(x, "dtype", None)
            if shape is None or dtype is None:
                continue
            x = _AnalyticLeaf(
                int(np.prod(shape)) * np.dtype(dtype).itemsize)
        n = 1
        if s is not None and hasattr(s, "spec"):
            mesh_axes = dict(zip(s.mesh.axis_names, s.mesh.devices.shape))
            for name in s.spec:
                if name is not None:
                    n *= mesh_axes[name]
        total += x.nbytes // n
    return total
