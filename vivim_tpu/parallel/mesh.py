"""Device mesh and sharding helpers.

The reference is single-GPU (DDP imported but never used,
multiclass_training_folds.py:30,800-811); here data parallelism is
first-class: a 1-D ``data`` mesh axis shards the clip batch, parameters are
replicated, and the gradient all-reduce is inserted by XLA (GSPMD) over ICI.
A ``seq`` axis is reserved for sequence-sharded scans (long-clip mode).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data",
              devices=None) -> Mesh:
    """1-D mesh over available devices (or an explicit device list)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if len(devices) < n_devices:
                # refuse rather than silently building a smaller mesh: a
                # user's -n_devices 8 degrading to 1 device would train
                # at 1/8 the batch with no error anywhere
                raise ValueError(
                    f"requested a {n_devices}-device '{axis}' mesh but "
                    f"only {len(devices)} device(s) are visible "
                    f"({jax.default_backend()} backend)")
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def make_hybrid_mesh(dp: int, seq: int, devices=None) -> Mesh:
    """2-D ("data", "seq") mesh for hybrid data x sequence parallelism:
    the clip batch shards over 'data' (dp rows), Mamba tokens over 'seq'
    (seq columns; parallel/seq_scan.py).  Adjacent devices land in the
    same 'seq' row so the scan-state ring rides the fastest ICI links."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < dp * seq:
        raise ValueError(
            f"hybrid mesh needs {dp}x{seq}={dp * seq} devices, "
            f"have {len(devices)}")
    return Mesh(np.array(devices[:dp * seq]).reshape(dp, seq),
                ("data", "seq"))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch dict on-device, sharded along the batch dim."""
    sharding = data_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding)
        if hasattr(x, "ndim") and x.ndim >= 1 else x,
        batch)


def shard_map_compat(fn, mesh: Mesh, in_specs, out_specs):
    """``jax.shard_map`` across jax versions: resolves the import location
    and the ``check_rep``/``check_vma`` keyword rename once, for every
    shard_map island in the package (seq_scan, tensor_parallel)."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    import inspect

    kw = {}
    sig = inspect.signature(shard_map)
    if "check_rep" in sig.parameters:
        kw["check_rep"] = False
    elif "check_vma" in sig.parameters:
        kw["check_vma"] = False
    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     **kw)


def global_shard_batch(local_batch, mesh: Mesh, axis: str = "data"):
    """Assemble per-host loader shards into one global batch-sharded array.

    Multi-host counterpart of :func:`shard_batch`: each host passes the
    ``batch_size // process_count`` clips its ``DataLoader(process_index,
    process_count)`` loaded, and ``jax.make_array_from_process_local_data``
    stitches them into a single global array sharded over the ``data`` mesh
    axis — no host ever materializes the full batch.  With one process this
    is exactly ``shard_batch``.
    """
    sharding = data_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x))
        if hasattr(x, "ndim") and x.ndim >= 1 else x,
        local_batch)
