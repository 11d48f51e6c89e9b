"""Mesh and sharding utilities.

Submodules: ``seq_scan`` (sequence-sharded selective scan),
``tensor_parallel`` (Megatron-style TP Mamba mixer / LM forward / decode),
``fsdp`` (ZeRO-style param + optimizer sharding over the ``data`` axis),
``pipeline`` (GPipe-style stage-sharded LM layer stack over a ``pipe``
axis), ``expert`` (expert-parallel Switch-MoE FFN over an ``expert``
axis).
"""

from vivim_tpu.parallel.mesh import (
    make_mesh,
    make_hybrid_mesh,
    shard_batch,
    global_shard_batch,
    replicate,
    data_sharding,
)
from vivim_tpu.parallel.fsdp import (
    fsdp_state_shardings,
    shard_state_fsdp,
)

__all__ = ["make_mesh", "make_hybrid_mesh", "shard_batch",
           "global_shard_batch", "replicate", "data_sharding",
           "fsdp_state_shardings", "shard_state_fsdp"]
