"""Mesh and sharding utilities.

Submodules: ``seq_scan`` (sequence-sharded selective scan),
``tensor_parallel`` (Megatron-style TP Mamba mixer / LM forward / decode).
"""

from vivim_tpu.parallel.mesh import (
    make_mesh,
    make_hybrid_mesh,
    shard_batch,
    global_shard_batch,
    replicate,
    data_sharding,
)

__all__ = ["make_mesh", "make_hybrid_mesh", "shard_batch",
           "global_shard_batch", "replicate", "data_sharding"]
