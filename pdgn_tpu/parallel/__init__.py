"""Mesh + collective utilities (data parallelism, sync batch norm)."""

from pdgn_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from pdgn_tpu.parallel.sync_bn import (
    batch_norm,
    cross_replica_moments,
    per_replica_batch_norm,
)

__all__ = [
    "DATA_AXIS",
    "batch_norm",
    "batch_sharding",
    "cross_replica_moments",
    "make_mesh",
    "per_replica_batch_norm",
    "replicate",
    "replicated",
    "shard_batch",
]
