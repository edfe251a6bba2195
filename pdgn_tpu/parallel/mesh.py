"""Device-mesh helpers for data-parallel training and sharded evaluation.

TPU-native replacement for the reference's multi-GPU layer
(``nn.DataParallel`` wrapping G and all four Ds, models/PDGNet_v2.py:101-105,
plus the vendored-but-unused lib/sync_bn). Instead of replicate/scatter/
gather per forward, the batch is sharded over a 1-D ``data`` mesh axis and
the whole train step runs under ``jit``; XLA inserts the gradient
reductions (psum over ICI) automatically from the sharding annotations.

Batch-norm semantics note: under ``jit`` with a sharded batch, batch
statistics are *global* (the mathematically-synced behaviour the vendored
sync_bn was meant to provide). The reference's actual DataParallel runs
used per-replica statistics; see ``pdgn_tpu.parallel.sync_bn`` for the
per-replica emulation used in parity tests.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              batch_size: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices.

    When ``batch_size`` is given, uses the largest device count that
    divides it (a sharded batch axis must split evenly).
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if batch_size is not None:
        n = len(devices)
        while n > 1 and batch_size % n:
            n -= 1
        if n < len(devices):
            import warnings

            warnings.warn(
                f"batch_size={batch_size} is not divisible by the "
                f"{len(devices)} available devices; using {n} device(s). "
                f"Pick a batch size divisible by {len(devices)} to use the "
                "whole mesh.", stacklevel=2)
        devices = devices[:n]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place every array in ``tree`` with its batch axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    """Replicate every array in ``tree`` across the mesh."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
