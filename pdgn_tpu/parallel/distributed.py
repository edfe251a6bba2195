"""Multi-host (DCN) initialisation helpers.

The reference is strictly single-process multi-GPU (nn.DataParallel).
The TPU-native scale-out story is: the same jitted train step over a mesh
that spans hosts — intra-slice traffic rides ICI, cross-host rides DCN —
after a one-time ``jax.distributed.initialize``. No other code changes:
shardings and collectives are host-count agnostic.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialise multi-host JAX (no-op when single-process).

    Arguments default to auto-detection from the TPU environment
    (``jax.distributed.initialize()`` with no args); returns the global
    device count.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    return len(jax.devices())


def local_batch_slice(global_batch: int) -> slice:
    """The host-local slice of a globally-sharded batch.

    Requires the global batch to split evenly across processes (a sharded
    batch axis cannot have a remainder).
    """
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} is not divisible by "
            f"{n} processes")
    per = global_batch // n
    start = jax.process_index() * per
    return slice(start, start + per)
