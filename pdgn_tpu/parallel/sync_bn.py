"""Cross-replica batch-norm semantics.

The reference vendors Synchronized-BatchNorm-PyTorch (lib/sync_bn/, 640
LoC of master/slave thread queues + ReduceAddCoalesced) but never imports
it — its models run plain ``nn.BatchNorm*`` under ``DataParallel`` with
*per-replica* statistics (SURVEY.md §2.3).

On TPU both behaviours are one-liners:

* **Synced (global) stats** — the default everywhere in this framework:
  run the jitted step over a batch sharded across the mesh; XLA computes
  the batch mean/variance globally (inserting the collectives itself).
  This is what sync-BN was *for*; no queues, no threads.
* **Per-replica stats** — the reference's actual DataParallel behaviour:
  wrap the step in ``jax.shard_map`` (not vmapped BN axes) so each shard
  normalises with its local statistics, or equivalently use
  :func:`per_replica_batch_norm` below inside a mapped axis.

``cross_replica_moments`` is the primitive both reductions share.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def cross_replica_moments(
    x: jnp.ndarray,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean/variance over all axes but the last, optionally psum-reduced
    across a mapped device axis (the sync-BN collective)."""
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x, axis=axes)
    mean_sq = jnp.mean(jnp.square(x), axis=axes)
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        mean_sq = jax.lax.pmean(mean_sq, axis_name)
    var = mean_sq - jnp.square(mean)
    return mean, var


def batch_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    axis_name: Optional[str] = None,
    epsilon: float = 1e-5,
) -> jnp.ndarray:
    """Functional batch norm with optional cross-replica statistics."""
    mean, var = cross_replica_moments(x, axis_name)
    inv = jax.lax.rsqrt(var + epsilon)
    return (x - mean) * inv * scale + bias


def per_replica_batch_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    epsilon: float = 1e-5,
) -> jnp.ndarray:
    """Local-statistics batch norm (the reference DataParallel behaviour).

    Call inside ``shard_map``/``vmap`` over the device axis.
    """
    return batch_norm(x, scale, bias, axis_name=None, epsilon=epsilon)
