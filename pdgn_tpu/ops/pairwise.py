"""Batched pairwise squared distances.

TPU-native equivalent of the reference's pairwise-distance building blocks:
the ``-2*bmm + rowsq + colsq`` expansion used by ``get_edge_features``
(reference models/PDGNet_v2.py:449-454), ``ChamferLoss.batch_pairwise_dist``
(reference utils/chamfer_loss.py:23-39) and ``pairwise_distances``
(reference lib/pointops/functions/pointops.py:348-365).

The inner product term is a batched matmul and runs on the MXU; the squared
norms are rank-1 broadcasts fused by XLA into the same loop nest.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Distances feed neighbour *selection* and metric reductions, so the inner
# products run at fp32 (HIGHEST) rather than the TPU's default bf16 matmul
# precision: a 1e-2 relative error can flip a kNN edge. The contraction dim
# is tiny (3 for xyz, <=512 for features) so this is cheap relative to the
# surrounding convs.
_PREC = jax.lax.Precision.HIGHEST


def pairwise_sqdist(x: jnp.ndarray, y: jnp.ndarray,
                    precision=None) -> jnp.ndarray:
    """Squared euclidean distance between every row of ``x`` and ``y``.

    Args:
      x: ``(..., N, C)``
      y: ``(..., M, C)``

    Returns:
      ``(..., N, M)`` with ``out[..., i, j] = ||x_i - y_j||^2`` computed via
      the ``|x|^2 + |y|^2 - 2<x,y>`` expansion (matches the reference's
      formula, including its numerical behaviour near zero: values can be
      slightly negative for coincident points).
    """
    # Contract over the channel dim: (..., N, C) @ (..., C, M) -> (..., N, M)
    xy = jnp.matmul(x, jnp.swapaxes(y, -1, -2),
                    precision=precision if precision is not None else _PREC,
                    preferred_element_type=jnp.float32)
    x2 = jnp.sum(jnp.square(x), axis=-1, keepdims=True)          # (..., N, 1)
    y2 = jnp.sum(jnp.square(y), axis=-1, keepdims=True)          # (..., M, 1)
    return x2 - 2.0 * xy + jnp.swapaxes(y2, -1, -2)


def self_pairwise_sqdist(x: jnp.ndarray, precision=None) -> jnp.ndarray:
    """``pairwise_sqdist(x, x)`` (kept separate so XLA shares the norms)."""
    xx = jnp.matmul(x, jnp.swapaxes(x, -1, -2),
                    precision=precision if precision is not None else _PREC,
                    preferred_element_type=jnp.float32)
    x2 = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    return x2 - 2.0 * xx + jnp.swapaxes(x2, -1, -2)
