"""Radius (ball) neighbourhood query with order-dependent padding.

TPU-native equivalent of the reference CUDA ball query
(lib/pointops/src/ballquery/ballquery_cuda_kernel.cu:6-44): for each query
center, take the first ``nsample`` points (in point-index order) whose
squared distance is strictly below ``radius**2``; every remaining slot is
padded with the *first* hit; if there is no hit at all the row stays 0.

The CUDA kernel's early-exit scan is inherently sequential; on TPU the same
semantics fall out of a mask + cumulative-sum rank + scatter, which XLA
vectorises across all rows.
"""

from __future__ import annotations

import jax.numpy as jnp

from pdgn_tpu.ops.pairwise import pairwise_sqdist


def ballquery(
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
) -> jnp.ndarray:
    """First-``nsample``-within-radius neighbour indices.

    Args:
      radius: ball radius.
      nsample: slots per center.
      xyz: ``(B, N, 3)`` points.
      new_xyz: ``(B, M, 3)`` centers.

    Returns:
      ``(B, M, nsample)`` int32 indices (reference semantics incl. padding).
    """
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    dist2 = pairwise_sqdist(new_xyz, xyz)                      # (B, M, N)
    mask = dist2 < (radius * radius)
    # rank of each hit among the hits of its row (0-based, index order)
    rank = jnp.cumsum(mask.astype(jnp.int32), axis=-1) - 1     # (B, M, N)
    point_idx = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[None, None, :], (B, M, N)
    )
    # scatter point k into slot rank[k]; non-hits / overflow slots dropped
    slot = jnp.where(mask & (rank < nsample), rank, nsample)
    out = jnp.zeros((B, M, nsample + 1), jnp.int32)
    bidx = jnp.arange(B)[:, None, None]
    midx = jnp.arange(M)[None, :, None]
    out = out.at[bidx, midx, slot].set(point_idx, mode="drop")
    out = out[..., :nsample]
    # pad slots >= hit count with the first hit (0 when the row has no hit)
    cnt = jnp.sum(mask, axis=-1, keepdims=True)                # (B, M, 1)
    first_hit = out[..., :1]
    slots = jnp.arange(nsample, dtype=jnp.int32)[None, None, :]
    return jnp.where(slots < cnt, out, first_hit)
