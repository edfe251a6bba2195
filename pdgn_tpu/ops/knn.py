"""Exact k-nearest-neighbour queries.

TPU-native equivalent of the reference's brute-force CUDA kNN
(`knnquery_cuda_kernel.cu:6-50`, one thread per query point with an
insertion sort) and of the sort-based neighbour selection inside
``get_edge_features`` (reference models/PDGNet_v2.py:449-458).

Instead of a per-point scalar loop, the distance matrix tile is produced by
an MXU matmul and the k smallest entries are selected with ``lax.top_k``.
Tie-breaking matches the reference: ascending distance, equal distances
resolved in favour of the lower point index (the CUDA insertion sort uses a
strict ``<`` so the first-seen index wins; ``lax.top_k`` breaks ties the
same way on the negated distances, and ``argsort`` is stable).

Unlike the CUDA kernel there is no ``nsample <= 200`` cap.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from pdgn_tpu.ops.pairwise import pairwise_sqdist


def knn(
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray | None,
    k: int,
    *,
    return_dist: bool = False,
) -> jnp.ndarray | Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest points of ``xyz`` around each center in ``new_xyz``.

    Matches reference ``pointops.knnquery`` (lib/pointops/functions/
    pointops.py:408-434): the query point itself is *included* when the
    center set coincides with the point set.

    Args:
      xyz: ``(B, N, 3)`` points to search.
      new_xyz: ``(B, M, 3)`` query centers, or ``None`` to use ``xyz``.
      k: number of neighbours.

    Returns:
      ``idx (B, M, k)`` int32 (and ``dist2 (B, M, k)`` if requested),
      ordered by ascending squared distance.
    """
    if new_xyz is None:
        new_xyz = xyz
    dist = pairwise_sqdist(new_xyz, xyz)                     # (B, M, N)
    neg_d, idx = jax.lax.top_k(-dist, k)                     # ascending dist
    idx = idx.astype(jnp.int32)
    if return_dist:
        return idx, -neg_d
    return idx


def knn_exclude_first(
    dist: jnp.ndarray,
    k: int,
) -> jnp.ndarray:
    """Neighbour indices 1..k of the ascending ordering (drops the nearest).

    Matches the edge-feature selection of the reference generator
    (models/PDGNet_v2.py:457-458): ``sort(dist)[..., 1:k+1]`` — the column
    dropped is the row minimum (normally the point itself).

    Args:
      dist: ``(B, N, N)`` pairwise (squared) distances.
      k: neighbours to keep after dropping the first.

    Returns:
      ``(B, N, k)`` int32 indices.
    """
    _, idx = jax.lax.top_k(-dist, k + 1)
    return idx[..., 1:].astype(jnp.int32)


def knn_naive(
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray | None,
    k: int,
) -> jnp.ndarray:
    """Stable-argsort oracle for :func:`knn`.

    Port of the reference's redundant pure-torch oracle ``KNNQueryNaive``
    (lib/pointops/functions/pointops.py:368-405); used by the test suite to
    cross-check :func:`knn` (the reference shipped it as dead code — here it
    is the unit-test oracle).
    """
    if new_xyz is None:
        new_xyz = xyz
    dist = pairwise_sqdist(new_xyz, xyz)
    order = jnp.argsort(dist, axis=-1, stable=True)
    return order[..., :k].astype(jnp.int32)
