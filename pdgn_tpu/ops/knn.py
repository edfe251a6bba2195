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
    if not return_dist and _pallas_knn_ok(new_xyz, k):
        from pdgn_tpu.ops.pallas.knn import knn_topk

        return knn_topk(new_xyz, xyz, k)
    dist = pairwise_sqdist(new_xyz, xyz)                     # (B, M, N)
    idx = topk_ascending_idx(dist, k)                        # ascending dist
    if return_dist:
        return idx, jnp.take_along_axis(dist, idx, axis=-1)
    return idx


def _pallas_knn_ok(queries: jnp.ndarray, k: int) -> bool:
    """Fused Pallas kNN applies: TPU, 128-multiple query count, k <= 128."""
    import os

    if os.environ.get("PDGN_DISABLE_PALLAS"):
        return False
    if queries.shape[1] % 128 or k > 128:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def topk_ascending_idx(dist: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices of the k smallest entries per row, ascending.

    ``lax.top_k`` lowers to a full sort on TPU — 10x more expensive than
    needed for small k. This does k passes of argmin + mask, which XLA
    keeps fully vectorised; tie-breaking (lowest index first) matches both
    ``lax.top_k`` and the reference's stable sort.

    Args:
      dist: ``(..., M)``.
      k: static small k (intended k <= ~32).

    Returns:
      ``(..., k)`` int32 indices.
    """
    idxs = []
    d = dist
    for _ in range(k):
        i = jnp.argmin(d, axis=-1)
        idxs.append(i.astype(jnp.int32))
        hot = jax.nn.one_hot(i, dist.shape[-1], dtype=jnp.bool_)
        d = jnp.where(hot, jnp.inf, d)
    return jnp.stack(idxs, axis=-1)


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
    return topk_ascending_idx(dist, k + 1)[..., 1:]


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
