"""kNN edge features for graph convolutions — the generator's hot op.

TPU-native equivalent of reference ``get_edge_features`` /
``get_edge_features_xyz`` (models/PDGNet_v2.py:439-528). The reference
materialises a (B, N, N) distance matrix, runs a full ``torch.sort`` and
then gathers neighbours with a *per-sample Python loop* — the single
biggest inefficiency on its training path (SURVEY.md §3.1). Here the
distance matrix is an MXU matmul, selection is ``lax.top_k`` and the
gather is one batched ``take_along_axis``.

Neighbour selection semantics match the reference exactly: columns
``1..k`` of the ascending distance ordering, i.e. the row minimum (the
point itself) is dropped.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pdgn_tpu.ops.grouping import grouping
from pdgn_tpu.ops.knn import knn_exclude_first
from pdgn_tpu.ops.pairwise import self_pairwise_sqdist

# Explicit (scoped) selection of the kNN regime. The flag is consulted at
# TRACE time, so library code selects it with :func:`exact_knn_scope`
# around whatever builds the jit trace (e.g. the trainer's test phase)
# instead of mutating process env. Like models.layers._MASK_STACK this
# assumes single-threaded tracing (jax traces on the caller's thread).
_EXACT_KNN_OVERRIDE: Optional[bool] = None


@contextlib.contextmanager
def exact_knn_scope(enabled: Optional[bool]):
    """Force the kNN regime within the ``with`` body (None = no-op).

    The primary API for choosing exact graphs
    (``ExperimentConfig.exact_knn`` / ``PDGNTrainer.test(exact_knn=...)``
    route through this); the PDGN_EXACT_KNN env var remains as an
    ambient override for code outside a scope.
    """
    global _EXACT_KNN_OVERRIDE
    if enabled is None:
        yield
        return
    prev = _EXACT_KNN_OVERRIDE
    _EXACT_KNN_OVERRIDE = bool(enabled)
    try:
        yield
    finally:
        _EXACT_KNN_OVERRIDE = prev


def exact_knn_enabled() -> bool:
    """Current kNN regime: False -> fast bf16 graphs, True -> fp32-exact.

    An active :func:`exact_knn_scope` wins; otherwise the PDGN_EXACT_KNN
    env var ("0"/""/unset -> fast, else exact). The trainer's test phase
    *defaults exact on* (quality path: the metric suite dwarfs generation
    time there); pass ``exact_knn=False`` / export ``PDGN_EXACT_KNN=0``
    to force the fast graphs there too.
    """
    import os

    if _EXACT_KNN_OVERRIDE is not None:
        return _EXACT_KNN_OVERRIDE
    return os.environ.get("PDGN_EXACT_KNN", "") not in ("", "0")


# Precision of the feature-space distance matmul used only for neighbour
# *selection*: the default (bf16 on the MXU) is ~15x faster than fp32 and
# only perturbs edge choice at near-ties in a learned feature space. Set
# PDGN_EXACT_KNN=1 for fp32-exact graph construction.
def _graph_precision():
    if exact_knn_enabled():
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def _neighbor_idx(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Feature-space kNN indices 1..k of the ascending ordering.

    Uses the fused Pallas kernel on TPU (no materialised distance matrix);
    falls back to an XLA pairwise + iterative top-k elsewhere.
    """
    from pdgn_tpu.ops.knn import _pallas_knn_ok

    # PDGN_EXACT_KNN demands fp32-exact graphs; the Pallas kernel's
    # feature-space matmul runs at default (bf16) precision, so honour the
    # flag by taking the XLA path with HIGHEST-precision distances.
    exact = exact_knn_enabled()
    if not exact and _pallas_knn_ok(x, k + 1):
        from pdgn_tpu.ops.pallas.knn import knn_topk

        return knn_topk(x, x, k + 1)[..., 1:]
    dist = self_pairwise_sqdist(x, precision=_graph_precision())
    return knn_exclude_first(dist, k)


def neighbor_features(x: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Feature-space kNN indices (1..k, self excluded) plus raw gathered
    neighbours — the un-materialised half of :func:`edge_features`.

    Consumers that are linear in the edge channels (all of PDGN's) should
    prefer this and fold the central term into a per-point GEMM; see
    pdgn_tpu.models.generator. On TPU the kNN and the gather fuse into one
    Pallas kernel (the gather runs as an in-VMEM one-hot MXU matmul —
    values ~fp32-exact via a bf16 hi/lo split; PDGN_EXACT_KNN selects the
    fully exact XLA path instead).

    Returns:
      ``idx (B, N, k)`` int32 and ``nbr (B, N, k, C)``.
    """
    idx = _neighbor_idx(x, k)
    return idx, grouping(x, idx)


def edge_features(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Edge features ``[central, neighbour - central]`` in feature space.

    Args:
      x: ``(B, N, C)`` point features (channel-last).
      k: number of neighbours.

    Returns:
      ``(B, N, k, 2C)``.
    """
    idx = _neighbor_idx(x, k)                           # (B, N, k)
    neighbors = grouping(x, idx)                        # (B, N, k, C)
    central = jnp.broadcast_to(x[:, :, None, :], neighbors.shape)
    return jnp.concatenate([central, neighbors - central], axis=-1)


def edge_features_xyz(
    x: jnp.ndarray, pc: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Edge features plus the matching xyz edge features.

    The kNN graph is built in *feature* space (as in the reference,
    models/PDGNet_v2.py:479-528); coordinates are gathered with the same
    neighbour indices.

    Args:
      x: ``(B, N, C)`` features.
      pc: ``(B, N, 3)`` coordinates.
      k: number of neighbours.

    Returns:
      ``e_fea (B, N, k, 2C)`` and ``e_xyz (B, N, k, 6)``.
    """
    idx = _neighbor_idx(x, k)
    nbr_fea = grouping(x, idx)
    nbr_xyz = grouping(pc, idx)
    central_fea = jnp.broadcast_to(x[:, :, None, :], nbr_fea.shape)
    central_xyz = jnp.broadcast_to(pc[:, :, None, :], nbr_xyz.shape)
    e_fea = jnp.concatenate([central_fea, nbr_fea - central_fea], axis=-1)
    e_xyz = jnp.concatenate([central_xyz, nbr_xyz - central_xyz], axis=-1)
    return e_fea, e_xyz
