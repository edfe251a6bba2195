"""Shape-preserving multi-resolution consistency loss.

TPU-native equivalent of the reference trainer's ``get_local_pair`` /
``compute_mean_covariance`` (models/PDGNet_v2.py:127-155): for a pair of
generated resolutions, group each cloud's 20-NN neighbourhoods around the
*coarser* cloud's points, reduce each neighbourhood to its mean and 3x3
covariance, and penalise the Chamfer distance between the two statistic
sets (normalised by the coarse point count).

On TPU the kNN + gather + covariance chain is one fused Pallas kernel
with an analytic backward (ops/pallas/local_stats.py): the neighbourhood
moments are a single one-hot matmul against a 12-lane payload and the
backward collapses to a transposed one-hot matmul — no (B, M, K, 3)
tensor in either direction (the reference needed the custom grouping
CUDA backward for the scatter this avoids). Elsewhere it is the XLA
composition: pairwise matmul (MXU) -> top-k -> batched gather -> small
einsum, with the scatter-add backward supplied by autodiff.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from pdgn_tpu.losses.chamfer import chamfer_loss


def compute_mean_covariance(
    grouped: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean and covariance of each neighbourhood.

    Args:
      grouped: ``(B, M, K, 3)`` neighbourhood coordinates.

    Returns:
      ``mu (B, M, 3)`` and ``cov (B, M, 3, 3)`` with the reference's
      ``1/K`` (biased) normalisation.
    """
    K = grouped.shape[2]
    mu = jnp.mean(grouped, axis=2)
    d = grouped - mu[:, :, None, :]
    cov = jnp.einsum(
        "bmki,bmkj->bmij", d, d,
        precision=jax.lax.Precision.HIGHEST,
    ) / float(K)
    return mu, cov


def get_local_pair(
    pt1: jnp.ndarray,
    pt2: jnp.ndarray,
    nsample: int = 20,
    mask=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Local-statistics Chamfer pair for two resolutions of one shape.

    Both neighbourhood sets are centred on ``pt1`` (the coarser cloud),
    matching reference models/PDGNet_v2.py:136-155; the kNN *includes* the
    query point (reference knnquery semantics).

    Args:
      pt1: ``(B, M, 3)`` coarser generated cloud (channel-last).
      pt2: ``(B, N, 3)`` finer generated cloud.

    Returns:
      ``(like_mu, like_cov)`` scalars, each a sum-reduced Chamfer distance
      divided by ``M``.
    """
    from pdgn_tpu.ops.pallas.local_stats import local_mean_cov

    M = pt1.shape[1]
    mu1, cov1 = local_mean_cov(pt1, pt1, nsample)    # (B,M,3), (B,M,9)
    mu2, cov2 = local_mean_cov(pt2, pt1, nsample)
    like_mu = chamfer_loss(mu1, mu2, mask) / float(M)
    like_cov = chamfer_loss(cov1, cov2, mask) / float(M)
    return like_mu, like_cov


def shape_preserving_terms(
    clouds: Tuple[jnp.ndarray, ...],
    nsample: int = 20,
    mask=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``(mu_total, cov_total)`` over all resolution pairs, deduplicated.

    Pair (a, b) needs the *self* statistics of the coarser cloud
    (``local_mean_cov(pt_a, pt_a)``) and the pair-specific cross
    statistics of ``pt_b`` centred on ``pt_a``. The self statistics are
    identical across every pair sharing the coarse cloud, so they are
    computed once per resolution here (the reference recomputes them per
    pair, models/PDGNet_v2.py:232-237 — same values, ~3x the kernel
    launches for the coarse clouds).
    """
    from pdgn_tpu.ops.pallas.local_stats import local_mean_cov

    mu_total = 0.0
    cov_total = 0.0
    self_stats = {
        i: local_mean_cov(clouds[i], clouds[i], nsample)
        for i in range(len(clouds) - 1)
    }
    for i in range(len(clouds)):
        for j in range(i + 1, len(clouds)):
            M = clouds[i].shape[1]
            mu1, cov1 = self_stats[i]
            mu2, cov2 = local_mean_cov(clouds[j], clouds[i], nsample)
            mu_total = mu_total + chamfer_loss(mu1, mu2, mask) / float(M)
            cov_total = cov_total + chamfer_loss(cov1, cov2, mask) / float(M)
    return mu_total, cov_total


def shape_preserving_loss(
    clouds: Tuple[jnp.ndarray, ...],
    nsample: int = 20,
    mu_weight: float = 1.0,
    cov_weight: float = 1.0,
    mask=None,
) -> jnp.ndarray:
    """Sum of local-statistics losses over all resolution pairs.

    The reference evaluates the 6 pairs (1,2)(1,3)(1,4)(2,3)(2,4)(3,4)
    (models/PDGNet_v2.py:232-237) and weights mu/cov terms per network
    version: v2 uses 1.0/1.0 (``:251-252``), v1 uses 1.0/5.0
    (models/PDGNet.py:262-263).
    """
    mu_total, cov_total = shape_preserving_terms(clouds, nsample, mask=mask)
    return mu_weight * mu_total + cov_weight * cov_total
