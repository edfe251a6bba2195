"""Segmentation label statistics over local neighbourhoods.

TPU-native equivalents of the reference labelstat kernels
(lib/pointops/src/labelstat/labelstat_cuda_kernel.cu):

* ``labelstat_ballrange``      — sum per-class stats over *all* points
  within the radius (:76-107).
* ``labelstat_idx``            — sum per-class stats over an explicit
  neighbour index set.
* ``labelstat_and_ballquery``  — ball query (first-``nsample``, first-hit
  padding) plus stats over the first ``nsample`` hits only — the CUDA
  kernel breaks out of the scan once the sample cap is reached (:27-48).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from pdgn_tpu.ops.ballquery import ballquery
from pdgn_tpu.ops.pairwise import pairwise_sqdist


def labelstat_ballrange(
    radius: float,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    label_stat: jnp.ndarray,
) -> jnp.ndarray:
    """Per-class counts over every point within ``radius`` of each center.

    Args:
      xyz: ``(B, N, 3)``.
      new_xyz: ``(B, M, 3)``.
      label_stat: ``(B, N, nclass)`` int counts.

    Returns:
      ``(B, M, nclass)`` int32.
    """
    d2 = pairwise_sqdist(new_xyz, xyz)                         # (B, M, N)
    mask = (d2 < radius * radius).astype(label_stat.dtype)
    # (B, M, N) @ (B, N, nclass) contraction on the MXU
    return jnp.matmul(mask, label_stat).astype(jnp.int32)


def labelstat_idx(label_stat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Per-class counts over an explicit neighbour index set.

    Args:
      label_stat: ``(B, N, nclass)``.
      idx: ``(B, M, nsample)`` indices into N.

    Returns:
      ``(B, M, nclass)`` int32.
    """
    B, N, nclass = label_stat.shape
    _, M, K = idx.shape
    gathered = jnp.take_along_axis(
        label_stat, idx.reshape(B, M * K)[..., None], axis=1
    ).reshape(B, M, K, nclass)
    return jnp.sum(gathered, axis=2).astype(jnp.int32)


def labelstat_and_ballquery(
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    label_stat: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ball query plus per-class counts over the first ``nsample`` hits.

    Matches the CUDA kernel's early break: only hits with in-ball rank
    below ``nsample`` contribute to the statistics.

    Returns:
      ``idx (B, M, nsample)`` int32 and ``new_label_stat (B, M, nclass)``.
    """
    idx = ballquery(radius, nsample, xyz, new_xyz)
    d2 = pairwise_sqdist(new_xyz, xyz)
    mask = d2 < radius * radius
    rank = jnp.cumsum(mask.astype(jnp.int32), axis=-1) - 1
    counted = (mask & (rank < nsample)).astype(label_stat.dtype)
    stats = jnp.matmul(counted, label_stat).astype(jnp.int32)
    return idx, stats
