"""Nearest-centroid feature distribution.

TPU-native equivalents of the reference kernels
(lib/pointops/src/featuredistribute/featuredistribute_cuda_kernel.cu):

* ``feature_distribute`` — per-point nearest index into ``max_xyz``
  (:4-30, strict ``<`` scan == first-min tie-break, matching ``argmin``).
* ``feature_gather`` — feature select by that index (:53-122); the
  scatter-add backward is supplied by autodiff.
"""

from __future__ import annotations

import jax.numpy as jnp

from pdgn_tpu.ops.pairwise import pairwise_sqdist


def feature_distribute(max_xyz: jnp.ndarray, xyz: jnp.ndarray) -> jnp.ndarray:
    """Index of the nearest ``max_xyz`` point for every ``xyz`` point.

    Args:
      max_xyz: ``(B, N, 3)`` centroids.
      xyz: ``(B, M, 3)`` points.

    Returns:
      ``(B, M)`` int32 indices into N.
    """
    d2 = pairwise_sqdist(xyz, max_xyz)             # (B, M, N)
    return jnp.argmin(d2, axis=-1).astype(jnp.int32)


def feature_gather(max_feature: jnp.ndarray, distribute_idx: jnp.ndarray) -> jnp.ndarray:
    """Gather features by distribution index (channel-last).

    Args:
      max_feature: ``(B, N, C)``.
      distribute_idx: ``(B, M)``.

    Returns:
      ``(B, M, C)``.
    """
    return jnp.take_along_axis(max_feature, distribute_idx[..., None], axis=1)
