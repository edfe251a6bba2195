"""Three-nearest-neighbour search and weighted feature interpolation.

TPU-native equivalents of the reference interpolation kernels
(lib/pointops/src/interpolation/interpolation_cuda_kernel.cu):

* ``three_nn`` — per-point best-3 scan (:6-60); here a batched pairwise
  distance + ``top_k``. Like the reference wrapper
  (lib/pointops/functions/pointops.py:61-83) it returns *euclidean*
  distances (the wrapper applies ``sqrt``) and int32 indices.
* ``interpolate`` — weighted 3-point feature blend, forward (:64-86);
  the scatter-add backward (:90-114) is supplied by autodiff.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from pdgn_tpu.ops.pairwise import pairwise_sqdist


def three_nn(
    unknown: jnp.ndarray, known: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Three nearest neighbours of each ``unknown`` point among ``known``.

    Args:
      unknown: ``(B, N, 3)``.
      known: ``(B, M, 3)``.

    Returns:
      ``dist (B, N, 3)`` euclidean distances (ascending) and
      ``idx (B, N, 3)`` int32 indices.
    """
    d2 = pairwise_sqdist(unknown, known)                 # (B, N, M)
    neg, idx = jax.lax.top_k(-d2, 3)
    # clamp tiny negative values produced by the |x|^2+|y|^2-2xy expansion
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx.astype(jnp.int32)


def interpolate(
    features: jnp.ndarray, idx: jnp.ndarray, weight: jnp.ndarray
) -> jnp.ndarray:
    """Weighted linear interpolation of 3 neighbour features (channel-last).

    Equivalent of reference ``pointops.interpolation``
    (lib/pointops/functions/pointops.py:86-119).

    Args:
      features: ``(B, M, C)`` source features.
      idx: ``(B, N, 3)`` neighbour indices into M.
      weight: ``(B, N, 3)`` blend weights.

    Returns:
      ``(B, N, C)`` interpolated features.
    """
    B, M, C = features.shape
    N = idx.shape[1]
    gathered = jnp.take_along_axis(
        features, idx.reshape(B, N * 3)[..., None], axis=1
    ).reshape(B, N, 3, C)
    return jnp.sum(gathered * weight[..., None], axis=2)


def three_interpolate_weights(dist: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Inverse-distance weights used by PointNet++-style decoders.

    Args:
      dist: ``(B, N, 3)`` euclidean distances from :func:`three_nn`.

    Returns:
      ``(B, N, 3)`` weights normalised to sum to 1.
    """
    recip = 1.0 / (dist + eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)
