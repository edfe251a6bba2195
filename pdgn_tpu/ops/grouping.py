"""Neighbourhood gathering (grouping) operators.

TPU-native equivalents of the reference's CUDA gather kernels:

* ``grouping``       — lib/pointops/src/grouping/grouping_cuda_kernel.cu
  (forward gather + atomicAdd scatter backward). Here it is a batched
  ``take_along_axis``; XLA emits the gather, and autodiff produces the
  scatter-add backward for free.
* ``grouping_int``   — lib/pointops/src/grouping_int (int labels, fwd only).
* the ``QueryAndGroup`` family — lib/pointops/functions/pointops.py:476-777.

Layout note: this framework is channel-last (``features (B, N, C)``),
whereas the reference is channel-first (``(B, C, N)``). Channel-last keeps
C on the TPU lane dimension so downstream matmuls feed the MXU directly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from pdgn_tpu.ops.ballquery import ballquery
from pdgn_tpu.ops.knn import knn


def grouping(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather neighbour features.

    Equivalent of reference ``pointops.grouping``
    (lib/pointops/functions/pointops.py:122-151) in channel-last layout.

    Args:
      features: ``(B, N, C)``.
      idx: ``(B, M, K)`` int indices into the N axis.

    Returns:
      ``(B, M, K, C)``.
    """
    B, N, C = features.shape
    _, M, K = idx.shape
    # single-axis row gather with global row ids lowers better on TPU than
    # the batched take_along_axis formulation (~20% faster, identical)
    gid = idx.reshape(B, M * K) + (
        jnp.arange(B, dtype=idx.dtype) * N)[:, None]
    out = jnp.take(features.reshape(B * N, C), gid.reshape(-1), axis=0)
    return out.reshape(B, M, K, C)


def grouping_int(labels: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather integer labels by neighbour index.

    Equivalent of reference ``pointops.grouping_int``
    (lib/pointops/src/grouping_int/grouping_int_cuda_kernel.cu:6-29).

    Args:
      labels: ``(B, N)`` integer labels.
      idx: ``(B, M, K)``.

    Returns:
      ``(B, M, K)`` with ``out[b, m, k] = labels[b, idx[b, m, k]]``.
    """
    B, N = labels.shape
    _, M, K = idx.shape
    out = jnp.take_along_axis(labels, idx.reshape(B, M * K), axis=1)
    return out.reshape(B, M, K)


def group_xyz(
    xyz: jnp.ndarray,
    new_xyz: Optional[jnp.ndarray] = None,
    *,
    nsample: int = 32,
    radius: Optional[float] = None,
) -> jnp.ndarray:
    """Group raw neighbour coordinates around each center (no centering).

    Equivalent of reference ``pointops.Gen_QueryAndGroupXYZ``
    (lib/pointops/functions/pointops.py:670-703): kNN (or ball query when a
    radius is given) followed by a coordinate gather. This is the operator
    on the PDGN training hot path (the shape-preserving loss,
    models/PDGNet_v2.py:115,142-143).

    Args:
      xyz: ``(B, N, 3)`` points to group from.
      new_xyz: ``(B, M, 3)`` centers (defaults to ``xyz``).

    Returns:
      ``(B, M, nsample, 3)`` neighbour coordinates.
    """
    if new_xyz is None:
        new_xyz = xyz
    if radius is not None:
        idx = ballquery(radius, nsample, xyz, new_xyz)
    else:
        idx = knn(xyz, new_xyz, nsample)
    return grouping(xyz, idx)


def query_and_group(
    xyz: jnp.ndarray,
    new_xyz: Optional[jnp.ndarray] = None,
    features: Optional[jnp.ndarray] = None,
    idx: Optional[jnp.ndarray] = None,
    *,
    nsample: int = 32,
    radius: Optional[float] = None,
    use_xyz: bool = True,
) -> jnp.ndarray:
    """Query neighbours and group (optionally centred xyz + features).

    Equivalent of reference ``pointops.QueryAndGroup``
    (lib/pointops/functions/pointops.py:526-569): gathers neighbour
    coordinates relative to the center and concatenates grouped features.

    Returns:
      ``(B, M, nsample, 3+C)`` if ``use_xyz`` and features given,
      ``(B, M, nsample, C)`` if features given and not ``use_xyz``,
      ``(B, M, nsample, 3)`` otherwise.
    """
    if new_xyz is None:
        new_xyz = xyz
    if idx is None:
        if radius is not None:
            idx = ballquery(radius, nsample, xyz, new_xyz)
        else:
            idx = knn(xyz, new_xyz, nsample)
    grouped_xyz = grouping(xyz, idx) - new_xyz[:, :, None, :]
    if features is not None:
        grouped_features = grouping(features, idx)
        if use_xyz:
            return jnp.concatenate([grouped_xyz, grouped_features], axis=-1)
        return grouped_features
    if not use_xyz:
        raise ValueError("Cannot have no features and not use xyz as a feature")
    return grouped_xyz


def le_query_and_group(
    xyz: jnp.ndarray,
    new_xyz: Optional[jnp.ndarray] = None,
    features: Optional[jnp.ndarray] = None,
    idx: Optional[jnp.ndarray] = None,
    *,
    nsample: int = 32,
    radius: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Centred neighbour coordinates plus grouped features, returned apart.

    Equivalent of reference ``pointops.Le_QueryAndGroup``
    (lib/pointops/functions/pointops.py:622-668), which returns
    ``(grouped_xyz, grouped_features)`` without concatenation.
    """
    if new_xyz is None:
        new_xyz = xyz
    if idx is None:
        if radius is not None:
            idx = ballquery(radius, nsample, xyz, new_xyz)
        else:
            idx = knn(xyz, new_xyz, nsample)
    grouped_xyz = grouping(xyz, idx) - new_xyz[:, :, None, :]
    if features is None:
        raise ValueError("Le_QueryAndGroup requires features")
    return grouped_xyz, grouping(features, idx)


def le_query_and_group_same_size(
    xyz: jnp.ndarray,
    new_xyz: Optional[jnp.ndarray] = None,
    features: Optional[jnp.ndarray] = None,
    idx: Optional[jnp.ndarray] = None,
    *,
    nsample: int = 32,
    radius: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """:func:`le_query_and_group` restricted to equal-sized point/center sets.

    Equivalent of reference ``pointops.Le_QueryAndGroup_SameSize``
    (lib/pointops/functions/pointops.py:476-523), which is the same
    computation with an ``xyz.size() == new_xyz.size()`` assertion.
    """
    if new_xyz is not None and xyz.shape != new_xyz.shape:
        raise ValueError(
            f"xyz and new_xyz must match: {xyz.shape} vs {new_xyz.shape}")
    return le_query_and_group(xyz, new_xyz, features, idx,
                              nsample=nsample, radius=radius)


def le_query_and_group_only_feature(
    xyz: jnp.ndarray,
    new_xyz: Optional[jnp.ndarray] = None,
    features: Optional[jnp.ndarray] = None,
    idx: Optional[jnp.ndarray] = None,
    *,
    nsample: int = 32,
    radius: Optional[float] = None,
) -> jnp.ndarray:
    """Grouped neighbour features only (no coordinate branch).

    Equivalent of reference ``pointops.Le_QueryAndGroup_OnlyFeature``
    (lib/pointops/functions/pointops.py:705-751): queries neighbours and
    gathers features; the xyz grouping is skipped entirely.
    """
    if new_xyz is None:
        new_xyz = xyz
    if idx is None:
        if radius is not None:
            idx = ballquery(radius, nsample, xyz, new_xyz)
        else:
            idx = knn(xyz, new_xyz, nsample)
    if features is None:
        raise ValueError("Le_QueryAndGroup_OnlyFeature requires features")
    return grouping(features, idx)


def query_and_group_dilate(
    xyz: jnp.ndarray,
    new_xyz: Optional[jnp.ndarray] = None,
    features: Optional[jnp.ndarray] = None,
    idx: Optional[jnp.ndarray] = None,
    *,
    key: Optional[jnp.ndarray] = None,
    nsample: int = 32,
    radius: Optional[float] = None,
    use_xyz: bool = True,
) -> jnp.ndarray:
    """Dilated neighbourhood grouping: query ``2*nsample`` neighbours and
    keep a random ``nsample``-subset of the neighbour slots.

    Equivalent of reference ``pointops.QueryAndGroup_Dilate``
    (lib/pointops/functions/pointops.py:571-620). The reference draws the
    slot subset with host ``np.random.shuffle`` (one draw shared by the
    whole batch); here the draw is an explicit ``jax.random`` permutation
    so it is reproducible and traceable.

    Args:
      key: PRNG key for the slot subset (required unless ``idx`` given
        with exactly ``nsample`` columns already).
    """
    import jax

    if new_xyz is None:
        new_xyz = xyz
    if idx is None:
        if radius is not None:
            idx = ballquery(radius, 2 * nsample, xyz, new_xyz)
        else:
            idx = knn(xyz, new_xyz, 2 * nsample)
    if idx.shape[-1] != nsample:
        if key is None:
            raise ValueError("query_and_group_dilate needs a PRNG key")
        slots = jax.random.permutation(key, idx.shape[-1])[:nsample]
        idx = idx[:, :, slots]
    grouped_xyz = grouping(xyz, idx) - new_xyz[:, :, None, :]
    if features is not None:
        grouped_features = grouping(features, idx)
        if use_xyz:
            return jnp.concatenate([grouped_xyz, grouped_features], axis=-1)
        return grouped_features
    if not use_xyz:
        raise ValueError("Cannot have no features and not use xyz as a feature")
    return grouped_xyz


def group_all(
    xyz: jnp.ndarray,
    features: Optional[jnp.ndarray] = None,
    *,
    use_xyz: bool = True,
) -> jnp.ndarray:
    """Group the whole cloud as a single neighbourhood.

    Equivalent of reference ``pointops.GroupAll``
    (lib/pointops/functions/pointops.py:753-777).

    Returns:
      ``(B, 1, N, 3+C)`` / ``(B, 1, N, C)`` / ``(B, 1, N, 3)``.
    """
    grouped_xyz = xyz[:, None, :, :]
    if features is not None:
        grouped_features = features[:, None, :, :]
        if use_xyz:
            return jnp.concatenate([grouped_xyz, grouped_features], axis=-1)
        return grouped_features
    return grouped_xyz
