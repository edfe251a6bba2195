"""Furthest point sampling and index-gather.

TPU-native equivalents of the reference sampling kernels
(lib/pointops/src/sampling/sampling_cuda_kernel.cu):

* ``furthest_point_sample`` — iterative farthest-point sampling
  (``furthestsampling_cuda`` at :58-168). The CUDA version parallelises
  the per-iteration argmax with a shared-memory tree reduction; here the
  iteration is a ``lax.fori_loop`` whose body is a fully vectorised
  distance update + argmax over the point axis (VPU), batched over B.
* ``gather_points`` — index select (``gathering_forward_cuda`` at :6-24)
  with the scatter-add backward (:28-46) supplied by autodiff.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def furthest_point_sample(xyz: jnp.ndarray, m: int) -> jnp.ndarray:
    """Sample ``m`` points by iterative farthest-point sampling.

    Matches the reference CUDA semantics: the first selected point is index
    0; each iteration selects the point maximising the running minimum
    squared distance to the selected set (ties -> lowest index, as in the
    kernel's first-max tree reduction for distinct values).

    Args:
      xyz: ``(B, N, 3)``.
      m: number of samples.

    Returns:
      ``(B, m)`` int32 indices.
    """
    B, N, _ = xyz.shape

    def body(i, state):
        idxs, last, mind2 = state
        # squared distance of every point to the last selected point
        d2 = jnp.sum(jnp.square(xyz - last[:, None, :]), axis=-1)  # (B, N)
        mind2 = jnp.minimum(mind2, d2)
        nxt = jnp.argmax(mind2, axis=-1).astype(jnp.int32)         # (B,)
        idxs = idxs.at[:, i].set(nxt)
        last = jnp.take_along_axis(xyz, nxt[:, None, None], axis=1)[:, 0, :]
        return idxs, last, mind2

    idxs = jnp.zeros((B, m), jnp.int32)
    last = xyz[:, 0, :]
    mind2 = jnp.full((B, N), 1e10, xyz.dtype)
    idxs, _, _ = jax.lax.fori_loop(1, m, body, (idxs, last, mind2))
    return idxs


def gather_points(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Select points/features by index (channel-last).

    Equivalent of reference ``pointops.gathering``
    (lib/pointops/functions/pointops.py:33-58).

    Args:
      features: ``(B, N, C)``.
      idx: ``(B, M)`` int indices.

    Returns:
      ``(B, M, C)``.
    """
    return jnp.take_along_axis(features, idx[..., None], axis=1)
