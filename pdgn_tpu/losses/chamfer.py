"""Chamfer distances (training loss + evaluation reductions).

TPU-native equivalents of:

* ``ChamferLoss`` (reference utils/chamfer_loss.py:7-39) — *sum*-reduced
  bidirectional CD used by the shape-preserving training loss;
* ``distChamfer`` (reference evaluation/evaluation_metrics.py:35-45) —
  per-point minima in both directions, reference reduction semantics;
* the ``nndistance`` CUDA kernel (reference
  evaluation/pytorch_structural_losses/src/nndistance.cu) — same math,
  here a batched pairwise matmul + row/col min, fused by XLA.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from pdgn_tpu.ops.pairwise import pairwise_sqdist


def chamfer_loss(preds: jnp.ndarray, gts: jnp.ndarray,
                 mask=None) -> jnp.ndarray:
    """Sum-reduced symmetric Chamfer distance.

    Matches reference ``ChamferLoss.forward`` exactly: squared distances,
    summed (not averaged) over batch and points in both directions.
    ``mask`` (B,) zeroes padded samples out of the batch sum.

    Args:
      preds: ``(B, N_p, C)``.
      gts: ``(B, N_g, C)``.

    Returns:
      scalar.
    """
    P = pairwise_sqdist(gts, preds)                      # (B, N_g, N_p)
    loss_1 = jnp.sum(jnp.min(P, axis=1), axis=-1)        # per-pred mins
    loss_2 = jnp.sum(jnp.min(P, axis=2), axis=-1)        # per-gt mins
    per_sample = loss_1 + loss_2                         # (B,)
    if mask is not None:
        per_sample = per_sample * mask.astype(per_sample.dtype)
    return jnp.sum(per_sample)


def dist_chamfer(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-point squared-distance minima in both directions.

    Matches reference ``distChamfer`` / ``distChamferCUDA``: returns
    ``(min-over-a for each b point (B, N_b), min-over-b for each a point
    (B, N_a))``.
    """
    P = pairwise_sqdist(a, b)                            # (B, N_a, N_b)
    return jnp.min(P, axis=1), jnp.min(P, axis=2)


def chamfer_cd(sample: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """The evaluation suite's CD scalar per pair: ``dl.mean + dr.mean``.

    Matches the reduction at reference evaluation_metrics.py:66/108.

    Args:
      sample, ref: ``(B, N, 3)``.

    Returns:
      ``(B,)``.
    """
    dl, dr = dist_chamfer(sample, ref)
    return jnp.mean(dl, axis=1) + jnp.mean(dr, axis=1)
