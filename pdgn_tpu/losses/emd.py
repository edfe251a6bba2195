"""Approximate Earth Mover's Distance (auction/Sinkhorn-style matching).

TPU-native re-architecture of the reference ``approxmatch`` CUDA kernel
(evaluation/pytorch_structural_losses/src/approxmatch.cu:3-224): nine
temperature rounds (``level = -4^j`` for ``j = 7..-1``) of alternating
row/column mass balancing over the full ``n x m`` kernel matrix, followed
by the matched-transport cost ``sum(match * ||x-y||)``.

Key design departures from the CUDA version (same algorithm, same math):

* **No materialised match matrix.** The cost is linear in the per-round
  transport increment, so each round's contribution
  ``ratioL^T (K ⊙ sqrt(D)) ratioR`` is folded into a scalar accumulator.
  This removes the reference's dominant HBM traffic (read+write of the
  ``n x m`` match matrix per pair) and is what collapses the ~2 h
  evaluation phase to minutes (SURVEY.md §3.2).
* **Matvec formulation.** The three balancing passes are contractions of
  the kernel matrix ``K = exp(level * D)`` with the running mass vectors —
  batched matmuls on the MXU; ``K`` is built once per round instead of
  three times (the CUDA kernel recomputes the exponentials per pass).
* **Gradients by recomputation.** The reference backward treats ``match``
  as constant (match_cost.py:31-42). Here a ``custom_vjp`` recomputes the
  rounds on the backward pass and accumulates the same
  ``sum_l match[k,l] * (x1_k - x2_l)/dist`` terms — no O(n*m) residuals.

``multiL``/``multiR`` replicate the C integer division of the reference
(approxmatch.cu:6-12), which only matters when ``n != m``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from pdgn_tpu.ops.pairwise import pairwise_sqdist

# j = 7, 6, ..., -1  (the reference's j == -2 / level == 0 branch is
# unreachable: its loop is `for (j=7; j>-2; j--)`)
_LEVELS = tuple(-(4.0 ** j) for j in range(7, -2, -1))

_MM = functools.partial(
    jnp.matmul,
    precision=jax.lax.Precision.HIGHEST,
    preferred_element_type=jnp.float32,
)


def _multipliers(n: int, m: int) -> Tuple[float, float]:
    if n >= m:
        return 1.0, float(n // m)
    return float(m // n), 1.0


def _fast_exp_neg(x: jnp.ndarray) -> jnp.ndarray:
    """Approximate ``exp(x)`` for ``x <= 0`` (max rel err ~5e-5).

    Exponent-bit assembly plus a degree-5 polynomial for the fractional
    power of two. The reference CUDA kernel uses the approximate
    ``__expf`` (approxmatch.cu:55), so this would be parity-faithful —
    but swapping it into the eval loop measured 3x SLOWER than the
    library exp (the op chain breaks XLA's elementwise fusion). Kept,
    unused, as the candidate for a future Pallas-kernel exp where the
    fusion is explicit.
    """
    LOG2E = 1.4426950408889634
    y = jnp.maximum(x * LOG2E, -126.0)
    i = jnp.floor(y)
    f = y - i
    p = ((((0.0018775767 * f + 0.0089893397) * f + 0.0558617245) * f
          + 0.2402290070) * f + 0.6931471805) * f + 1.0
    pow2i = jax.lax.bitcast_convert_type(
        (i.astype(jnp.int32) + 127) << 23, jnp.float32)
    return p * pow2i


def _rounds(xyz1, xyz2, with_grads: bool, compact_dist: bool = False,
            with_cd: bool = False):
    """Run the 9 balancing rounds; return cost (and grads / CD if requested).

    ``compact_dist`` stores the distance matrix in bfloat16 — the XLA path
    is HBM-bound on re-reading D each round, so this halves the wall clock
    at a ~0.1% metric-level perturbation (used by the evaluation pipeline;
    the loss/gradient path stays fp32).
    """
    B, n, _ = xyz1.shape
    m = xyz2.shape[1]
    multiL, multiR = _multipliers(n, m)

    D = pairwise_sqdist(xyz1, xyz2)                       # (B, n, m)
    D = jnp.maximum(D, 0.0)
    cd = None
    if with_cd:
        cd = jnp.mean(jnp.min(D, axis=1), axis=-1) + jnp.mean(
            jnp.min(D, axis=2), axis=-1)
    if compact_dist:
        # pin the bf16 residency: --xla_allow_excess_precision would
        # otherwise elide the down-cast and keep D in fp32, losing the
        # halved HBM traffic this exists for. The up-cast happens inside
        # the round body so only the bf16 array lives across rounds.
        D = jax.lax.optimization_barrier(D.astype(jnp.bfloat16))
    # 1/dist clamped as in the reference grad kernels (rsqrtf(max(d2,1e-20)))
    inv_dist = (jax.lax.rsqrt(jnp.maximum(D.astype(jnp.float32), 1e-20))
                if with_grads else None)

    remainL = jnp.full((B, n), multiL, jnp.float32)
    remainR = jnp.full((B, m), multiR, jnp.float32)
    cost = jnp.zeros((B,), jnp.float32)
    g1 = jnp.zeros_like(xyz1) if with_grads else None
    g2 = jnp.zeros_like(xyz2) if with_grads else None

    levels = jnp.asarray(_LEVELS, jnp.float32)

    def body(i, state):
        remainL, remainR, cost, g1, g2 = state
        Df = D.astype(jnp.float32)                        # (B, n, m)
        dist = jnp.sqrt(Df)                               # fused (elementwise)
        # NOTE: two optimizations were tried here and both measured
        # SLOWER, so this stays a plain exp: (a) forcing an explicit bf16
        # materialisation of K (XLA already CSEs the exp across the three
        # contractions; the barrier only added HBM traffic), and (b) a
        # 14-op polynomial fast-exp (_fast_exp_neg) — it broke XLA's
        # fusion and tripled the wall clock, disproving the exp-bound
        # hypothesis. See PERF.md.
        K = jnp.exp(levels[i] * Df)

        # pass 1: per-row share of the remaining left mass
        suml = _MM(K, remainR[..., None])[..., 0]         # (B, n)
        ratioL = remainL / (suml + 1e-9)

        # pass 2: right absorption + right remainder update
        sumr = _MM(jnp.swapaxes(K, -1, -2), ratioL[..., None])[..., 0]
        sumr = sumr * remainR
        consumption = jnp.minimum(remainR / (sumr + 1e-9), 1.0)
        ratioR = consumption * remainR
        remainR = jnp.maximum(0.0, remainR - sumr)

        # pass 3: transport increment w = K ⊙ ratioL⊗ratioR;
        # fold cost (and grads) immediately instead of storing match
        suml2 = ratioL * _MM(K, ratioR[..., None])[..., 0]
        remainL = jnp.maximum(0.0, remainL - suml2)
        Kd = K * dist
        cost = cost + jnp.einsum(
            "bn,bnm,bm->b", ratioL, Kd, ratioR,
            precision=jax.lax.Precision.HIGHEST,
        )

        if with_grads:
            # match[k,l]/dist[k,l] summed against coordinate differences:
            # grad1_k = x1_k * rowsum(W) - W @ x2,  W = K*ratioL*ratioR/dist
            Winv = K * inv_dist
            rowW = ratioL * _MM(Winv, ratioR[..., None])[..., 0]   # (B, n)
            Wx2 = ratioL[..., None] * _MM(Winv, ratioR[..., None] * xyz2)
            g1 = g1 + xyz1 * rowW[..., None] - Wx2
            colW = ratioR * _MM(jnp.swapaxes(Winv, -1, -2),
                                ratioL[..., None])[..., 0]         # (B, m)
            Wx1 = ratioR[..., None] * _MM(jnp.swapaxes(Winv, -1, -2),
                                          ratioL[..., None] * xyz1)
            g2 = g2 + xyz2 * colW[..., None] - Wx1

        return remainL, remainR, cost, g1, g2

    state = (remainL, remainR, cost, g1, g2)
    state = jax.lax.fori_loop(0, len(_LEVELS), body, state)
    _, _, cost, g1, g2 = state
    return cost, g1, g2, cd


def cd_emd_xla(xyz1: jnp.ndarray, xyz2: jnp.ndarray,
               compact_dist: bool = True):
    """Evaluation-path fused Chamfer + EMD (one distance matrix per pair).

    Computes the per-pair CD (``dl.mean + dr.mean``) and the un-normalised
    approxmatch cost from a single D, with D stored in bfloat16 by default
    (the eval loop is HBM-bound on re-reading D each balancing round).

    Returns ``(cd (B,), cost (B,))``.
    """
    cost, _, _, cd = _rounds(xyz1, xyz2, with_grads=False,
                             compact_dist=compact_dist, with_cd=True)
    return cd, cost


@jax.custom_vjp
def match_cost(xyz1: jnp.ndarray, xyz2: jnp.ndarray) -> jnp.ndarray:
    """Approximate-EMD transport cost ``sum(match * ||x1-x2||)`` per pair.

    Equivalent of reference ``match_cost``
    (evaluation/pytorch_structural_losses/match_cost.py). Args are
    ``(B, n, 3)`` / ``(B, m, 3)``; returns ``(B,)``.
    """
    cost, _, _, _ = _rounds(xyz1, xyz2, with_grads=False)
    return cost


def _match_cost_fwd(xyz1, xyz2):
    return match_cost(xyz1, xyz2), (xyz1, xyz2)


def _match_cost_bwd(res, g):
    xyz1, xyz2 = res
    _, g1, g2, _ = _rounds(xyz1, xyz2, with_grads=True)
    return g[..., None, None] * g1, g[..., None, None] * g2


match_cost.defvjp(_match_cost_fwd, _match_cost_bwd)


def emd_approx(sample: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Per-pair EMD, normalised by point count.

    Matches reference ``emd_approx`` (evaluation_metrics.py:26-31),
    including its equal-size requirement.
    """
    n, n_ref = sample.shape[1], ref.shape[1]
    if n != n_ref:
        raise ValueError(f"EMD requires equal point counts, got {n} vs {n_ref}")
    return match_cost(sample, ref) / float(n)
