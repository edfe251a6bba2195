"""Fused local mean/covariance Pallas TPU kernels (shape-preserving loss).

The trainer's shape-preserving loss (reference ``get_local_pair`` /
``compute_mean_covariance``, models/PDGNet_v2.py:127-155) reduces each
point's 20-NN neighbourhood to its mean and 3x3 covariance. The XLA
composition (kNN -> (B, M, K, 3) gather -> einsum, scatter-add backward)
is gather/scatter-bound: across the six resolution pairs of a train step
it costs tens of milliseconds of pure HBM index traffic.

The key identity: with ``OH`` the (M, N) *summed* one-hot matrix of each
center's K neighbours, the first and second neighbourhood moments are one
matmul against a 12-lane payload ``P = [xyz | vec(xyz xyz^T)]``:

    s1 = OH @ xyz          (K * mean)
    S2 = OH @ vec(outer)   (K * E[y y^T])

and the covariance follows in shifted (catastrophic-cancellation-free)
form around the center coordinate ``c``:

    cov = (S2 - c s1^T - s1 c^T + K c c^T) / K - (mu - c)(mu - c)^T.

The forward kernel therefore computes distances (fp32-exact direct
differences, as the CUDA knnquery does), extracts the K nearest with the
reference's first-min tie-break, accumulates OH on the fly and performs
the payload matmul — the neighbourhood tensor never exists. Two exact
selection implementations are provided (``PDGN_LOCAL_STATS_SELECT``):
the k-iteration first-min ``chain`` and a bitwise binary-search
``radix`` select whose pass count is independent of k (see
``_radix_select``). Both produce the identical selected set; ``radix``
is the default (measured faster at training shapes, PERF.md round 4).

The backward is even better: the cotangent of each neighbour value is an
*affine function of the neighbour coordinate* with per-center
coefficients,

    d y_j = alpha_t + G_t y_j,   G = (g_cov + g_cov^T)/K,
                                 alpha = g_mu/K - G mu,

so the scatter collapses to ``OH^T @ [alpha | G]`` — a transposed one-hot
matmul accumulated per sample — followed by a tiny per-point contraction
``d_src = S_alpha + S_G y`` in XLA. No (B, M, K, 3) residuals, no
scatter-add. The selection residual is two words per center — the k-th
distance ``theta`` and the last selected lane — from which the backward
rebuilds the one-hot mask in a few full-width passes
(``d < theta  |  (d == theta & lane <= tie)``; the round-3 version
stored k indices and replayed k compare-adds). Distances recompute
bit-identically in the backward (same fp32 inputs, same expression).

Centers receive no gradient (they only steer the non-differentiated kNN
graph), matching the autodiff of the gather formulation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_T = 128  # center rows per grid step

_F32 = dict(preferred_element_type=jnp.float32)


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())), **_F32)


def _dot_t(a, b):
    """Contract the leading axis: ``(T, N)^T @ (T, F) -> (N, F)``."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())), **_F32)


def _chain_select(d, lane, k):
    """Reference-semantics selection by k sequential first-min picks.

    Returns ``(oh, theta, tie)``: the summed one-hot mask, the k-th
    smallest distance (the final iteration's min — values are knocked
    out smallest-first, so the running min is nondecreasing) and the
    final selected lane. The chain picks theta-ties in increasing lane
    order, so the last pick is the LARGEST selected theta-tie and the
    selected set is exactly {d < theta} u {d == theta and lane <= tie}.
    ~6 full-width VPU passes per iteration (two reductions + mask,
    accumulate, knockout) => ~6k passes.
    """
    N = d.shape[1]
    oh = jnp.zeros_like(d)
    mv = am = None
    for j in range(k):
        mv = jnp.min(d, axis=1, keepdims=True)
        am = jnp.min(jnp.where(d <= mv, lane, N), axis=1, keepdims=True)
        msk = lane == am
        oh = oh + msk.astype(jnp.float32)
        d = jnp.where(msk, jnp.inf, d)
    return oh, mv, am


def _radix_select(d, lane, k):
    """Exact (theta, tie) by bitwise binary search — same selected set
    as ``_chain_select``, fewer passes for practical k.

    Non-negative fp32 order-matches its int32 bit pattern, so the k-th
    smallest distance (with multiplicity) is found by a 31-step MSB->LSB
    search on the bitcast values: keep the largest prefix ``p`` with
    ``count(bits < p) < k``; the window halves each step, ending at
    theta exactly. The boundary lane is the same search over the <=11
    lane-index bits restricted to the theta-tie set. ~2 passes per step
    (compare + row-sum) => ~(31 + lanebits) * 2 + 5 passes, independent
    of k — vs the chain's ~6k. Selection semantics are IDENTICAL
    (first-min tie-break); this is a pure speed variant
    (PDGN_LOCAL_STATS_SELECT=radix).
    """
    N = d.shape[1]
    T = d.shape[0]
    bits = jax.lax.bitcast_convert_type(d, jnp.int32)     # d >= 0: monotone
    kf = float(k)

    p = jnp.zeros((T, 1), jnp.int32)
    for b in range(30, -1, -1):                           # sign bit never set
        cand = p | (1 << b)
        cnt = jnp.sum((bits < cand).astype(jnp.float32), axis=1,
                      keepdims=True)
        p = jnp.where(cnt >= kf, p, cand)
    less = bits < p
    lessf = less.astype(jnp.float32)
    c_less = jnp.sum(lessf, axis=1, keepdims=True)
    r = kf - c_less                                       # rank in tie set
    eq = bits == p

    tie = jnp.zeros((T, 1), jnp.int32)
    for b in range((N - 1).bit_length() - 1, -1, -1):
        cand = tie | (1 << b)
        cnt = jnp.sum(jnp.where(eq & (lane < cand), 1.0, 0.0), axis=1,
                      keepdims=True)
        tie = jnp.where(cnt >= r, tie, cand)
    oh = lessf + jnp.where(eq & (lane <= tie), 1.0, 0.0)
    theta = jax.lax.bitcast_convert_type(p, jnp.float32)
    return oh, theta, tie


_SELECTS = {"chain": _chain_select, "radix": _radix_select}


def _fwd_kernel(k: int, select: str, c_ref, srct_ref, p_hi_ref, p_lo_ref,
                theta_ref, tie_ref, mu_ref, cov_ref):
    T = c_ref.shape[1]
    N = srct_ref.shape[2]

    d = jnp.zeros((T, N), jnp.float32)
    for ch in range(3):
        diff = c_ref[0, :, ch:ch + 1] - srct_ref[0, ch:ch + 1, :]
        d = d + diff * diff

    lane = jax.lax.broadcasted_iota(jnp.int32, (T, N), 1)
    # compact selection residual for the backward: theta and the last
    # selected theta-tie lane — the backward rebuilds the one-hot mask
    # from two words/center instead of k stored indices (distances
    # recompute bit-identically: same fp32 inputs, same expression).
    oh, theta, tie = _SELECTS[select](d, lane, k)
    theta_ref[0] = theta
    tie_ref[0] = tie

    ohb = oh.astype(jnp.bfloat16)
    s = _dot(ohb, p_hi_ref[0]) + _dot(ohb, p_lo_ref[0])  # (T, 12) fp32
    s1 = s[:, 0:3]
    s2 = s[:, 3:12]                                       # row-major 3x3
    c = c_ref[0].astype(jnp.float32)                      # (T, 3)
    kf = float(k)
    mu = s1 / kf
    mu_ref[0] = mu
    # shifted covariance around the center coordinate
    cs1 = jnp.concatenate([c[:, i:i + 1] * s1 for i in range(3)], axis=-1)
    s1c = jnp.concatenate([s1[:, i:i + 1] * c for i in range(3)], axis=-1)
    cc = jnp.concatenate([c[:, i:i + 1] * c for i in range(3)], axis=-1)
    dmu = mu - c
    dd = jnp.concatenate([dmu[:, i:i + 1] * dmu for i in range(3)], axis=-1)
    cov_ref[0] = (s2 - cs1 - s1c + kf * cc) / kf - dd


def _bwd_kernel(k: int, c_ref, srct_ref, theta_ref, tie_ref, mu_ref,
                gmu_ref, gcov_ref, acc_ref):
    T = c_ref.shape[1]
    N = srct_ref.shape[2]
    t = pl.program_id(1)

    # rebuild the selection mask from the (theta, tie) residual in a few
    # full-width passes (the k-iteration index-compare rebuild this
    # replaces was ~40 passes): recompute the distances bit-identically
    # and apply the exact set characterisation from the forward.
    d = jnp.zeros((T, N), jnp.float32)
    for ch in range(3):
        diff = c_ref[0, :, ch:ch + 1] - srct_ref[0, ch:ch + 1, :]
        d = d + diff * diff
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, N), 1)
    theta = theta_ref[0]                                  # (T, 1)
    tie = tie_ref[0]                                      # (T, 1)
    oh = ((d < theta) | ((d == theta) & (lane <= tie))
          ).astype(jnp.float32)

    kf = float(k)
    g = gcov_ref[0]                                       # (T, 9) row-major
    # G = (g_cov + g_cov^T) / K, row-major lanes: gt[3i+j] = g[3j+i]
    gt = jnp.concatenate(
        [g[:, 3 * j + i:3 * j + i + 1] for i in range(3) for j in range(3)],
        axis=-1)
    G = (g + gt) / kf                                     # (T, 9)
    mu = mu_ref[0]
    # alpha = g_mu / K - G @ mu (per-row 3x3 times 3)
    Gmu = jnp.concatenate(
        [jnp.sum(G[:, 3 * i:3 * i + 3] * mu, axis=1, keepdims=True)
         for i in range(3)], axis=-1)                     # (T, 3)
    alpha = gmu_ref[0] / kf - Gmu
    rows = jnp.concatenate([alpha, G], axis=-1)           # (T, 12)

    @pl.when(t == 0)
    def _():
        # zero once per sample (the (1, N, 12) block is revisited across
        # the t steps of each b and written back when b advances)
        acc_ref[0] = jnp.zeros_like(acc_ref[0])

    acc_ref[0] = acc_ref[0] + _dot_t(oh, rows)            # (N, 12)


def _payload(src):
    srcf = src.astype(jnp.float32)
    outer = (srcf[..., :, None] * srcf[..., None, :]).reshape(
        src.shape[0], src.shape[1], 9)
    p = jnp.concatenate([srcf, outer], axis=-1)           # (B, N, 12)
    hi = jax.lax.optimization_barrier(p.astype(jnp.bfloat16))
    lo = jax.lax.optimization_barrier(
        (p - hi.astype(jnp.float32)).astype(jnp.bfloat16))
    return hi, lo


def _fwd_pallas(src, centers, k, interpret, select="chain"):
    B, M, _ = centers.shape
    N = src.shape[1]
    cf = centers.astype(jnp.float32)
    srct = jnp.swapaxes(src.astype(jnp.float32), 1, 2)    # (B, 3, N)
    p_hi, p_lo = _payload(src)

    def tspec(shape):
        return pl.BlockSpec(shape, lambda b, t: (b, t, 0),
                            memory_space=pltpu.VMEM)

    def bspec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape, lambda b, t, _n=nd: (b,) + (0,) * (_n - 1),
            memory_space=pltpu.VMEM)

    theta, tie, mu, cov = pl.pallas_call(
        functools.partial(_fwd_kernel, k, select),
        grid=(B, M // _T),
        in_specs=[tspec((1, _T, 3)), bspec((1, 3, N)),
                  bspec((1, N, 12)), bspec((1, N, 12))],
        out_specs=(tspec((1, _T, 1)), tspec((1, _T, 1)),
                   tspec((1, _T, 3)), tspec((1, _T, 9))),
        out_shape=(jax.ShapeDtypeStruct((B, M, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, M, 1), jnp.int32),
                   jax.ShapeDtypeStruct((B, M, 3), jnp.float32),
                   jax.ShapeDtypeStruct((B, M, 9), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(cf, srct, p_hi, p_lo)
    return theta, tie, mu, cov


def _bwd_pallas(src, centers, theta, tie, mu, g_mu, g_cov, k, interpret):
    B, M, _ = centers.shape
    N = src.shape[1]
    cf = centers.astype(jnp.float32)
    srct = jnp.swapaxes(src.astype(jnp.float32), 1, 2)

    def tspec(shape):
        return pl.BlockSpec(shape, lambda b, t: (b, t, 0),
                            memory_space=pltpu.VMEM)

    def bspec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape, lambda b, t, _n=nd: (b,) + (0,) * (_n - 1),
            memory_space=pltpu.VMEM)

    acc = pl.pallas_call(
        functools.partial(_bwd_kernel, k),
        grid=(B, M // _T),
        in_specs=[tspec((1, _T, 3)), bspec((1, 3, N)), tspec((1, _T, 1)),
                  tspec((1, _T, 1)),
                  tspec((1, _T, 3)), tspec((1, _T, 3)), tspec((1, _T, 9))],
        out_specs=bspec((1, N, 12)),
        out_shape=jax.ShapeDtypeStruct((B, N, 12), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(cf, srct, theta, tie, mu, g_mu.astype(jnp.float32),
      g_cov.astype(jnp.float32))
    s_alpha = acc[..., 0:3]
    s_g = acc[..., 3:12].reshape(B, N, 3, 3)
    srcf = src.astype(jnp.float32)
    d_src = s_alpha + jnp.einsum("bnij,bnj->bni", s_g, srcf)
    return d_src.astype(src.dtype)


def _reference(src, centers, k):
    """jnp composition (kNN + gather + moments) — non-TPU fallback."""
    from pdgn_tpu.losses.shape_preserving import compute_mean_covariance
    from pdgn_tpu.ops.grouping import group_xyz

    grouped = group_xyz(src, centers, nsample=k)          # (B, M, K, 3)
    mu, cov = compute_mean_covariance(grouped)
    B, M = mu.shape[:2]
    return mu, cov.reshape(B, M, 9)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _fused(src, centers, k, interpret, select="chain"):
    _, _, mu, cov = _fwd_pallas(src, centers, k, interpret, select)
    return mu, cov


def _fused_fwd(src, centers, k, interpret, select="chain"):
    theta, tie, mu, cov = _fwd_pallas(src, centers, k, interpret, select)
    return (mu, cov), (src, centers, theta, tie, mu)


def _fused_bwd(k, interpret, select, res, cts):
    # select only affects how the forward FOUND (theta, tie); the
    # residual and the rebuilt mask are representation-identical
    src, centers, theta, tie, mu = res
    g_mu, g_cov = cts
    d_src = _bwd_pallas(src, centers, theta, tie, mu, g_mu, g_cov, k,
                        interpret)
    # centers only steer the (non-differentiated) kNN graph
    return d_src, jnp.zeros_like(centers)


_fused.defvjp(_fused_fwd, _fused_bwd)


def local_stats_ok(src, centers, k: int) -> bool:
    import os

    if os.environ.get("PDGN_DISABLE_PALLAS"):
        return False
    if centers.shape[1] % _T or src.shape[1] > 0x10000:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def local_mean_cov(src: jnp.ndarray, centers: jnp.ndarray, k: int = 20, *,
                   interpret: bool = False, select: str = None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean and covariance of each center's k-NN neighbourhood in ``src``.

    Args:
      src: ``(B, N, 3)`` neighbour source cloud.
      centers: ``(B, M, 3)`` query centers (kNN *includes* the query point
        when ``src is centers`` — reference knnquery semantics).
      k: neighbourhood size.
      select: selection implementation, ``"chain"`` or ``"radix"`` —
        identical exact results, different pass structure (see
        ``_radix_select``). Defaults to ``$PDGN_LOCAL_STATS_SELECT`` or
        ``"radix"`` (measured faster at training shapes: 46.1 vs
        51.0 ms/iter wall, 72.1 vs 85.3 ms device time for the B=35
        shape-loss fwd+bwd program — PERF.md round-4 A/B).

    Returns:
      ``mu (B, M, 3)`` and ``cov (B, M, 9)`` fp32 (reference 1/K biased
      normalisation).
    """
    if select is None:
        import os

        select = os.environ.get("PDGN_LOCAL_STATS_SELECT", "radix")
    if select not in _SELECTS:
        raise ValueError(f"unknown local-stats select {select!r}; "
                         f"expected one of {sorted(_SELECTS)}")
    if local_stats_ok(src, centers, k) or interpret:
        return _fused(src, centers, k, interpret, select)
    return _reference(src, centers, k)
