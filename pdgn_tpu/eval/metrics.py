"""Generative point-cloud metric suite: MMD / COV / 1-NNA (CD & EMD) + JSD.

TPU-native re-architecture of reference evaluation/evaluation_metrics.py.
The reference computes the (N_sample, N_ref) distance matrices with an
*outer Python loop over single samples* and a CUDA kernel launch per
chunk (:85-121) — the ~2-hour test phase. Here the pairwise matrices are
produced by one jitted tile program: a (TS, TR) tile of cloud pairs is
flattened into a batch of (N, N) problems, Chamfer reduces to batched
matmul + row/col min, and EMD uses the matvec approxmatch
(pdgn_tpu.losses.emd). Tiles stream through the device; remainders are
padded and masked.

Reduction definitions (mean-over-points CD, cost/N EMD, transposed
off-diagonal block in the 1-NNA matrix, min/argmin MMD/COV) follow the
reference exactly — including its quirk that ``knn`` receives the
(N_s, N_r) sample-vs-ref matrix where a (N_r, N_s) block is expected
(:191), which is only shape-consistent because the test phase uses
N_s == N_r.

JSD follows reference :206-321: occupancy over a 28^3 grid *clipped to the
unit sphere* (``in_unit_sphere=True``), nearest-center assignment (here an
exact argmin over the surviving centers, replacing sklearn's KDTree), and
the dual-computation cross-check between the two JSD formulas.
"""

from __future__ import annotations

import functools
import warnings
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import entropy

from pdgn_tpu.losses.chamfer import chamfer_cd
from pdgn_tpu.losses.emd import match_cost


# ------------------------------------------------------------------ pairwise
def _select_impl(n: int, m: int, with_emd: bool) -> str:
    """Pick the pair-tile implementation.

    ``PDGN_EVAL_IMPL`` overrides: ``pallas`` (fused VMEM kernel), ``xla``
    (single-D bf16-compact jnp path), ``exact`` (fp32 jnp, the oracle
    path). Default on TPU is the Pallas kernel when shapes allow (both
    faster and ~20x closer to the exact fp32 result than the bf16-D XLA
    path), falling back to ``xla``; everywhere else ``exact``.
    """
    import os

    forced = os.environ.get("PDGN_EVAL_IMPL")
    if forced:
        return forced
    if not (with_emd and n == m):
        return "exact"
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    if not on_tpu:
        return "exact"
    if n % 256 == 0 and not os.environ.get("PDGN_DISABLE_PALLAS"):
        return "pallas"
    return "xla"


def _pair_tile_impl(sample_tile: jnp.ndarray, ref_tile: jnp.ndarray,
                    with_emd: bool, impl: str
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Traceable all-pairs core shared by the jitted single-device tile
    program and the shard_map per-device body."""
    S, N, _ = sample_tile.shape
    R = ref_tile.shape[0]
    a = jnp.broadcast_to(sample_tile[:, None], (S, R, N, 3)).reshape(S * R, N, 3)
    b = jnp.broadcast_to(ref_tile[None, :], (S, R, N, 3)).reshape(S * R, N, 3)
    # the fused paths always compute EMD (it dominates their cost), so a
    # CD-only request must not take them
    if impl == "pallas" and with_emd:
        if N % 256 == 0:
            import os

            from pdgn_tpu.ops.pallas import fused_cd_emd

            # opt-in accuracy/speed trade: bf16 storage for the kernel's
            # cached exp-base matrix (see fused_cd_emd docstring / PERF.md).
            # ""/"0"/unset -> off, matching the repo's other env flags
            # (PDGN_EXACT_KNN=0, PDGN_JAX_CACHE=0 mean "disable").
            bf16_cache = os.environ.get(
                "PDGN_EMD_BF16_CACHE", "") not in ("", "0")
            cd, cost = fused_cd_emd(a, b, bf16_cache=bf16_cache)
            return cd.reshape(S, R), (cost / float(N)).reshape(S, R)
        impl = "xla"  # kernel shape requirement unmet: next-fastest path
    if impl == "xla" and with_emd:
        from pdgn_tpu.losses.emd import cd_emd_xla

        cd, cost = cd_emd_xla(a, b)
        return cd.reshape(S, R), (cost / float(N)).reshape(S, R)
    cd = chamfer_cd(a, b).reshape(S, R)
    if with_emd:
        emd = (match_cost(a, b) / float(N)).reshape(S, R)
    else:
        emd = jnp.zeros((S, R), jnp.float32)
    return cd, emd


@functools.partial(jax.jit, static_argnames=("with_emd", "impl"))
def _pair_tile(sample_tile: jnp.ndarray, ref_tile: jnp.ndarray,
               with_emd: bool = True,
               impl: str = "exact") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All-pairs CD (and EMD) between two tiles of clouds.

    Args:
      sample_tile: ``(S, N, 3)``.
      ref_tile: ``(R, N, 3)``.

    Returns:
      ``cd (S, R)`` and ``emd (S, R)`` (zeros when ``with_emd=False``).
    """
    return _pair_tile_impl(sample_tile, ref_tile, with_emd, impl)


@functools.lru_cache(maxsize=None)
def _sharded_pair_rows(mesh, with_emd: bool, impl: str, tile: int):
    """Build the jitted shard_map program computing one row block.

    Each device holds ``tile`` sample clouds (batch axis sharded over the
    mesh's data axis) and the full replicated reference set; it streams
    its (tile, R) strip through ``lax.map`` over reference tiles — the
    (N_s, N_r) pairwise matrix distributed exactly as SURVEY.md's
    "embarrassingly shardable across chips" design note calls for.
    """
    from pdgn_tpu.parallel.mesh import DATA_AXIS
    from jax.sharding import PartitionSpec as P

    def body(s_loc, ref_all):
        R = ref_all.shape[0]
        ref_tiles = ref_all.reshape(R // tile, tile, *ref_all.shape[1:])

        def one(rt):
            return _pair_tile_impl(s_loc, rt, with_emd, impl)

        cd, emd = jax.lax.map(one, ref_tiles)      # (nc, tile, tile)
        perm = (1, 0, 2)
        return (cd.transpose(perm).reshape(tile, R),
                emd.transpose(perm).reshape(tile, R))

    return jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(DATA_AXIS), P()),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        # the approxmatch fori_loop seeds its carry with replicated
        # zeros, which the varying-manual-axes checker rejects against
        # the device-varying body output; the body is embarrassingly
        # parallel (no collectives), so the check adds nothing here
        check_vma=False))


def _pairwise_sharded(mesh, sp, rp, Ns, Nr, tile, with_emd, impl, verbose):
    """Row-block distribution of the pairwise matrices over a mesh."""
    n_dev = mesh.devices.size
    block = tile * n_dev

    def pad(x, t):
        b = x.shape[0]
        rem = (-b) % t
        if rem:
            x = jnp.concatenate([x, jnp.zeros((rem,) + x.shape[1:], x.dtype)])
        return x

    sp = pad(sp, block)
    rp = pad(rp, tile)
    from pdgn_tpu.parallel.mesh import batch_sharding, replicated

    rp = jax.device_put(rp, replicated(mesh))
    f = _sharded_pair_rows(mesh, with_emd, impl, tile)
    cd_rows = []
    emd_rows = []
    n_row = sp.shape[0] // block
    for i in range(n_row):
        srow = jax.device_put(
            jax.lax.dynamic_slice_in_dim(sp, i * block, block),
            batch_sharding(mesh))
        c, e = f(srow, rp)
        cd_rows.append(c)
        emd_rows.append(e)
        if verbose:
            print(f"pairwise sharded row block {i + 1}/{n_row}", flush=True)
    cd = np.concatenate([np.asarray(c) for c in cd_rows])
    emd = np.concatenate([np.asarray(e) for e in emd_rows])
    return cd[:Ns, :Nr], emd[:Ns, :Nr]


def pairwise_cd_emd(
    sample_pcs,
    ref_pcs,
    tile: int = 8,
    with_emd: bool = True,
    verbose: bool = False,
    symmetric: bool = False,
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Full (N_sample, N_ref) CD and EMD matrices, tiled on device.

    Equivalent of reference ``_pairwise_EMD_CD_`` (evaluation_metrics.py:
    85-121) — with the per-sample launch loop replaced by (tile x tile)
    pair blocks (``tile^2`` EMD problems per device program).

    ``symmetric=True`` (only valid when ``sample_pcs is ref_pcs``
    conceptually — same set vs itself, as in the 1-NNA within-set
    matrices) computes one triangle and mirrors it. CD is exactly
    symmetric; approxmatch EMD is asymmetric at the ~0.1% level, so this
    is an opt-in speedup, not the reference-parity default.

    ``mesh``: a :class:`jax.sharding.Mesh` with a ``data`` axis. When it
    has more than one device, row blocks of the sample axis are
    distributed across the mesh (each device computes its (tile, N_ref)
    strip against the replicated reference set) — per-tile numerics are
    identical to the single-device path. ``mesh`` and ``symmetric`` are
    mutually exclusive speedups: the triangle path is single-device, so
    ``symmetric=True`` takes precedence and ``mesh`` is ignored.
    """
    sample_pcs = jnp.asarray(sample_pcs, jnp.float32)
    ref_pcs = jnp.asarray(ref_pcs, jnp.float32)
    Ns, N, _ = sample_pcs.shape
    Nr = ref_pcs.shape[0]
    impl0 = _select_impl(N, int(ref_pcs.shape[1]), with_emd)
    if mesh is not None and mesh.devices.size > 1 and not symmetric:
        return _pairwise_sharded(mesh, sample_pcs, ref_pcs, Ns, Nr, tile,
                                 with_emd, impl0, verbose)

    def pad(x, t):
        b = x.shape[0]
        rem = (-b) % t
        if rem:
            x = jnp.concatenate([x, jnp.zeros((rem,) + x.shape[1:], x.dtype)])
        return x

    sp = pad(sample_pcs, tile)
    rp = pad(ref_pcs, tile)
    impl = impl0
    cd = np.zeros((sp.shape[0], rp.shape[0]), np.float32)
    emd = np.zeros_like(cd)
    n_row = sp.shape[0] // tile
    n_col = rp.shape[0] // tile
    # dispatch asynchronously and keep a bounded window of tiles in
    # flight — converting each tile immediately would force a host sync
    # per tile and serialize the device
    pending = []
    window = 16

    def drain(limit):
        while len(pending) > limit:
            i0, j0, c0, e0 = pending.pop(0)
            cd[i0 * tile:(i0 + 1) * tile,
               j0 * tile:(j0 + 1) * tile] = np.asarray(c0)
            emd[i0 * tile:(i0 + 1) * tile,
                j0 * tile:(j0 + 1) * tile] = np.asarray(e0)

    for i in range(n_row):
        srow = jax.lax.dynamic_slice_in_dim(sp, i * tile, tile)
        for j in range(n_col):
            if symmetric and j < i:
                continue
            rcol = jax.lax.dynamic_slice_in_dim(rp, j * tile, tile)
            c, e = _pair_tile(srow, rcol, with_emd, impl)
            pending.append((i, j, c, e))
            drain(window)
        if verbose:
            print(f"pairwise tile row {i + 1}/{n_row}", flush=True)
    drain(0)
    if symmetric:
        upper = np.triu_indices(cd.shape[0], 1)
        cd[(upper[1], upper[0])] = cd[upper]
        emd[(upper[1], upper[0])] = emd[upper]
    return cd[:Ns, :Nr], emd[:Ns, :Nr]


# ---------------------------------------------------------------- reductions
def lgan_mmd_cov(all_dist: np.ndarray) -> Dict[str, float]:
    """MMD / COV from a (N_sample, N_ref) matrix (reference :157-169)."""
    N_ref = all_dist.shape[1]
    min_val_fromsmp = all_dist.min(axis=1)
    min_idx = all_dist.argmin(axis=1)
    min_val = all_dist.min(axis=0)
    return {
        "lgan_mmd": float(min_val.mean()),
        "lgan_cov": float(len(np.unique(min_idx)) / float(N_ref)),
        "lgan_mmd_smp": float(min_val_fromsmp.mean()),
    }


def knn_classifier(Mxx: np.ndarray, Mxy: np.ndarray, Myy: np.ndarray,
                   k: int, sqrt: bool = False) -> Dict[str, float]:
    """Leave-one-out k-NN two-sample classifier (reference ``knn``, :125-154).

    ``x`` rows (label 1) are the reference set, ``y`` (label 0) the samples.
    """
    n0, n1 = Mxx.shape[0], Myy.shape[0]
    label = np.concatenate([np.ones(n0), np.zeros(n1)])
    M = np.block([[Mxx, Mxy], [Mxy.T, Myy]]).astype(np.float64)
    if sqrt:
        M = np.sqrt(np.abs(M))
    np.fill_diagonal(M, np.inf)
    # only the SET of k nearest per column matters (majority vote).
    # Stable argsort at chair scale (n=1324: full matrix ~14 MB) keeps
    # the pinned lowest-index tie order; past that, O(n^2 log n) and the
    # materialised argsort get expensive, so switch to O(n^2)
    # argpartition — same set except for exact float64 ties at the k-th
    # boundary, which distinct cloud pairs never produce
    n = M.shape[0]
    if n <= 4096 or k + 1 >= n:
        idx = np.argsort(M, axis=0, kind="stable")[:k]    # k smallest per col
    else:
        idx = np.argpartition(M, k - 1, axis=0)[:k]
    count = label[idx].sum(axis=0)
    pred = (count >= (float(k) / 2)).astype(np.float64)

    tp = float((pred * label).sum())
    fp = float((pred * (1 - label)).sum())
    fn = float(((1 - pred) * label).sum())
    tn = float(((1 - pred) * (1 - label)).sum())
    return {
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "precision": tp / (tp + fp + 1e-10),
        "recall": tp / (tp + fn + 1e-10),
        "acc_t": tp / (tp + fn + 1e-10),
        "acc_f": tn / (tn + fp + 1e-10),
        "acc": float((pred == label).mean()),
    }


def EMD_CD(sample_pcs, ref_pcs, batch_size: int,
           reduced: bool = True) -> Dict[str, np.ndarray]:
    """Paired (row-wise) CD/EMD means (reference ``EMD_CD``, :48-82)."""
    sample_pcs = jnp.asarray(sample_pcs, jnp.float32)
    ref_pcs = jnp.asarray(ref_pcs, jnp.float32)
    assert sample_pcs.shape[0] == ref_pcs.shape[0]
    N = sample_pcs.shape[0]
    cd_lst, emd_lst = [], []
    for s in range(0, N, batch_size):
        a = sample_pcs[s:s + batch_size]
        b = ref_pcs[s:s + batch_size]
        cd_lst.append(np.asarray(chamfer_cd(a, b)))
        emd_lst.append(np.asarray(match_cost(a, b) / float(a.shape[1])))
    cd = np.concatenate(cd_lst)
    emd = np.concatenate(emd_lst)
    if reduced:
        return {"MMD-CD": cd.mean(), "MMD-EMD": emd.mean()}
    return {"MMD-CD": cd, "MMD-EMD": emd}


def compute_all_metrics(sample_pcs, ref_pcs, batch_size: Optional[int] = None,
                        tile: int = 8, verbose: bool = False,
                        fast_symmetric: bool = False,
                        mesh=None, with_emd: bool = True) -> Dict[str, float]:
    """The full suite (reference ``compute_all_metrics``, :172-200).

    ``batch_size`` is accepted for API parity; tiling replaces it.
    ``fast_symmetric`` mirrors the within-set (rr/ss) matrices from one
    triangle — ~1.5x faster overall, perturbs 1-NNA by ~0.1% (EMD is not
    exactly symmetric); off by default for reference parity.
    ``mesh`` distributes every pairwise matrix across its devices (see
    :func:`pairwise_cd_emd`). ``with_emd=False`` skips the EMD family
    (the pairwise approxmatch dominates the suite's cost; CPU parity
    sweeps at large N use the CD+JSD half only). Note that on TPU
    ``with_emd=False`` also switches the CD computation to the ``exact``
    pair-tile path (the fused pallas/xla paths always compute EMD), so
    CD-only results differ from the full suite's CD at the fused paths'
    numeric tolerance; force ``PDGN_EVAL_IMPL=exact`` to compare the two
    modes bit-identically.
    """
    results: Dict[str, float] = {}
    M_rs_cd, M_rs_emd = pairwise_cd_emd(sample_pcs, ref_pcs, tile=tile,
                                        verbose=verbose, mesh=mesh,
                                        with_emd=with_emd)

    fams = (("CD", M_rs_cd), ("EMD", M_rs_emd)) if with_emd \
        else (("CD", M_rs_cd),)
    for name, M in fams:
        res = lgan_mmd_cov(M.T)
        results.update({f"{k}-{name}": v for k, v in res.items()})

    M_rr_cd, M_rr_emd = pairwise_cd_emd(ref_pcs, ref_pcs, tile=tile,
                                        verbose=verbose, with_emd=with_emd,
                                        symmetric=fast_symmetric, mesh=mesh)
    M_ss_cd, M_ss_emd = pairwise_cd_emd(sample_pcs, sample_pcs, tile=tile,
                                        verbose=verbose, with_emd=with_emd,
                                        symmetric=fast_symmetric, mesh=mesh)

    one_nn_cd = knn_classifier(M_rr_cd, M_rs_cd, M_ss_cd, 1, sqrt=False)
    results.update({f"1-NN-CD-{k}": v for k, v in one_nn_cd.items()
                    if "acc" in k})
    if with_emd:
        one_nn_emd = knn_classifier(M_rr_emd, M_rs_emd, M_ss_emd, 1,
                                    sqrt=False)
        results.update({f"1-NN-EMD-{k}": v for k, v in one_nn_emd.items()
                        if "acc" in k})
    return results


# ----------------------------------------------------------------------- JSD
def unit_cube_grid_point_cloud(resolution: int, clip_sphere: bool = False
                               ) -> Tuple[np.ndarray, float]:
    """Cell centers of a resolution^3 grid in the unit cube
    (reference :206-224)."""
    spacing = 1.0 / float(resolution - 1)
    coords = np.arange(resolution, dtype=np.float32) * spacing - 0.5
    grid = np.stack(np.meshgrid(coords, coords, coords, indexing="ij"),
                    axis=-1).astype(np.float32)
    if clip_sphere:
        grid = grid.reshape(-1, 3)
        grid = grid[np.linalg.norm(grid, axis=1) <= 0.5]
    return grid, spacing


@jax.jit
def _nearest_center(points: jnp.ndarray, centers: jnp.ndarray) -> jnp.ndarray:
    """argmin_j ||p_i - c_j|| for every point (B, P, 3) -> (B, P) int32."""
    d = (
        jnp.sum(points ** 2, -1, keepdims=True)
        - 2.0 * jnp.matmul(points, centers.T,
                           precision=jax.lax.Precision.HIGHEST)
        + jnp.sum(centers ** 2, -1)[None, None, :]
    )
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


def entropy_of_occupancy_grid(pclouds: np.ndarray, grid_resolution: int,
                              in_sphere: bool = False, verbose: bool = False
                              ) -> Tuple[float, np.ndarray]:
    """Occupancy-grid entropy (reference :241-280).

    The sklearn 1-NN over grid centers is replaced by an exact batched
    argmin on device.
    """
    epsilon = 10e-4
    bound = 0.5 + epsilon
    if abs(np.max(pclouds)) > bound or abs(np.min(pclouds)) > bound:
        if verbose:
            warnings.warn("Point-clouds are not in unit cube.")
    if in_sphere and np.max(np.sqrt(np.sum(pclouds ** 2, axis=2))) > bound:
        if verbose:
            warnings.warn("Point-clouds are not in unit sphere.")

    grid_coordinates, _ = unit_cube_grid_point_cloud(grid_resolution, in_sphere)
    grid_coordinates = grid_coordinates.reshape(-1, 3)
    centers = jnp.asarray(grid_coordinates)

    n_cells = len(grid_coordinates)
    idx = np.asarray(_nearest_center(jnp.asarray(pclouds, jnp.float32), centers))
    grid_counters = np.bincount(idx.ravel(), minlength=n_cells).astype(
        np.float64)
    # per-cell occupancy across clouds (reference counts each cloud once
    # per cell via np.unique; here one vectorised presence matrix)
    occupied = np.zeros((len(pclouds), n_cells), dtype=bool)
    occupied[np.arange(len(pclouds))[:, None], idx] = True
    grid_bernoulli_rvars = occupied.sum(axis=0).astype(np.float64)

    # vectorised Bernoulli entropy (scipy's entropy([p, 1-p]) per cell,
    # with the 0 log 0 = 0 convention)
    n = float(len(pclouds))
    p = grid_bernoulli_rvars / n
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = np.where(p > 0, -p * np.log(p), 0.0) + np.where(
            p < 1, -(1.0 - p) * np.log1p(-p), 0.0)
    acc_entropy = float(np.sum(np.where(grid_bernoulli_rvars > 0, terms, 0.0)))
    return acc_entropy / n_cells, grid_counters


def _jsdiv(P: np.ndarray, Q: np.ndarray) -> float:
    """Second JSD formula used as a runtime cross-check (reference :305-321)."""

    def _kldiv(A, B):
        idx = np.logical_and(A > 0, B > 0)
        a, b = A[idx], B[idx]
        return float(np.sum(a * np.log2(a / b)))

    P_ = P / np.sum(P)
    Q_ = Q / np.sum(Q)
    M = 0.5 * (P_ + Q_)
    return 0.5 * (_kldiv(P_, M) + _kldiv(Q_, M))


def jensen_shannon_divergence(P: np.ndarray, Q: np.ndarray) -> float:
    """Entropy-form JSD with the reference's dual-computation warning
    (reference :283-302)."""
    if np.any(P < 0) or np.any(Q < 0):
        raise ValueError("Negative values.")
    if len(P) != len(Q):
        raise ValueError("Non equal size.")
    P_ = P / np.sum(P)
    Q_ = Q / np.sum(Q)
    e1 = entropy(P_, base=2)
    e2 = entropy(Q_, base=2)
    e_sum = entropy((P_ + Q_) / 2.0, base=2)
    res = e_sum - ((e1 + e2) / 2.0)
    res2 = _jsdiv(P_, Q_)
    if not np.allclose(res, res2, atol=10e-5, rtol=0):
        warnings.warn("Numerical values of two JSD methods don't agree.")
    return float(res)


def jsd_between_point_cloud_sets(sample_pcs: np.ndarray, ref_pcs: np.ndarray,
                                 resolution: int = 28) -> float:
    """JSD between two cloud sets (reference :227-238)."""
    in_unit_sphere = True
    sample_grid_var = entropy_of_occupancy_grid(
        sample_pcs, resolution, in_unit_sphere)[1]
    ref_grid_var = entropy_of_occupancy_grid(
        ref_pcs, resolution, in_unit_sphere)[1]
    return jensen_shannon_divergence(sample_grid_var, ref_grid_var)
