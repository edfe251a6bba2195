"""Evaluation-suite tests against float64 numpy oracles.

The oracles re-implement the reference evaluation_metrics.py reductions
(pairwise loops, lgan_mmd_cov, the 1-NN classifier with its transposed
off-diagonal block, sklearn-NN occupancy JSD) literally in numpy.
"""

import os
import sys

import numpy as np
import pytest

from pdgn_tpu.eval import (
    compute_all_metrics,
    entropy_of_occupancy_grid,
    jensen_shannon_divergence,
    jsd_between_point_cloud_sets,
    knn_classifier,
    lgan_mmd_cov,
    pairwise_cd_emd,
    unit_cube_grid_point_cloud,
)
from tests.test_losses import np_approxmatch


def np_cd(a, b):
    P = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    return P.min(0).mean() + P.min(1).mean()


@pytest.fixture(scope="module")
def cloud_sets():
    rng = np.random.RandomState(7)
    sample = rng.randn(6, 24, 3).astype(np.float32) * 0.2
    ref = rng.randn(6, 24, 3).astype(np.float32) * 0.2
    return sample, ref


def test_pairwise_matrices_vs_oracle(cloud_sets):
    sample, ref = cloud_sets
    cd, emd = pairwise_cd_emd(sample, ref, tile=4)  # exercises padding
    assert cd.shape == (6, 6) and emd.shape == (6, 6)
    for i in range(6):
        for j in range(6):
            want_cd = np_cd(sample[i].astype(np.float64), ref[j].astype(np.float64))
            np.testing.assert_allclose(cd[i, j], want_cd, rtol=1e-4)
            want_emd, _, _ = np_approxmatch(
                sample[i].astype(np.float64), ref[j].astype(np.float64))
            np.testing.assert_allclose(emd[i, j], want_emd / 24.0, rtol=3e-4)


def test_lgan_mmd_cov():
    d = np.array([[1.0, 2.0, 3.0], [0.5, 5.0, 6.0], [7.0, 0.1, 9.0]])
    res = lgan_mmd_cov(d)
    np.testing.assert_allclose(res["lgan_mmd"], np.mean([0.5, 0.1, 3.0]))
    np.testing.assert_allclose(res["lgan_mmd_smp"], np.mean([1.0, 0.5, 0.1]))
    # argmins per row: 0, 0, 1 -> 2 unique of 3
    np.testing.assert_allclose(res["lgan_cov"], 2 / 3)


def test_knn_classifier_perfect_separation():
    # x-x and y-y distances small, cross distances large -> 1-NN acc 1.0
    n = 4
    Mxx = np.full((n, n), 0.1)
    Myy = np.full((n, n), 0.1)
    Mxy = np.full((n, n), 10.0)
    res = knn_classifier(Mxx, Mxy, Myy, k=1)
    assert res["acc"] == 1.0
    # the reference's +1e-10 denominators keep acc_t/acc_f just below 1
    np.testing.assert_allclose(res["acc_t"], 1.0, rtol=1e-9)
    np.testing.assert_allclose(res["acc_f"], 1.0, rtol=1e-9)


def test_knn_classifier_identical_distributions():
    # all cross/within distances equal up to noise -> acc ~ chance
    rng = np.random.RandomState(0)
    n = 20
    M = rng.rand(2 * n, 2 * n)
    M = (M + M.T) / 2
    res = knn_classifier(M[:n, :n], M[:n, n:], M[n:, n:], k=1)
    assert 0.2 <= res["acc"] <= 0.8


def test_compute_all_metrics_keys(cloud_sets):
    sample, ref = cloud_sets
    res = compute_all_metrics(sample, ref, tile=6)
    want_keys = {
        "lgan_mmd-CD", "lgan_cov-CD", "lgan_mmd_smp-CD",
        "lgan_mmd-EMD", "lgan_cov-EMD", "lgan_mmd_smp-EMD",
        "1-NN-CD-acc", "1-NN-CD-acc_t", "1-NN-CD-acc_f",
        "1-NN-EMD-acc", "1-NN-EMD-acc_t", "1-NN-EMD-acc_f",
    }
    assert want_keys <= set(res.keys())
    # identical sets: self-distance is ~0 (the |x|^2+|y|^2-2xy expansion
    # leaves tiny negatives, same as the reference's distChamfer)
    res_same = compute_all_metrics(ref, ref, tile=6)
    assert abs(res_same["lgan_mmd-CD"]) < 1e-5


def test_compute_all_metrics_cd_only_matches_full(cloud_sets, monkeypatch):
    # with_emd=False (the CPU parity sweep's large-n mode) must drop the
    # EMD family and leave every CD value bit-identical to the full suite.
    # Pin both calls to the exact pair-tile path: on TPU the full suite
    # would pick a fused pallas/xla path whose CD numerics differ from
    # the exact path with_emd=False always takes (see the
    # compute_all_metrics docstring).
    sample, ref = cloud_sets
    monkeypatch.setenv("PDGN_EVAL_IMPL", "exact")
    full = compute_all_metrics(sample, ref, tile=6)
    cd = compute_all_metrics(sample, ref, tile=6, with_emd=False)
    assert not any("EMD" in k for k in cd)
    assert set(cd) == {k for k in full if "EMD" not in k}
    for k, v in cd.items():
        assert v == full[k], (k, v, full[k])


def test_unit_cube_grid_matches_reference_loop():
    grid, spacing = unit_cube_grid_point_cloud(5)
    assert grid.shape == (5, 5, 5, 3)
    np.testing.assert_allclose(spacing, 0.25)
    np.testing.assert_allclose(grid[0, 0, 0], [-0.5, -0.5, -0.5])
    np.testing.assert_allclose(grid[4, 2, 1], [0.5, 0.0, -0.25])
    clipped, _ = unit_cube_grid_point_cloud(5, clip_sphere=True)
    assert clipped.ndim == 2
    assert np.all(np.linalg.norm(clipped, axis=1) <= 0.5)


def test_occupancy_grid_vs_sklearn():
    sklearn = pytest.importorskip("sklearn.neighbors")
    rng = np.random.RandomState(3)
    clouds = (rng.rand(4, 50, 3).astype(np.float32) - 0.5) * 0.5
    res = 8
    got_entropy, got_counters = entropy_of_occupancy_grid(clouds, res, True)

    grid, _ = unit_cube_grid_point_cloud(res, True)
    nn = sklearn.NearestNeighbors(n_neighbors=1).fit(grid.reshape(-1, 3))
    counters = np.zeros(len(grid))
    bern = np.zeros(len(grid))
    for pc in clouds:
        _, ind = nn.kneighbors(pc)
        ind = np.squeeze(ind)
        for i in ind:
            counters[i] += 1
        for i in np.unique(ind):
            bern[i] += 1
    np.testing.assert_array_equal(got_counters, counters)


def test_jsd_cross_check_and_bounds():
    rng = np.random.RandomState(5)
    P = rng.rand(100)
    Q = rng.rand(100)
    j = jensen_shannon_divergence(P, Q)
    assert 0.0 <= j <= 1.0
    assert jensen_shannon_divergence(P, P) < 1e-12
    with pytest.raises(ValueError):
        jensen_shannon_divergence(-P, Q)


def test_jsd_between_sets_identical_is_zero():
    rng = np.random.RandomState(11)
    clouds = (rng.rand(3, 64, 3).astype(np.float32) - 0.5) * 0.4
    assert jsd_between_point_cloud_sets(clouds, clouds) < 1e-12


def test_symmetric_pairwise_matches_full(cloud_sets):
    sample, _ = cloud_sets
    cd_full, emd_full = pairwise_cd_emd(sample, sample, tile=4)
    cd_sym, emd_sym = pairwise_cd_emd(sample, sample, tile=4, symmetric=True)
    # CD is exactly symmetric; on CPU (exact impl) the mirrored matrix
    # matches the full computation in the upper triangle by construction
    np.testing.assert_allclose(np.triu(cd_sym), np.triu(cd_full), atol=1e-6)
    np.testing.assert_allclose(cd_sym, cd_sym.T, atol=1e-6)
    np.testing.assert_allclose(emd_sym, emd_sym.T, atol=1e-6)
    # EMD asymmetry is small
    rel = np.abs(emd_sym - emd_full) / (np.abs(emd_full) + 1e-6)
    np.fill_diagonal(rel, 0)
    assert rel.max() < 0.05, rel.max()


REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REF),
                    reason="reference tree not available")
def test_metric_suite_agrees_with_reference_metric_code(cloud_sets,
                                                        monkeypatch,
                                                        request):
    """Our CD metrics + JSD vs the reference's own CPU metric code on
    IDENTICAL inputs (evaluation/evaluation_metrics.py: distChamfer,
    lgan_mmd_cov, knn, jsd_between_point_cloud_sets) — the in-suite pin
    of the trained-checkpoint parity run's metric-code-agreement half
    (scripts/torch_parity_run.py; PERF.md).

    All sys.path / sys.modules state (the CUDA-extension stubs AND every
    module the reference import pulls in) is torn down afterwards so
    nothing leaks into later tests in the session."""
    torch = pytest.importorskip("torch")
    import types

    modules_before = set(sys.modules)
    monkeypatch.syspath_prepend(REF)
    for name in ("pointops_cuda", "structural_loss_cuda", "emd_cuda",
                 "evaluation.StructuralLosses",
                 "evaluation.StructuralLosses.match_cost",
                 "evaluation.StructuralLosses.nn_distance"):
        m = types.ModuleType(name)
        m.match_cost = lambda *a: None
        m.nn_distance = lambda *a: None
        if name not in sys.modules:
            monkeypatch.setitem(sys.modules, name, m)
    # the import below registers the real `evaluation*` package modules;
    # drop whatever it added once the test ends (monkeypatch only
    # restores the keys it set itself)
    def _drop_new_modules():
        for name in set(sys.modules) - modules_before:
            if name == "evaluation" or name.startswith("evaluation."):
                sys.modules.pop(name, None)

    request.addfinalizer(_drop_new_modules)

    from evaluation.evaluation_metrics import (
        distChamfer, jsd_between_point_cloud_sets as ref_jsd,
        knn as ref_knn, lgan_mmd_cov as ref_mmd_cov)

    sample, ref = cloud_sets
    ours = compute_all_metrics(sample, ref, tile=6, with_emd=False)
    ours_jsd = jsd_between_point_cloud_sets(sample, ref)

    ts, tr = torch.from_numpy(sample), torch.from_numpy(ref)

    def cd_matrix(a, b):
        rows = []
        for i in range(a.shape[0]):
            dl, dr = distChamfer(
                a[i:i + 1].expand(b.shape[0], -1, -1), b)
            rows.append((dl.mean(dim=1) + dr.mean(dim=1)).unsqueeze(0))
        return torch.cat(rows, dim=0)

    M_sr = cd_matrix(ts, tr)
    theirs = {f"{k}-CD": v for k, v in ref_mmd_cov(M_sr.t()).items()}
    # reference quirk: knn receives the (N_s, N_r) matrix where (N_r,
    # N_s) is expected (evaluation_metrics.py:191) — ours preserves it
    one_nn = ref_knn(cd_matrix(tr, tr), M_sr, cd_matrix(ts, ts), 1,
                     sqrt=False)

    for k in ("lgan_mmd-CD", "lgan_cov-CD", "lgan_mmd_smp-CD"):
        np.testing.assert_allclose(ours[k], float(theirs[k]), rtol=1e-5,
                                   err_msg=k)
    np.testing.assert_allclose(ours["1-NN-CD-acc"], float(one_nn["acc"]),
                               rtol=1e-6)
    np.testing.assert_allclose(ours_jsd, float(ref_jsd(sample, ref)),
                               rtol=1e-5)
