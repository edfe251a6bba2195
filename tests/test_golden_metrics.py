"""Golden metric values on a frozen fixture (SURVEY.md §7 test strategy).

The fixture is deterministic (seeded) and the golden values below were
computed with the float64 numpy oracles (np_cd / np_approxmatch from the
other test modules). Any change to the metric pipeline's *semantics*
breaks these; pure reimplementation keeps them.
"""

import numpy as np

from pdgn_tpu.eval import compute_all_metrics, jsd_between_point_cloud_sets


def _fixture():
    rng = np.random.RandomState(2020)
    # two 8-cloud sets of 64 points, slightly different distributions
    gen = (rng.randn(8, 64, 3) * 0.22).astype(np.float32)
    ref = (rng.randn(8, 64, 3) * 0.25).astype(np.float32)
    return np.clip(gen, -0.49, 0.49), np.clip(ref, -0.49, 0.49)


# float64-oracle goldens for the fixture above (computed once, frozen)
GOLDEN = {
    "lgan_mmd-CD": 0.038478,
    "lgan_mmd_smp-CD": 0.039172,
    "lgan_mmd-EMD": 0.192105,
    "lgan_mmd_smp-EMD": 0.198585,
    "lgan_cov-CD": 0.875,
    "lgan_cov-EMD": 0.625,
    "1-NN-CD-acc": 0.5,
    "1-NN-EMD-acc": 0.625,
    "jsd": 0.932340,
}


def compute_goldens():
    """Recompute the goldens with the float64 oracles (for maintenance)."""
    from tests.test_eval import np_cd
    from tests.test_losses import np_approxmatch

    gen, ref = _fixture()
    gen64, ref64 = gen.astype(np.float64), ref.astype(np.float64)

    def mat(a, b):
        cd = np.zeros((len(a), len(b)))
        emd = np.zeros_like(cd)
        for i in range(len(a)):
            for j in range(len(b)):
                cd[i, j] = np_cd(a[i], b[j])
                c, _, _ = np_approxmatch(a[i], b[j])
                emd[i, j] = c / a.shape[1]
        return cd, emd

    return mat(gen64, ref64)


def test_golden_metrics():
    gen, ref = _fixture()
    res = compute_all_metrics(gen, ref, tile=8)
    res["jsd"] = jsd_between_point_cloud_sets(gen, ref)
    for k, want in GOLDEN.items():
        got = float(res[k])
        assert abs(got - want) <= max(2e-3, 5e-3 * abs(want)), (k, got, want)


def test_goldens_match_float64_oracle():
    """Cross-check the frozen numbers against the oracle matrices."""
    from pdgn_tpu.eval import knn_classifier, lgan_mmd_cov

    cd, emd = compute_goldens()
    res_cd = lgan_mmd_cov(cd.T)
    np.testing.assert_allclose(res_cd["lgan_mmd"], GOLDEN["lgan_mmd-CD"],
                               rtol=1e-3)
    res_emd = lgan_mmd_cov(emd.T)
    np.testing.assert_allclose(res_emd["lgan_mmd"], GOLDEN["lgan_mmd-EMD"],
                               rtol=1e-3)
