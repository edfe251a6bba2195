"""Pallas kernel tests (interpret mode on CPU) against the jnp paths.

The jnp implementations are themselves validated against float64 oracles
(test_losses.py), so agreement here closes the chain
oracle == jnp == pallas.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pdgn_tpu.losses.chamfer import chamfer_cd
from pdgn_tpu.losses.emd import match_cost
from pdgn_tpu.ops.pallas import fused_cd_emd


@pytest.fixture(scope="module")
def clouds():
    rng = np.random.RandomState(0)
    x1 = jnp.asarray(rng.randn(3, 256, 3).astype(np.float32) * 0.4)
    x2 = jnp.asarray(rng.randn(3, 256, 3).astype(np.float32) * 0.4)
    return x1, x2


def test_fused_cd_emd_matches_jnp(clouds):
    x1, x2 = clouds
    cd, cost = fused_cd_emd(x1, x2, interpret=True)
    np.testing.assert_allclose(
        np.asarray(cd), np.asarray(chamfer_cd(x1, x2)), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(cost), np.asarray(match_cost(x1, x2)), rtol=5e-4)


def test_fused_cd_emd_identical_pairs(clouds):
    x1, _ = clouds
    cd, cost = fused_cd_emd(x1, x1, interpret=True)
    np.testing.assert_allclose(np.asarray(cd), 0.0, atol=1e-5)
    assert np.all(np.asarray(cost) / 256.0 < 1e-3)


def test_fused_cd_emd_shape_requirements(clouds):
    x1, _ = clouds
    with pytest.raises(ValueError):
        fused_cd_emd(jnp.zeros((1, 100, 3)), jnp.zeros((1, 100, 3)))
    with pytest.raises(ValueError):
        fused_cd_emd(jnp.zeros((1, 256, 3)), jnp.zeros((1, 512, 3)))


def test_knn_topk_matches_naive():
    from pdgn_tpu.ops.knn import knn_naive
    from pdgn_tpu.ops.pallas.knn import knn_topk

    rng = np.random.RandomState(3)
    # xyz (direct-diff path)
    xyz = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32))
    got = knn_topk(xyz, xyz, 8, interpret=True)
    want = knn_naive(xyz, None, 8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # feature space (matmul path)
    feats = jnp.asarray(rng.randn(2, 128, 32).astype(np.float32))
    got = knn_topk(feats, feats, 5, interpret=True)
    want = knn_naive(feats, None, 5)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
