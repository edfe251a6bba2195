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
    # the kernel's sqrt -> re-square round-trip through the distance
    # cache perturbs d2 by ~1 ulp; cost matches the exact path closely
    np.testing.assert_allclose(
        np.asarray(cost), np.asarray(match_cost(x1, x2)), rtol=2e-3)


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


def test_knn_gather_matches_separate_ops():
    from pdgn_tpu.ops.edges import _neighbor_idx
    from pdgn_tpu.ops.grouping import grouping
    from pdgn_tpu.ops.pallas.knn import knn_gather

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 128, 16).astype(np.float32))
    idx, nbr = knn_gather(x, 4, True)
    idx_ref = _neighbor_idx(x, 4)
    nbr_ref = grouping(x, idx_ref)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    # bf16 hi/lo split reconstructs fp32 to ~2^-16 relative
    np.testing.assert_allclose(np.asarray(nbr), np.asarray(nbr_ref),
                               rtol=1e-4, atol=1e-4)


def test_knn_gather_gradient_matches_take_path():
    import jax as _jax

    from pdgn_tpu.ops.edges import _neighbor_idx
    from pdgn_tpu.ops.grouping import grouping
    from pdgn_tpu.ops.pallas.knn import knn_gather

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(1, 128, 8).astype(np.float32))
    g1 = _jax.grad(lambda a: jnp.sum(knn_gather(a, 3, True)[1] ** 2))(x)
    g2 = _jax.grad(
        lambda a: jnp.sum(grouping(a, _neighbor_idx(a, 3)) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-3)
