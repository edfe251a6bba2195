"""Loss tests against float64 numpy oracles.

The EMD oracle is a literal transcription of the reference CUDA algorithm
(evaluation/pytorch_structural_losses/src/approxmatch.cu) in float64 with
an explicit match matrix; the JAX implementation must reproduce its cost
and gradients without ever materialising the match matrix.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdgn_tpu import losses


def np_pairwise(x, y):
    return ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)


# ---------------------------------------------------------------- chamfer
def test_chamfer_loss_sum_reduction(rng):
    preds = rng.randn(3, 20, 3).astype(np.float32)
    gts = rng.randn(3, 15, 3).astype(np.float32)
    got = float(losses.chamfer_loss(jnp.asarray(preds), jnp.asarray(gts)))
    want = 0.0
    for b in range(3):
        P = np_pairwise(gts[b].astype(np.float64), preds[b].astype(np.float64))
        want += P.min(0).sum() + P.min(1).sum()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_dist_chamfer_directions(rng):
    a = rng.randn(2, 10, 3).astype(np.float32)
    b = rng.randn(2, 14, 3).astype(np.float32)
    dl, dr = losses.dist_chamfer(jnp.asarray(a), jnp.asarray(b))
    assert dl.shape == (2, 14) and dr.shape == (2, 10)
    P = np_pairwise(a[0].astype(np.float64), b[0].astype(np.float64))
    np.testing.assert_allclose(np.asarray(dl)[0], P.min(0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dr)[0], P.min(1), atol=1e-5)


def test_chamfer_cd_pair_reduction(rng):
    a = rng.randn(2, 12, 3).astype(np.float32)
    b = rng.randn(2, 12, 3).astype(np.float32)
    got = np.asarray(losses.chamfer_cd(jnp.asarray(a), jnp.asarray(b)))
    P = np_pairwise(a[1].astype(np.float64), b[1].astype(np.float64))
    want = P.min(0).mean() + P.min(1).mean()
    np.testing.assert_allclose(got[1], want, rtol=1e-5)


# -------------------------------------------------------------------- EMD
def np_approxmatch(x1, x2):
    """Float64 oracle of the CUDA approxmatch algorithm (with match matrix)."""
    n, m = len(x1), len(x2)
    multiL = 1.0 if n >= m else float(m // n)
    multiR = float(n // m) if n >= m else 1.0
    remainL = np.full(n, multiL)
    remainR = np.full(m, multiR)
    match = np.zeros((n, m))
    D = np_pairwise(x1, x2)
    for j in range(7, -2, -1):
        level = -(4.0 ** j)
        K = np.exp(level * D)
        ratioL = remainL / (K @ remainR + 1e-9)
        sumr = (K.T @ ratioL) * remainR
        consumption = np.minimum(remainR / (sumr + 1e-9), 1.0)
        ratioR = consumption * remainR
        remainR = np.maximum(0.0, remainR - sumr)
        w = K * ratioL[:, None] * ratioR[None, :]
        match += w
        remainL = np.maximum(0.0, remainL - w.sum(1))
    dist = np.sqrt(D)
    cost = (match * dist).sum()
    inv = 1.0 / np.sqrt(np.maximum(D, 1e-20))
    g1 = ((match * inv)[:, :, None] * (x1[:, None, :] - x2[None, :, :])).sum(1)
    g2 = ((match * inv)[:, :, None] * (x2[None, :, :] - x1[:, None, :])).sum(0)
    return cost, g1, g2


def test_match_cost_vs_oracle(rng):
    x1 = rng.randn(3, 32, 3).astype(np.float32)
    x2 = rng.randn(3, 32, 3).astype(np.float32)
    got = np.asarray(losses.match_cost(jnp.asarray(x1), jnp.asarray(x2)))
    for b in range(3):
        want, _, _ = np_approxmatch(x1[b].astype(np.float64), x2[b].astype(np.float64))
        np.testing.assert_allclose(got[b], want, rtol=2e-4)


def test_match_cost_unequal_sizes(rng):
    # n < m with integer-division multipliers (multiL = 3 here)
    x1 = rng.randn(2, 16, 3).astype(np.float32)
    x2 = rng.randn(2, 48, 3).astype(np.float32)
    got = np.asarray(losses.match_cost(jnp.asarray(x1), jnp.asarray(x2)))
    for b in range(2):
        want, _, _ = np_approxmatch(x1[b].astype(np.float64), x2[b].astype(np.float64))
        np.testing.assert_allclose(got[b], want, rtol=2e-4)


def test_match_cost_gradients_vs_oracle(rng):
    x1 = rng.randn(2, 24, 3).astype(np.float32)
    x2 = rng.randn(2, 24, 3).astype(np.float32)

    g1, g2 = jax.grad(
        lambda a, b: jnp.sum(losses.match_cost(a, b)), argnums=(0, 1)
    )(jnp.asarray(x1), jnp.asarray(x2))
    for b in range(2):
        _, w1, w2 = np_approxmatch(x1[b].astype(np.float64), x2[b].astype(np.float64))
        np.testing.assert_allclose(np.asarray(g1)[b], w1, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g2)[b], w2, rtol=1e-3, atol=1e-4)


def test_emd_identical_clouds_is_small(rng):
    x = rng.randn(2, 64, 3).astype(np.float32)
    emd = np.asarray(losses.emd_approx(jnp.asarray(x), jnp.asarray(x)))
    assert np.all(emd < 1e-3), emd


def test_emd_requires_equal_sizes(rng):
    with pytest.raises(ValueError):
        losses.emd_approx(jnp.zeros((1, 8, 3)), jnp.zeros((1, 9, 3)))


# ------------------------------------------------------- shape preserving
def test_compute_mean_covariance(rng):
    g = rng.randn(2, 5, 7, 3).astype(np.float32)
    mu, cov = losses.compute_mean_covariance(jnp.asarray(g))
    want_mu = g.mean(2)
    d = g - want_mu[:, :, None, :]
    want_cov = np.einsum("bmki,bmkj->bmij", d, d) / 7.0
    np.testing.assert_allclose(np.asarray(mu), want_mu, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cov), want_cov, atol=1e-5)


def test_get_local_pair_zero_for_identical(rng):
    pt = rng.randn(2, 32, 3).astype(np.float32)
    like_mu, like_cov = losses.get_local_pair(jnp.asarray(pt), jnp.asarray(pt), nsample=8)
    assert float(like_mu) < 1e-8
    assert float(like_cov) < 1e-8


def test_fast_exp_neg_accuracy():
    """The kept-for-Pallas fast-exp candidate (losses/emd.py) stays within
    its documented ~5e-5 relative error of exp(x) for x <= 0."""
    from pdgn_tpu.losses.emd import _fast_exp_neg

    x = jnp.asarray(-np.logspace(-6, 1.94, 4096, dtype=np.float32))
    x = jnp.concatenate([x, jnp.asarray([0.0, -1e-30, -87.0])])
    got = np.asarray(_fast_exp_neg(x))
    want = np.exp(np.asarray(x, np.float64))
    np.testing.assert_allclose(got, want, rtol=8e-5)
