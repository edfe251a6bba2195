"""Unit tests for the point-op library against numpy float64 oracles.

The oracles re-implement the reference CUDA kernel semantics directly
(knnquery_cuda_kernel.cu, ballquery_cuda_kernel.cu, sampling_cuda_kernel.cu,
interpolation_cuda_kernel.cu, featuredistribute_cuda_kernel.cu,
labelstat_cuda_kernel.cu) in scalar numpy, so every op is checked against
the behaviour the reference framework ships.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdgn_tpu import ops


def np_pairwise_sqdist(x, y):
    return ((x[:, :, None, :] - y[:, None, :, :]) ** 2).sum(-1)


# ---------------------------------------------------------------- pairwise
def test_pairwise_sqdist(rng):
    x = rng.randn(2, 17, 3).astype(np.float32)
    y = rng.randn(2, 9, 3).astype(np.float32)
    got = np.asarray(ops.pairwise_sqdist(jnp.asarray(x), jnp.asarray(y)))
    want = np_pairwise_sqdist(x.astype(np.float64), y.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_self_pairwise_sqdist(rng):
    x = rng.randn(3, 33, 8).astype(np.float32)
    got = np.asarray(ops.self_pairwise_sqdist(jnp.asarray(x)))
    want = np_pairwise_sqdist(
        x.astype(np.float64), x.astype(np.float64)
    )
    np.testing.assert_allclose(got, want, atol=1e-3)


# --------------------------------------------------------------------- knn
def np_knnquery(xyz, new_xyz, k):
    """Oracle for the reference CUDA insertion-sort kNN (include self)."""
    b, m, _ = new_xyz.shape
    idx = np.zeros((b, m, k), np.int32)
    for bi in range(b):
        d = np_pairwise_sqdist(new_xyz[bi : bi + 1], xyz[bi : bi + 1])[0]
        for mi in range(m):
            order = np.argsort(d[mi], kind="stable")
            idx[bi, mi] = order[:k]
    return idx


def test_knn_matches_reference_semantics(rng):
    xyz = rng.randn(2, 64, 3).astype(np.float32)
    ctr = rng.randn(2, 16, 3).astype(np.float32)
    got = np.asarray(ops.knn(jnp.asarray(xyz), jnp.asarray(ctr), 5))
    want = np_knnquery(xyz, ctr, 5)
    np.testing.assert_array_equal(got, want)


def test_knn_includes_self(rng):
    xyz = rng.randn(1, 32, 3).astype(np.float32)
    idx = np.asarray(ops.knn(jnp.asarray(xyz), None, 4))
    np.testing.assert_array_equal(idx[0, :, 0], np.arange(32))


def test_knn_vs_naive_oracle(rng):
    xyz = rng.randn(2, 40, 3).astype(np.float32)
    got = np.asarray(ops.knn(jnp.asarray(xyz), None, 6))
    want = np.asarray(ops.knn_naive(jnp.asarray(xyz), None, 6))
    np.testing.assert_array_equal(got, want)


def test_knn_exclude_first_drops_self(rng):
    x = rng.randn(2, 20, 4).astype(np.float32)
    d = ops.self_pairwise_sqdist(jnp.asarray(x))
    idx = np.asarray(ops.knn_exclude_first(d, 3))
    # the dropped column is the row minimum == the point itself here
    assert not np.any(idx == np.arange(20)[None, :, None])


# ---------------------------------------------------------------- grouping
def test_grouping_gather(rng):
    feats = rng.randn(2, 10, 5).astype(np.float32)
    idx = rng.randint(0, 10, size=(2, 7, 3)).astype(np.int32)
    got = np.asarray(ops.grouping(jnp.asarray(feats), jnp.asarray(idx)))
    want = np.stack(
        [feats[b][idx[b].reshape(-1)].reshape(7, 3, 5) for b in range(2)]
    )
    np.testing.assert_array_equal(got, want)


def test_grouping_backward_is_scatter_add(rng):
    feats = jnp.asarray(rng.randn(1, 6, 2).astype(np.float32))
    idx = jnp.asarray(np.array([[[0, 0, 1], [2, 2, 2]]], np.int32))

    def f(x):
        return jnp.sum(ops.grouping(x, idx))

    g = np.asarray(jax.grad(f)(feats))[0]
    # index 0 gathered twice, 1 once, 2 three times, rest zero
    np.testing.assert_array_equal(g[:, 0], [2, 1, 3, 0, 0, 0])


def test_grouping_int(rng):
    labels = rng.randint(0, 9, size=(2, 11)).astype(np.int64)
    idx = rng.randint(0, 11, size=(2, 4, 3)).astype(np.int32)
    got = np.asarray(ops.grouping_int(jnp.asarray(labels), jnp.asarray(idx)))
    want = np.stack([labels[b][idx[b]] for b in range(2)])
    np.testing.assert_array_equal(got, want)


# --------------------------------------------------------------- ballquery
def np_ballquery(radius, nsample, xyz, new_xyz):
    b, m, _ = new_xyz.shape
    n = xyz.shape[1]
    out = np.zeros((b, m, nsample), np.int32)
    r2 = radius * radius
    for bi in range(b):
        for mi in range(m):
            cnt = 0
            for k in range(n):
                if cnt >= nsample:
                    break
                d2 = ((new_xyz[bi, mi] - xyz[bi, k]) ** 2).sum()
                if d2 < r2:
                    if cnt == 0:
                        out[bi, mi, :] = k
                    out[bi, mi, cnt] = k
                    cnt += 1
    return out


def test_ballquery_matches_cuda_semantics(rng):
    xyz = rng.rand(2, 50, 3).astype(np.float32)
    ctr = rng.rand(2, 12, 3).astype(np.float32)
    got = np.asarray(ops.ballquery(0.3, 8, jnp.asarray(xyz), jnp.asarray(ctr)))
    want = np_ballquery(0.3, 8, xyz, ctr)
    np.testing.assert_array_equal(got, want)


def test_ballquery_no_hits_is_zero(rng):
    xyz = np.ones((1, 5, 3), np.float32) * 10
    ctr = np.zeros((1, 2, 3), np.float32)
    got = np.asarray(ops.ballquery(0.1, 4, jnp.asarray(xyz), jnp.asarray(ctr)))
    np.testing.assert_array_equal(got, 0)


# ------------------------------------------------------------------- edges
def test_edge_features_shape_and_semantics(rng):
    x = rng.randn(2, 16, 8).astype(np.float32)
    out = np.asarray(ops.edge_features(jnp.asarray(x), 4))
    assert out.shape == (2, 16, 4, 16)
    # first half of the channel dim is the central point replicated
    np.testing.assert_allclose(
        out[..., :8], np.broadcast_to(x[:, :, None, :], (2, 16, 4, 8))
    )
    # neighbour diffs: check one entry manually against sorted distances
    d = np_pairwise_sqdist(x.astype(np.float64), x.astype(np.float64))
    nb0 = np.argsort(d[0, 0], kind="stable")[1:5]
    np.testing.assert_allclose(
        out[0, 0, :, 8:], x[0][nb0] - x[0, 0], atol=1e-5
    )


def test_edge_features_xyz(rng):
    x = rng.randn(1, 12, 6).astype(np.float32)
    pc = rng.randn(1, 12, 3).astype(np.float32)
    e_fea, e_xyz = ops.edge_features_xyz(jnp.asarray(x), jnp.asarray(pc), 3)
    assert e_fea.shape == (1, 12, 3, 12)
    assert e_xyz.shape == (1, 12, 3, 6)
    # xyz neighbours use the FEATURE-space graph
    d = np_pairwise_sqdist(x.astype(np.float64), x.astype(np.float64))
    nb0 = np.argsort(d[0, 0], kind="stable")[1:4]
    np.testing.assert_allclose(
        np.asarray(e_xyz)[0, 0, :, 3:], pc[0][nb0] - pc[0, 0], atol=1e-6
    )


# ---------------------------------------------------------------- sampling
def np_fps(xyz, m):
    b, n, _ = xyz.shape
    idx = np.zeros((b, m), np.int32)
    for bi in range(b):
        mind2 = np.full(n, 1e10)
        last = 0
        for i in range(1, m):
            d2 = ((xyz[bi] - xyz[bi, last]) ** 2).sum(-1)
            mind2 = np.minimum(mind2, d2)
            last = int(np.argmax(mind2))
            idx[bi, i] = last
    return idx


def test_furthest_point_sample(rng):
    xyz = rng.randn(2, 30, 3).astype(np.float32)
    got = np.asarray(ops.furthest_point_sample(jnp.asarray(xyz), 8))
    want = np_fps(xyz.astype(np.float64), 8)
    np.testing.assert_array_equal(got, want)


def test_gather_points(rng):
    feats = rng.randn(2, 10, 4).astype(np.float32)
    idx = rng.randint(0, 10, size=(2, 5)).astype(np.int32)
    got = np.asarray(ops.gather_points(jnp.asarray(feats), jnp.asarray(idx)))
    want = np.stack([feats[b][idx[b]] for b in range(2)])
    np.testing.assert_array_equal(got, want)


# ----------------------------------------------------------- interpolation
def test_three_nn_and_interpolate(rng):
    unknown = rng.randn(2, 20, 3).astype(np.float32)
    known = rng.randn(2, 7, 3).astype(np.float32)
    dist, idx = ops.three_nn(jnp.asarray(unknown), jnp.asarray(known))
    d = np_pairwise_sqdist(unknown.astype(np.float64), known.astype(np.float64))
    want_idx = np.argsort(d, axis=-1, kind="stable")[..., :3]
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    want_d = np.sqrt(np.take_along_axis(d, want_idx, axis=-1))
    np.testing.assert_allclose(np.asarray(dist), want_d, atol=1e-3)

    feats = rng.randn(2, 7, 6).astype(np.float32)
    w = ops.three_interpolate_weights(dist)
    out = ops.interpolate(jnp.asarray(feats), idx, w)
    assert out.shape == (2, 20, 6)
    wn = np.asarray(w)
    want = (feats[np.arange(2)[:, None, None], want_idx] * wn[..., None]).sum(2)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


# --------------------------------------------------------- featuredistribute
def test_feature_distribute_gather(rng):
    max_xyz = rng.randn(2, 9, 3).astype(np.float32)
    xyz = rng.randn(2, 14, 3).astype(np.float32)
    idx = np.asarray(ops.feature_distribute(jnp.asarray(max_xyz), jnp.asarray(xyz)))
    d = np_pairwise_sqdist(xyz.astype(np.float64), max_xyz.astype(np.float64))
    np.testing.assert_array_equal(idx, np.argmin(d, axis=-1))

    feats = rng.randn(2, 9, 4).astype(np.float32)
    out = np.asarray(ops.feature_gather(jnp.asarray(feats), jnp.asarray(idx)))
    want = np.stack([feats[b][idx[b]] for b in range(2)])
    np.testing.assert_array_equal(out, want)


# ----------------------------------------------------------------- labelstat
def test_labelstat_ballrange(rng):
    xyz = rng.rand(1, 25, 3).astype(np.float32)
    ctr = rng.rand(1, 6, 3).astype(np.float32)
    stat = rng.randint(0, 3, size=(1, 25, 4)).astype(np.int32)
    got = np.asarray(ops.labelstat_ballrange(0.4, jnp.asarray(xyz), jnp.asarray(ctr), jnp.asarray(stat)))
    d = np_pairwise_sqdist(ctr.astype(np.float64), xyz.astype(np.float64))[0]
    want = np.stack([stat[0][d[i] < 0.16].sum(0) for i in range(6)])[None]
    np.testing.assert_array_equal(got, want)


def test_labelstat_idx(rng):
    stat = rng.randint(0, 3, size=(2, 12, 5)).astype(np.int32)
    idx = rng.randint(0, 12, size=(2, 4, 6)).astype(np.int32)
    got = np.asarray(ops.labelstat_idx(jnp.asarray(stat), jnp.asarray(idx)))
    want = np.stack([stat[b][idx[b]].sum(1) for b in range(2)])
    np.testing.assert_array_equal(got, want)


def test_labelstat_and_ballquery_caps_at_nsample(rng):
    xyz = rng.rand(1, 30, 3).astype(np.float32)
    ctr = xyz[:, :3].copy()
    stat = np.ones((1, 30, 2), np.int32)
    idx, stats = ops.labelstat_and_ballquery(
        0.5, 4, jnp.asarray(xyz), jnp.asarray(ctr), jnp.asarray(stat)
    )
    idx_want = np_ballquery(0.5, 4, xyz, ctr)
    np.testing.assert_array_equal(np.asarray(idx), idx_want)
    # stats count only the first nsample hits
    d = np_pairwise_sqdist(ctr.astype(np.float64), xyz.astype(np.float64))[0]
    for i in range(3):
        hits = min(int((d[i] < 0.25).sum()), 4)
        np.testing.assert_array_equal(np.asarray(stats)[0, i], [hits, hits])


# ------------------------------------------------------------ query_and_group
def test_query_and_group_centres_xyz(rng):
    xyz = rng.randn(2, 18, 3).astype(np.float32)
    out = np.asarray(ops.query_and_group(jnp.asarray(xyz), nsample=5))
    assert out.shape == (2, 18, 5, 3)
    # self is included and centred -> first neighbour diff is ~0
    np.testing.assert_allclose(out[:, :, 0, :], 0.0, atol=1e-5)


def test_group_xyz_no_centering(rng):
    xyz = rng.randn(2, 18, 3).astype(np.float32)
    out = np.asarray(ops.group_xyz(jnp.asarray(xyz), nsample=5))
    np.testing.assert_allclose(out[:, :, 0, :], xyz, atol=1e-6)


def test_group_all(rng):
    xyz = rng.randn(2, 8, 3).astype(np.float32)
    feats = rng.randn(2, 8, 4).astype(np.float32)
    out = np.asarray(ops.group_all(jnp.asarray(xyz), jnp.asarray(feats)))
    assert out.shape == (2, 1, 8, 7)


# ---------------------------------------------- grouping variants (P5 tail)
def test_le_query_and_group_same_size(rng):
    xyz = rng.randn(2, 18, 3).astype(np.float32)
    feats = rng.randn(2, 18, 4).astype(np.float32)
    gx, gf = ops.le_query_and_group_same_size(
        jnp.asarray(xyz), features=jnp.asarray(feats), nsample=5)
    gx2, gf2 = ops.le_query_and_group(
        jnp.asarray(xyz), features=jnp.asarray(feats), nsample=5)
    np.testing.assert_array_equal(np.asarray(gx), np.asarray(gx2))
    np.testing.assert_array_equal(np.asarray(gf), np.asarray(gf2))
    with pytest.raises(ValueError):
        ops.le_query_and_group_same_size(
            jnp.asarray(xyz), jnp.asarray(xyz[:, :9]),
            features=jnp.asarray(feats), nsample=5)


def test_le_query_and_group_only_feature(rng):
    xyz = rng.randn(2, 18, 3).astype(np.float32)
    feats = rng.randn(2, 18, 4).astype(np.float32)
    got = ops.le_query_and_group_only_feature(
        jnp.asarray(xyz), features=jnp.asarray(feats), nsample=5)
    # equals the feature half of le_query_and_group (same kNN graph)
    _, gf = ops.le_query_and_group(
        jnp.asarray(xyz), features=jnp.asarray(feats), nsample=5)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(gf))


def test_query_and_group_dilate(rng):
    xyz = rng.randn(2, 18, 3).astype(np.float32)
    feats = rng.randn(2, 18, 4).astype(np.float32)
    key = jax.random.PRNGKey(7)
    out = ops.query_and_group_dilate(
        jnp.asarray(xyz), features=jnp.asarray(feats), key=key, nsample=4)
    assert out.shape == (2, 18, 4, 7)
    # replicate: 2*nsample kNN, the key's slot subset, centred gather
    idx8 = ops.knn(jnp.asarray(xyz), None, 8)
    slots = jax.random.permutation(key, 8)[:4]
    idx = idx8[:, :, slots]
    want_xyz = np.asarray(ops.grouping(jnp.asarray(xyz), idx)) \
        - xyz[:, :, None, :]
    want_f = np.asarray(ops.grouping(jnp.asarray(feats), idx))
    np.testing.assert_allclose(np.asarray(out[..., :3]), want_xyz, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out[..., 3:]), want_f)
    # no key and wide idx -> error
    with pytest.raises(ValueError):
        ops.query_and_group_dilate(
            jnp.asarray(xyz), features=jnp.asarray(feats), nsample=4)


def test_exact_knn_flag_semantics(monkeypatch):
    """PDGN_EXACT_KNN: unset/""/"0" -> fast graphs, anything else exact.

    The trainer's test phase relies on "0" meaning OFF to give callers an
    opt-out from its exact-by-default quality path (trainer.test).
    """
    from pdgn_tpu.ops.edges import exact_knn_enabled

    monkeypatch.delenv("PDGN_EXACT_KNN", raising=False)
    assert not exact_knn_enabled()
    monkeypatch.setenv("PDGN_EXACT_KNN", "")
    assert not exact_knn_enabled()
    monkeypatch.setenv("PDGN_EXACT_KNN", "0")
    assert not exact_knn_enabled()
    monkeypatch.setenv("PDGN_EXACT_KNN", "1")
    assert exact_knn_enabled()


def test_exact_knn_scope_overrides_env(monkeypatch):
    """exact_knn_scope (the explicit-config path) beats the env var in
    both directions, nests, treats None as a no-op, and restores the
    previous regime on exit — including on exception."""
    from pdgn_tpu.ops.edges import exact_knn_enabled, exact_knn_scope

    monkeypatch.setenv("PDGN_EXACT_KNN", "1")
    with exact_knn_scope(False):
        assert not exact_knn_enabled()
        with exact_knn_scope(None):          # None = inherit
            assert not exact_knn_enabled()
        with exact_knn_scope(True):          # nesting
            assert exact_knn_enabled()
        assert not exact_knn_enabled()
    assert exact_knn_enabled()               # env visible again

    monkeypatch.delenv("PDGN_EXACT_KNN", raising=False)
    try:
        with exact_knn_scope(True):
            assert exact_knn_enabled()
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert not exact_knn_enabled()           # restored despite the raise
