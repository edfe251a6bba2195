"""Pallas kernel tests (interpret mode on CPU) against the jnp paths.

The jnp implementations are themselves validated against float64 oracles
(test_losses.py), so agreement here closes the chain
oracle == jnp == pallas.
"""

import functools

import jax
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


def test_fused_cd_emd_bf16_cache(clouds):
    """PDGN_EMD_BF16_CACHE path: CD is untouched (computed before the
    cache exists); EMD cost stays within the documented ~0.5% envelope
    of the exact path."""
    x1, x2 = clouds
    cd, cost = fused_cd_emd(x1, x2, interpret=True, bf16_cache=True)
    np.testing.assert_allclose(
        np.asarray(cd), np.asarray(chamfer_cd(x1, x2)), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(cost), np.asarray(match_cost(x1, x2)), rtol=6e-3)


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


# --------------------------------------------------- fused edge-conv kernels
def _head_inputs(rng, B=2, N=128, C=16, k=6, two_f=12, gated=True):
    window = k // 2 + 1
    four_fin = 4 * C
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32) * 0.5)
    conv_kernel = jnp.asarray(
        rng.randn(1, window, 2 * C, four_fin).astype(np.float32) * 0.1)
    conv_bias = jnp.asarray(rng.randn(four_fin).astype(np.float32) * 0.1)
    merge_kernel = jnp.asarray(
        rng.randn(2 * k * 2 * C, two_f).astype(np.float32) * 0.05)
    if not gated:
        return x, conv_kernel, conv_bias, merge_kernel
    pcat = jnp.asarray(rng.randn(B, N, 32).astype(np.float32) * 0.5)
    ppoint = jnp.asarray(rng.randn(B, N, 32).astype(np.float32) * 0.5)
    return x, conv_kernel, conv_bias, merge_kernel, pcat, ppoint


def _bf16_knn_oracle(x, k):
    """Ascending bf16-rounded distance, lowest index first, self dropped."""
    xf = np.asarray(x, np.float64)
    d = ((xf[:, :, None, :] - xf[:, None, :, :]) ** 2).sum(-1)
    # the kernel computes qsq + dbsq - 2*q@db in fp32 then rounds to bf16
    xs = (np.asarray(x) ** 2).sum(-1)
    d32 = (xs[:, :, None] + xs[:, None, :]
           - 2.0 * np.einsum("bnc,bmc->bnm", np.asarray(x), np.asarray(x)))
    d32 = np.maximum(d32.astype(np.float32), 0.0)
    dbf = jnp.asarray(d32).astype(jnp.bfloat16).astype(jnp.float32)
    dbf = np.asarray(dbf)
    B, N, _ = dbf.shape
    lane = np.arange(N)
    out = np.zeros((B, N, k), np.int32)
    for b in range(B):
        for n in range(N):
            order = np.lexsort((lane, dbf[b, n]))
            out[b, n] = order[1:k + 1]
    return out


def test_edge_head_matches_reference_given_idx():
    from pdgn_tpu.ops.pallas.edge_head import edge_conv_head

    rng = np.random.RandomState(7)
    x, ck, cb, mk, pcat, pp = _head_inputs(rng)
    idx, inte, partial, (im, iv), wfea, wxyz, fs, xs = edge_conv_head(
        x, ck, cb, mk, 6, pcat, pp, interpret=True)

    # kNN: packed bf16-distance keys, lowest-index tie-break
    want_idx = _bf16_knn_oracle(x, 6)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)

    # everything else: exact vs the jnp formulation on the same graph
    from pdgn_tpu.ops.pallas.edge_head import _head_reference_given_idx
    C = x.shape[-1]
    window = ck.shape[1]
    four_fin = ck.shape[-1]
    wc, wn = ck[0, :, :C, :], ck[0, :, C:, :]
    conv_a = jnp.sum(wc - wn, axis=0)
    kr = mk.reshape(2 * 6, 2 * C, mk.shape[-1])
    a_merge = jnp.sum(kr[:6, :C, :] - kr[:6, C:, :], axis=0)
    wen = kr[:6, C:, :].reshape(6 * C, mk.shape[-1])
    pb = jnp.broadcast_to(cb[None, :], (x.shape[0], four_fin))
    pbm = jnp.zeros((x.shape[0], mk.shape[-1]), jnp.float32)
    ref = _head_reference_given_idx(
        x, wn.reshape(window * C, four_fin), conv_a, pb, a_merge, wen,
        pbm, pcat, pp, idx, 6, window)
    np.testing.assert_allclose(np.asarray(inte), np.asarray(ref[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(partial), np.asarray(ref[1]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(wfea), np.asarray(ref[3]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(wxyz), np.asarray(ref[4]),
                               rtol=1e-4, atol=1e-4)
    # stats recombine into mean/var
    count = x.shape[0] * x.shape[1] * 3
    np.testing.assert_allclose(np.asarray(im),
                               np.asarray(ref[2][0]) / count, rtol=1e-4,
                               atol=1e-6)


def test_edge_head_split_input_matches_concat():
    """``xs``-split inputs must reproduce the full-concat math exactly:
    the per-batch broadcast half cancels in the kNN distances and folds
    into per-batch bias terms everywhere else."""
    from pdgn_tpu.ops.pallas.edge_head import (_head_reference_given_idx,
                                               edge_conv_head)

    rng = np.random.RandomState(21)
    B, N, k, cx = 2, 128, 6, 8
    x, ck, cb, mk, pcat, pp = _head_inputs(rng, B=B, N=N, C=16, k=k)
    C = x.shape[-1]
    window = ck.shape[1]
    four_fin = ck.shape[-1]
    xs = x[:, 0, :cx]                       # per-batch half
    ec = x[:, :, cx:]                       # per-point half
    x_full = jnp.concatenate(
        [jnp.broadcast_to(xs[:, None, :], (B, N, cx)), ec], axis=-1)

    (idx_s, inte_s, partial_s, (im_s, iv_s),
     wfea_s, wxyz_s, fs_s, xsst_s) = edge_conv_head(
        ec, ck, cb, mk, k, pcat, pp, xs=xs, interpret=True)

    # same graph as an ec-only oracle (xs cancels in every distance)
    np.testing.assert_array_equal(np.asarray(idx_s),
                                  _bf16_knn_oracle(ec, k))

    # full-concat math on the split path's graph
    wc, wn = ck[0, :, :C, :], ck[0, :, C:, :]
    conv_a = jnp.sum(wc - wn, axis=0)
    kr = mk.reshape(2 * k, 2 * C, mk.shape[-1])
    a_merge = jnp.sum(kr[:k, :C, :] - kr[:k, C:, :], axis=0)
    wen = kr[:k, C:, :].reshape(k * C, mk.shape[-1])
    pb = jnp.broadcast_to(cb[None, :], (B, four_fin))
    pbm = jnp.zeros((B, mk.shape[-1]), jnp.float32)
    ref = _head_reference_given_idx(
        x_full, wn.reshape(window * C, four_fin), conv_a, pb, a_merge,
        wen, pbm, pcat, pp, idx_s, k, window)
    np.testing.assert_allclose(np.asarray(inte_s), np.asarray(ref[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(partial_s), np.asarray(ref[1]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(wfea_s), np.asarray(ref[3]),
                               rtol=1e-4, atol=1e-4)
    count = B * N * (k // 2)
    np.testing.assert_allclose(np.asarray(im_s),
                               np.asarray(ref[2][0]) / count,
                               rtol=1e-4, atol=1e-6)

    # gradients: the split custom VJP vs differentiating the full concat
    def loss_split(ec, xs, ck):
        out = edge_conv_head(ec, ck, cb, mk, k, pcat, pp, xs=xs,
                             interpret=True)
        return (jnp.sum(out[1] ** 2) + jnp.sum(out[2] ** 2)
                + jnp.sum(out[3][0]))

    def loss_full(ec, xs, ck):
        xf = jnp.concatenate(
            [jnp.broadcast_to(xs[:, None, :], (B, N, cx)), ec], axis=-1)
        wc, wn = ck[0, :, :C, :], ck[0, :, C:, :]
        conv_a = jnp.sum(wc - wn, axis=0)
        inte, partial, stats = _head_reference_given_idx(
            xf, wn.reshape(window * C, four_fin), conv_a, pb, a_merge,
            wen, pbm, pcat, pp, idx_s, k, window)[:3]
        return (jnp.sum(inte ** 2) + jnp.sum(partial ** 2)
                + jnp.sum(stats[0]) / count)

    g1 = jax.grad(loss_split, argnums=(0, 1, 2))(ec, xs, ck)
    g2 = jax.grad(loss_full, argnums=(0, 1, 2))(ec, xs, ck)
    for name, a, b in zip(("ec", "xs", "ck"), g1, g2):
        b_np = np.asarray(b)
        scale = max(np.abs(b_np).max(), 1.0)
        np.testing.assert_allclose(np.asarray(a), b_np, rtol=1.5e-2,
                                   atol=1.5e-2 * scale, err_msg=name)


def test_edge_tail_matches_reference():
    from pdgn_tpu.ops.pallas.bilateral_tail import (_pallas_tail, _reference)

    rng = np.random.RandomState(8)
    B, N, k, two_fin, two_f, H = 2, 128, 6, 16, 12, 8
    hk = k // 2
    four_fin = 2 * two_fin
    partial = jnp.asarray(rng.randn(B, N, two_f).astype(np.float32))
    inte = jnp.asarray(rng.randn(B, N, hk * four_fin).astype(np.float32))
    h = jnp.asarray(rng.randn(B, N, k * H).astype(np.float32) * 0.5)
    isc = jnp.asarray((rng.rand(four_fin) + 0.5).astype(np.float32))
    ish = jnp.asarray(rng.randn(four_fin).astype(np.float32) * 0.1)
    w2k = jnp.asarray(rng.randn(H, two_fin).astype(np.float32) * 0.3)
    w2b = jnp.asarray(rng.randn(two_fin).astype(np.float32) * 0.1)
    s2 = jnp.asarray((rng.rand(two_fin) + 0.5).astype(np.float32))
    t2 = jnp.asarray(rng.randn(two_fin).astype(np.float32) * 0.1)
    wi = jnp.asarray(
        rng.randn(hk * four_fin, two_f).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.randn(two_f).astype(np.float32) * 0.1)

    args = (partial, inte, h, isc, ish, w2k, w2b, s2, t2, wi, bias)
    got = _pallas_tail(*args, k, True, True)
    want = _reference(*args, k, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # ungated variant
    got = _pallas_tail(partial, inte, None, isc, ish, w2k, w2b, s2, t2,
                       wi, bias, k, False, True)
    want = _reference(partial, inte, None, isc, ish, w2k, w2b, s2, t2,
                      wi, bias, k, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("gated,softmax", [(True, True), (True, False),
                                           (False, False)])
def test_edge_tail_backward_kernel_matches_reference_vjp(gated, softmax):
    import jax as _jax

    from pdgn_tpu.ops.pallas.bilateral_tail import _fused, _reference

    rng = np.random.RandomState(21)
    B, N, k, two_fin, two_f, H = 2, 128, 6, 16, 12, 8
    hk = k // 2
    four_fin = 2 * two_fin
    partial = jnp.asarray(rng.randn(B, N, two_f).astype(np.float32))
    inte = jnp.asarray(rng.randn(B, N, hk * four_fin).astype(np.float32))
    h = (jnp.asarray(rng.randn(B, N, k * H).astype(np.float32) * 0.5)
         if gated else None)
    isc = jnp.asarray((rng.rand(four_fin) + 0.5).astype(np.float32))
    ish = jnp.asarray(rng.randn(four_fin).astype(np.float32) * 0.1)
    w2k = jnp.asarray(rng.randn(H, two_fin).astype(np.float32) * 0.3)
    w2b = jnp.asarray(rng.randn(two_fin).astype(np.float32) * 0.1)
    s2 = jnp.asarray((rng.rand(two_fin) + 0.5).astype(np.float32))
    t2 = jnp.asarray(rng.randn(two_fin).astype(np.float32) * 0.1)
    wi = jnp.asarray(
        rng.randn(hk * four_fin, two_f).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.randn(two_f).astype(np.float32) * 0.1)
    seed = jnp.asarray(rng.randn(B, N, two_f).astype(np.float32))

    args = (partial, inte, h, isc, ish, w2k, w2b, s2, t2, wi, bias)

    def loss_k(*a):
        out = _fused(*a, k, softmax, True)
        return jnp.sum(out * seed) + jnp.sum(jnp.sin(out))

    def loss_r(*a):
        out = _reference(*a, k, softmax)
        return jnp.sum(out * seed) + jnp.sum(jnp.sin(out))

    diff_idx = ([0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10] if gated
                else [0, 1, 3, 4, 9, 10])
    gk = _jax.grad(loss_k, argnums=tuple(diff_idx))(*args)
    gr = _jax.grad(loss_r, argnums=tuple(diff_idx))(*args)
    for i, (a, b) in enumerate(zip(gk, gr)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4,
            err_msg=f"cotangent {diff_idx[i]}")


def test_edge_head_gradients_match_reference_composition():
    """The custom VJPs must equal differentiating the jnp composition on
    the same (constant) kNN graph."""
    import jax as _jax

    from pdgn_tpu.ops.pallas.edge_head import (_head_reference_given_idx,
                                               edge_conv_head)

    rng = np.random.RandomState(9)
    x, ck, cb, mk, pcat, pp = _head_inputs(rng)
    k = 6
    window = ck.shape[1]
    C = x.shape[-1]
    four_fin = ck.shape[-1]

    def loss_kernel(x, ck, pcat):
        out = edge_conv_head(x, ck, cb, mk, k, pcat, pp, interpret=True)
        _, inte, partial, (m, v), wfea, wxyz, _, _ = out
        return (jnp.sum(inte ** 2) + jnp.sum(partial ** 2) + jnp.sum(m)
                + jnp.sum(v) + jnp.sum(wfea ** 2) + jnp.sum(wxyz ** 2))

    idx = edge_conv_head(x, ck, cb, mk, k, pcat, pp, interpret=True)[0]

    def loss_ref(x, ck, pcat):
        wc, wn = ck[0, :, :C, :], ck[0, :, C:, :]
        conv_a = jnp.sum(wc - wn, axis=0)
        kr = mk.reshape(2 * k, 2 * C, mk.shape[-1])
        a_merge = jnp.sum(kr[:k, :C, :] - kr[:k, C:, :], axis=0)
        wen = kr[:k, C:, :].reshape(k * C, mk.shape[-1])
        pb = jnp.broadcast_to(cb[None, :], (x.shape[0], four_fin))
        pbm = jnp.zeros((x.shape[0], mk.shape[-1]), jnp.float32)
        inte, partial, stats, wfea, wxyz, _ = _head_reference_given_idx(
            x, wn.reshape(window * C, four_fin), conv_a, pb, a_merge, wen,
            pbm, pcat, pp, idx, k, window)
        count = x.shape[0] * x.shape[1] * (k // 2)
        m = stats[0] / count
        v = stats[1] / count - m ** 2
        return (jnp.sum(inte ** 2) + jnp.sum(partial ** 2) + jnp.sum(m)
                + jnp.sum(v) + jnp.sum(wfea ** 2) + jnp.sum(wxyz ** 2))

    g1 = _jax.grad(loss_kernel, argnums=(0, 1, 2))(x, ck, pcat)
    g2 = _jax.grad(loss_ref, argnums=(0, 1, 2))(x, ck, pcat)
    # the Pallas backward rounds GEMM operands to bf16 (the same rounding
    # XLA default precision applies on TPU) -> tolerance scales with the
    # gradient magnitude of each group
    for a, b in zip(g1, g2):
        b_np = np.asarray(b)
        scale = np.abs(b_np).max()
        np.testing.assert_allclose(np.asarray(a), b_np,
                                   rtol=1.5e-2, atol=1.5e-2 * scale)


@pytest.mark.parametrize("gated", [True, False])
def test_edge_head_backward_kernel_exact_at_fp32(gated, monkeypatch):
    """With fp32 GEMM operands the Pallas head backward must match the
    reference VJP to accumulation-order noise — isolates kernel math from
    the (intentional) bf16 operand rounding."""
    import jax as _jax

    import pdgn_tpu.ops.pallas.edge_head as eh

    monkeypatch.setattr(eh, "_BWD_MM_DTYPE", jnp.float32)
    rng = np.random.RandomState(13)
    if gated:
        x, ck, cb, mk, pcat, pp = _head_inputs(rng)
    else:
        x, ck, cb, mk = _head_inputs(rng, gated=False)
        pcat = pp = None
    k = 6
    window = ck.shape[1]
    C = x.shape[-1]
    four_fin = ck.shape[-1]

    def loss_kernel(x, ck, cb, mk):
        out = eh.edge_conv_head(x, ck, cb, mk, k, pcat, pp, interpret=True)
        _, inte, partial, (m, v) = out[:4]
        s = (jnp.sum(inte ** 2) + jnp.sum(partial ** 2) + jnp.sum(m)
             + jnp.sum(v * jnp.cos(v)))
        if gated:
            wfea, wxyz, (fm, fv), (xm, xv) = out[4:]
            s = (s + jnp.sum(wfea ** 2) + jnp.sum(wxyz ** 2)
                 + jnp.sum(fm * fv) + jnp.sum(xm + xv))
        return s

    idx = eh.edge_conv_head(x, ck, cb, mk, k, pcat, pp, interpret=True)[0]

    def loss_ref(x, ck, cb, mk):
        wc, wn = ck[0, :, :C, :], ck[0, :, C:, :]
        conv_a = jnp.sum(wc - wn, axis=0)
        kr = mk.reshape(2 * k, 2 * C, mk.shape[-1])
        a_merge = jnp.sum(kr[:k, :C, :] - kr[:k, C:, :], axis=0)
        wen = kr[:k, C:, :].reshape(k * C, mk.shape[-1])
        pb = jnp.broadcast_to(cb[None, :], (x.shape[0], four_fin))
        pbm = jnp.zeros((x.shape[0], mk.shape[-1]), jnp.float32)
        inte, partial, stats, wfea, wxyz, wstats = \
            eh._head_reference_given_idx(
                x, wn.reshape(window * C, four_fin), conv_a, pb, a_merge,
                wen, pbm, pcat, pp, idx, k, window)
        count = x.shape[0] * x.shape[1] * (k // 2)
        m = stats[0] / count
        v = stats[1] / count - m ** 2
        s = (jnp.sum(inte ** 2) + jnp.sum(partial ** 2) + jnp.sum(m)
             + jnp.sum(v * jnp.cos(v)))
        if gated:
            wcount = x.shape[0] * x.shape[1] * k
            ws = wstats.reshape(2, k, 32)
            wm = jnp.sum(ws[0], axis=0) / wcount
            wv = jnp.sum(ws[1], axis=0) / wcount - wm ** 2
            s = (s + jnp.sum(wfea ** 2) + jnp.sum(wxyz ** 2)
                 + jnp.sum(wm[:16] * wv[:16]) + jnp.sum(wm[16:] + wv[16:]))
        return s

    g1 = _jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(x, ck, cb, mk)
    g2 = _jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, ck, cb, mk)
    for name, a, b in zip(("x", "ck", "cb", "mk"), g1, g2):
        b_np = np.asarray(b)
        scale = max(np.abs(b_np).max(), 1.0)
        np.testing.assert_allclose(np.asarray(a), b_np,
                                   rtol=1e-5, atol=2e-5 * scale,
                                   err_msg=name)


def test_local_mean_cov_matches_reference():
    from pdgn_tpu.ops.pallas.local_stats import _fused, _reference

    rng = np.random.RandomState(11)
    src = jnp.asarray(rng.randn(2, 200, 3).astype(np.float32) * 0.4)
    centers = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32) * 0.4)
    mu, cov = _fused(src, centers, 8, True)
    mu_r, cov_r = _reference(src, centers, 8)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cov), np.asarray(cov_r),
                               rtol=1e-3, atol=1e-5)
    # self-neighbourhoods (src is centers): knn includes the query point
    mu, cov = _fused(centers, centers, 8, True)
    mu_r, cov_r = _reference(centers, centers, 8)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cov), np.asarray(cov_r),
                               rtol=1e-3, atol=1e-5)


def test_local_mean_cov_exact_ties_at_k_boundary():
    """Exact distance ties straddling the k-th neighbour: the kernel's
    compact (theta, tie-lane) selection residual must reproduce the
    reference first-min tie-break in BOTH directions — the forward's
    moments and the backward's rebuilt mask (integer-lattice coordinates
    make the tied distances bit-exact)."""
    import itertools

    import jax as _jax

    from pdgn_tpu.ops.pallas.local_stats import _fused, _reference

    shell1 = [p for p in set(itertools.permutations((1.0, 0.0, 0.0)))]
    shell1 += [tuple(-c for c in p) for p in shell1]            # d^2 = 1, x6
    shell2 = sorted(set(
        p for s in itertools.product((1.0, -1.0), repeat=2)
        for p in itertools.permutations((s[0], s[1], 0.0))))    # d^2 = 2, x12
    shell3 = list(itertools.product((1.0, -1.0), repeat=3))     # d^2 = 3, x8
    far = [(9.0 + i, 9.0, 9.0) for i in range(6)]
    pts = np.array(shell1 + shell2 + shell3 + far, np.float32)  # (32, 3)
    src = jnp.asarray(np.tile(pts[None], (1, 1, 1)))            # (1, 32, 3)
    centers = jnp.zeros((1, 128, 3), jnp.float32)               # all at 0

    for k in (6, 8, 18, 20):  # k=8/20 cut shell2/shell3 ties mid-shell
        mu, cov = _fused(src, centers, k, True)
        mu_r, cov_r = _reference(src, centers, k)
        np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_r),
                                   rtol=1e-5, atol=1e-6, err_msg=f"k={k}")
        np.testing.assert_allclose(np.asarray(cov), np.asarray(cov_r),
                                   rtol=1e-5, atol=1e-6, err_msg=f"k={k}")

        def loss_k(s, _k=k):
            mu, cov = _fused(s, centers, _k, True)
            return jnp.sum(mu * jnp.sin(mu)) + jnp.sum(cov ** 2)

        def loss_r(s, _k=k):
            mu, cov = _reference(s, centers, _k)
            return jnp.sum(mu * jnp.sin(mu)) + jnp.sum(cov ** 2)

        g1 = _jax.grad(loss_k)(src)
        g2 = _jax.grad(loss_r)(src)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-4, atol=1e-5, err_msg=f"k={k}")


def test_local_mean_cov_gradient_matches_reference():
    import jax as _jax

    from pdgn_tpu.ops.pallas.local_stats import _fused, _reference

    rng = np.random.RandomState(12)
    src = jnp.asarray(rng.randn(1, 200, 3).astype(np.float32) * 0.4)
    centers = jnp.asarray(rng.randn(1, 128, 3).astype(np.float32) * 0.4)

    def loss_k(s):
        mu, cov = _fused(s, centers, 8, True)
        return jnp.sum(mu ** 2) + jnp.sum(cov * jnp.cos(cov))

    def loss_r(s):
        mu, cov = _reference(s, centers, 8)
        return jnp.sum(mu ** 2) + jnp.sum(cov * jnp.cos(cov))

    g1 = _jax.grad(loss_k)(src)
    g2 = _jax.grad(loss_r)(src)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-4)


def test_local_mean_cov_radix_select_matches_chain():
    """The radix (bitwise binary-search) selection is pass-restructured
    but must be bit-equivalent to the first-min chain: same moments,
    same (theta, tie) residual semantics, same gradients — on random
    data, on exact tie shells straddling the k boundary, and on clouds
    with duplicated points (bit-equal distances)."""
    import itertools

    import jax as _jax

    from pdgn_tpu.ops.pallas.local_stats import _fused

    rng = np.random.RandomState(21)
    src = jnp.asarray(rng.randn(2, 200, 3).astype(np.float32) * 0.4)
    centers = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32) * 0.4)
    for k in (1, 8, 20):
        mu_c, cov_c = _fused(src, centers, k, True, "chain")
        mu_r, cov_r = _fused(src, centers, k, True, "radix")
        np.testing.assert_array_equal(np.asarray(mu_c), np.asarray(mu_r),
                                      err_msg=f"k={k}")
        np.testing.assert_array_equal(np.asarray(cov_c), np.asarray(cov_r),
                                      err_msg=f"k={k}")

    # exact tie shells around the origin (integer lattice: bit-exact)
    shell1 = [p for p in set(itertools.permutations((1.0, 0.0, 0.0)))]
    shell1 += [tuple(-c for c in p) for p in shell1]
    shell2 = sorted(set(
        p for s in itertools.product((1.0, -1.0), repeat=2)
        for p in itertools.permutations((s[0], s[1], 0.0))))
    shell3 = list(itertools.product((1.0, -1.0), repeat=3))
    far = [(9.0 + i, 9.0, 9.0) for i in range(6)]
    pts = np.array(shell1 + shell2 + shell3 + far, np.float32)
    tsrc = jnp.asarray(pts[None])
    tcent = jnp.zeros((1, 128, 3), jnp.float32)
    # duplicated points: several bit-identical distances per row
    dup = np.tile(rng.randn(1, 50, 3).astype(np.float32) * 0.3, (1, 4, 1))
    dsrc = jnp.asarray(dup)
    for s, c in ((tsrc, tcent), (dsrc, centers[:1])):
        for k in (6, 8, 20):
            mu_c, cov_c = _fused(s, c, k, True, "chain")
            mu_r, cov_r = _fused(s, c, k, True, "radix")
            np.testing.assert_array_equal(
                np.asarray(mu_c), np.asarray(mu_r), err_msg=f"k={k}")
            np.testing.assert_array_equal(
                np.asarray(cov_c), np.asarray(cov_r), err_msg=f"k={k}")

            def loss(x, _k=k, _c=c, _sel="radix"):
                mu, cov = _fused(x, _c, _k, True, _sel)
                return jnp.sum(mu * jnp.sin(mu)) + jnp.sum(cov ** 2)

            g_r = _jax.grad(functools.partial(loss, _sel="radix"))(s)
            g_c = _jax.grad(functools.partial(loss, _sel="chain"))(s)
            np.testing.assert_array_equal(
                np.asarray(g_r), np.asarray(g_c), err_msg=f"k={k}")


def test_local_mean_cov_select_env_default(monkeypatch):
    from pdgn_tpu.ops.pallas import local_stats

    rng = np.random.RandomState(5)
    src = jnp.asarray(rng.randn(1, 96, 3).astype(np.float32))
    centers = jnp.asarray(rng.randn(1, 128, 3).astype(np.float32))
    monkeypatch.setenv("PDGN_LOCAL_STATS_SELECT", "radix")
    mu_env, _ = local_stats.local_mean_cov(src, centers, 4, interpret=True)
    mu_r, _ = local_stats.local_mean_cov(src, centers, 4, interpret=True,
                                         select="radix")
    np.testing.assert_array_equal(np.asarray(mu_env), np.asarray(mu_r))
    monkeypatch.setenv("PDGN_LOCAL_STATS_SELECT", "bogus")
    with pytest.raises(ValueError, match="bogus"):
        local_stats.local_mean_cov(src, centers, 4, interpret=True)


def test_slot_moment_stats_matches_jnp():
    """Pallas slot stats == jnp reshape path (sums + second moment),
    and the custom backward == differentiating the jnp formulation."""
    from pdgn_tpu.ops.pallas.slot_stats import (_jnp_stats,
                                                slot_moment_stats)

    rng = np.random.RandomState(3)
    B, N, k, H = 2, 128, 6, 16
    h = jnp.asarray(rng.randn(B, N, k * H).astype(np.float32))

    s_k, S_k = slot_moment_stats(h, k, True)
    s_j, S_j = _jnp_stats(h, k)
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_j),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(S_k), np.asarray(S_j),
                               rtol=1e-5, atol=1e-4)

    def loss_k(h):
        s, S = slot_moment_stats(h, k, True)
        return jnp.sum(s * jnp.cos(s)) + jnp.sum(S ** 2)

    def loss_j(h):
        s, S = _jnp_stats(h, k)
        return jnp.sum(s * jnp.cos(s)) + jnp.sum(S ** 2)

    g1 = jax.grad(loss_k)(h)
    g2 = jax.grad(loss_j)(h)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-3)

    # bf16 inputs: products are exact in fp32, so the kernel still agrees
    hb = h.astype(jnp.bfloat16)
    s_b, S_b = slot_moment_stats(hb, k, True)
    s_r, S_r = _jnp_stats(hb.astype(jnp.float32), k)
    np.testing.assert_allclose(np.asarray(S_b), np.asarray(S_r),
                               rtol=1e-5, atol=1e-4)
