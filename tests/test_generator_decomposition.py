"""The edge-tensor decomposition must equal the explicit computation.

Every consumer of ``e = [central | nbr - central]`` is linear in the
channel dim, so the generator computes ``W_c @ x + W_n @ nbr`` instead of
materialising e. These tests build e explicitly and compare.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pdgn_tpu.models.generator import _merge_gemm, _split_1x1
from pdgn_tpu.ops.edges import neighbor_features
from pdgn_tpu.ops.grouping import grouping

B, N, K, C = 2, 32, 5, 8


def _edges(x, nbr):
    central = jnp.broadcast_to(x[:, :, None, :], nbr.shape)
    return jnp.concatenate([central, nbr - central], axis=-1)


def test_merge_gemm_equals_explicit(rng):
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx, nbr = neighbor_features(x, K)
    inte = jnp.asarray(rng.randn(B, N, K, 2 * C).astype(np.float32))
    kernel = jnp.asarray(rng.randn(2 * K * 2 * C, 6).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(6).astype(np.float32))

    got = _merge_gemm(x, nbr, inte, (kernel, bias), None)

    e = _edges(x, nbr)
    merge = jnp.concatenate([e, inte], axis=2)              # (B,N,2K,2C)
    want = merge.reshape(B, N, 2 * K * 2 * C) @ kernel + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)


def test_split_1x1_equals_explicit(rng):
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    pc = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    idx, nbr = neighbor_features(x, K)
    kernel = jnp.asarray(rng.randn(2 * C, 16).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.randn(16).astype(np.float32))

    got = _split_1x1(x, x, idx, (kernel, bias), None)
    want = _edges(x, nbr) @ kernel + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    # xyz variant: same graph, xyz values
    kernel3 = jnp.asarray(rng.randn(6, 16).astype(np.float32) * 0.2)
    got3 = _split_1x1(pc, pc, idx, (kernel3, bias), None)
    nbr_xyz = grouping(pc, idx)
    want3 = _edges(pc, nbr_xyz) @ kernel3 + bias
    np.testing.assert_allclose(np.asarray(got3), np.asarray(want3),
                               atol=2e-5)


def test_window_conv_equals_explicit(rng):
    from pdgn_tpu.models.generator import _WindowConv, _block_channel_perm

    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx, nbr = neighbor_features(x, K)
    window = K // 2 + 1
    m = _WindowConv(4 * C, window)
    variables = m.init(jax.random.PRNGKey(0), x, nbr)
    got, _ = m.apply(variables, x, nbr, mutable=["batch_stats"])

    # explicit: VALID conv over the neighbour axis of e; the module emits
    # channels in block order (BN params interpreted in block order too)
    perm = np.asarray(_block_channel_perm(4 * C))
    e = _edges(x, nbr)
    kernel = variables["params"]["conv"]["kernel"]          # (1,W,2C,4C)
    bias = variables["params"]["conv"]["bias"]
    conv = jax.lax.conv_general_dilated(
        e, kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    want_pre = (conv + bias)[..., perm]
    # replicate BN (batch stats) + leaky
    mean = want_pre.mean(axis=(0, 1, 2))
    var = want_pre.var(axis=(0, 1, 2))
    scale = variables["params"]["BatchNorm_0"]["bn"]["scale"]
    b2 = variables["params"]["BatchNorm_0"]["bn"]["bias"]
    norm = (want_pre - mean) / jnp.sqrt(var + 1e-5) * scale + b2
    want = jax.nn.leaky_relu(norm, 0.01)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def _interleave_halves_ref(inte, two_fin):
    """The reference interleave (models/PDGNet_v2.py:574-578), kept here as
    the oracle for the block-order layout used by the generator."""
    b, n, half_k, _ = inte.shape
    r = inte.reshape(b, n, half_k, two_fin, 2)
    r = r.transpose(0, 1, 4, 2, 3)
    return r.reshape(b, n, 2 * half_k, two_fin)


def test_bilateral_block_layout_equals_reference_composition(rng):
    """The block-order bilateral edge conv must equal the reference
    composition: interleave(conv) * softmax(weight-net) -> merge."""
    from pdgn_tpu.models.generator import (
        BilateralUpsampleEdgeConv, _WindowConv, _block_channel_perm,
        _merge_gemm, _split_1x1)
    from pdgn_tpu.models.layers import leaky_relu

    k = 6  # even, hk = 3
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    pc = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    m = BilateralUpsampleEdgeConv(C, C, k)
    variables = m.init(jax.random.PRNGKey(1), x, pc)
    got, _ = m.apply(variables, x, pc, mutable=["batch_stats"])

    # --- explicit reference composition on the same params ---
    p = variables["params"]
    idx, nbr = neighbor_features(x, k)

    def bn(v, params_key, values):
        scale = p[params_key]["bn"]["scale"]
        bias = p[params_key]["bn"]["bias"]
        mean = values.mean(axis=tuple(range(values.ndim - 1)))
        var = values.var(axis=tuple(range(values.ndim - 1)))
        return (values - mean) / jnp.sqrt(var + 1e-5) * scale + bias

    wf = _split_1x1(x, x, idx, (p["conv_fea"]["dense"]["kernel"],
                                p["conv_fea"]["dense"]["bias"]), None)
    wf = leaky_relu(bn(variables, "bn_fea", wf))
    wx = _split_1x1(pc, pc, idx, (p["conv_xyz"]["dense"]["kernel"],
                                  p["conv_xyz"]["dense"]["bias"]), None)
    wx = leaky_relu(bn(variables, "bn_xyz", wx))
    w = wf * wx
    w = leaky_relu(bn(variables, "bn_all1",
                      w @ p["conv_all1"]["dense"]["kernel"]
                      + p["conv_all1"]["dense"]["bias"]))
    w = leaky_relu(bn(variables, "bn_all2",
                      w @ p["conv_all2"]["dense"]["kernel"]
                      + p["conv_all2"]["dense"]["bias"]))
    w = jax.nn.softmax(w, axis=2)                      # (B,N,k,2C)

    # window conv in block order -> undo the permutation for the oracle
    wc_mod = _WindowConv(4 * C, k // 2 + 1)
    conv_block, _ = wc_mod.apply(
        {"params": p["_WindowConv_0"],
         "batch_stats": variables["batch_stats"]["_WindowConv_0"]},
        x, nbr, mutable=["batch_stats"])
    inv = np.argsort(np.asarray(_block_channel_perm(4 * C)))
    conv_ref_order = conv_block[..., jnp.asarray(inv)]
    inte = _interleave_halves_ref(conv_ref_order, 2 * C)  # (B,N,k,2C)
    inte = inte * w

    merge = _merge_gemm(x, nbr, inte,
                        (p["TorchDense_0"]["dense"]["kernel"],
                         p["TorchDense_0"]["dense"]["bias"]), None)
    merge = bn(variables, "BatchNorm_0", merge)
    want_pre = jax.nn.relu(merge)                      # (B,N,2C)
    bb, nn_, two_f = want_pre.shape
    r = want_pre.reshape(bb, nn_, two_f // 2, 2).transpose(0, 3, 1, 2)
    want = r.reshape(bb, 2 * nn_, two_f // 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-4)
