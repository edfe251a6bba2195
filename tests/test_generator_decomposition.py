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
    import flax.linen as nn

    from pdgn_tpu.models.generator import _WindowConv

    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx, nbr = neighbor_features(x, K)
    window = K // 2 + 1
    m = _WindowConv(4 * C, window)
    variables = m.init(jax.random.PRNGKey(0), x, nbr)
    got, _ = m.apply(variables, x, nbr, mutable=["batch_stats"])

    # explicit: VALID conv over the neighbour axis of e
    e = _edges(x, nbr)
    kernel = variables["params"]["conv"]["kernel"]          # (1,W,2C,4C)
    bias = variables["params"]["conv"]["bias"]
    conv = jax.lax.conv_general_dilated(
        e, kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    want_pre = conv + bias
    # replicate BN (batch stats) + leaky
    mean = want_pre.mean(axis=(0, 1, 2))
    var = want_pre.var(axis=(0, 1, 2))
    scale = variables["params"]["BatchNorm_0"]["bn"]["scale"]
    b2 = variables["params"]["BatchNorm_0"]["bn"]["bias"]
    norm = (want_pre - mean) / jnp.sqrt(var + 1e-5) * scale + b2
    want = jax.nn.leaky_relu(norm, 0.01)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
