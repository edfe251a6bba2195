"""Model-layer tests: shapes, parameter counts, BN semantics.

The full generator is expensive to run eagerly on a single CPU core, so
everything goes through one jitted apply (compiled once per session and
persisted in the compilation cache).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdgn_tpu.models import (
    PointDiscriminator1,
    PointDiscriminator2,
    PointDiscriminator3,
    PointDiscriminator4,
    PointGenerator,
)


@pytest.fixture(scope="module")
def gen_setup():
    model = PointGenerator()
    z = jnp.zeros((2, 128))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), z)

    @jax.jit
    def apply(variables, z):
        outs, _ = model.apply(z=z, variables=variables, mutable=["batch_stats"])
        return outs

    return model, variables, apply


def test_generator_output_shapes(gen_setup):
    _, variables, apply = gen_setup
    z = jnp.asarray(np.random.RandomState(0).randn(2, 128).astype(np.float32))
    x1, x2, x3, x4 = apply(variables, z)
    assert x1.shape == (2, 256, 3)
    assert x2.shape == (2, 512, 3)
    assert x3.shape == (2, 1024, 3)
    assert x4.shape == (2, 2048, 3)
    for x in (x1, x2, x3, x4):
        assert bool(jnp.all(jnp.isfinite(x)))


def test_generator_param_count(gen_setup):
    # pins the layer wiring to the reference architecture: the torch
    # reference PointGenerator has 12,711,372 parameters
    _, variables, _ = gen_setup
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    assert n == 12_711_372, n


def test_generator_batch_stat_normalisation(gen_setup):
    """BN uses batch stats: scaling the input must not blow up outputs."""
    _, variables, apply = gen_setup
    z = jnp.asarray(np.random.RandomState(1).randn(2, 128).astype(np.float32))
    a1 = apply(variables, z)[0]
    b1 = apply(variables, z * 100.0)[0]
    assert float(jnp.abs(b1).mean()) < 100 * float(jnp.abs(a1).mean() + 1)


@pytest.mark.parametrize(
    "factory,npts",
    [
        (PointDiscriminator1, 256),
        (PointDiscriminator2, 512),
        (PointDiscriminator3, 1024),
        (PointDiscriminator4, 2048),
    ],
)
def test_discriminator_shapes(factory, npts):
    model = factory()
    x = jnp.zeros((2, npts, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out, _ = model.apply(x=x, variables=variables, mutable=["batch_stats"])
    assert out.shape == (2, 1)


def test_discriminator_param_counts():
    # golden values from the torch reference models
    want = {
        PointDiscriminator1: 83_713,
        PointDiscriminator2: 322_945,
        PointDiscriminator3: 322_945,
        PointDiscriminator4: 980_353,
    }
    for factory, expected in want.items():
        model = factory()
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 3)))
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
        assert n == expected, (factory.__name__, n)


def test_dense_dbr_layer():
    """fcdbr-parity layer (Dense + Dropout + BN + activation)."""
    import flax.linen as nn_

    from pdgn_tpu.models.layers import DenseDBR

    m = DenseDBR(8, drop_rate=0.5, negative_slope=0.01)
    x = jnp.ones((4, 6))
    variables = m.init(jax.random.PRNGKey(0), x)
    out, _ = m.apply(variables, x, deterministic=True,
                     mutable=["batch_stats"])
    assert out.shape == (4, 8)
    # stochastic mode needs a dropout rng and changes the output
    out2, _ = m.apply(variables, x, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(1)},
                      mutable=["batch_stats"])
    assert out2.shape == (4, 8)


def test_edge_conv_matches_naive_composition():
    """EdgeConv (reference edgeConv, models/PDGNet_v2.py:652-670 — off the
    live path) must equal the naive edge-tensor composition."""
    import jax

    from pdgn_tpu.models import EdgeConv
    from pdgn_tpu.ops.edges import _neighbor_idx
    from pdgn_tpu.ops.grouping import grouping

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 64, 8).astype(np.float32))
    m = EdgeConv(fin=8, fout=16, k=6)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x, mutable=["batch_stats"])[0]
    assert y.shape == (2, 64, 16)

    # naive: e = [x | nbr - x] @ W + b -> BN (batch stats) -> relu -> max_k
    kernel = v["params"]["conv"]["dense"]["kernel"]
    bias = v["params"]["conv"]["dense"]["bias"]
    idx = _neighbor_idx(x, 6)
    nbr = grouping(x, idx)                          # (B, N, k, C)
    e = jnp.concatenate(
        [jnp.broadcast_to(x[:, :, None, :], nbr.shape), nbr - x[:, :, None, :]],
        axis=-1)
    pre = jnp.einsum("bnkc,cf->bnkf", e, kernel) + bias
    mean = pre.mean(axis=(0, 1, 2))
    var = pre.var(axis=(0, 1, 2))
    normed = (pre - mean) / np.sqrt(var + 1e-5)
    want = jnp.max(jax.nn.relu(normed), axis=2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_masked_moments_all_padded_is_finite():
    """An all-zero mask must not NaN (clamped denominator)."""
    from pdgn_tpu.models.layers import masked_moments

    x = jnp.ones((4, 5, 3))
    mean, var = masked_moments(x, jnp.zeros((4,)))
    assert np.isfinite(np.asarray(mean)).all()
    assert np.isfinite(np.asarray(var)).all()


def test_linear_bn_stats_mask_plus_axis_name_refuses():
    """Padded batches + explicit axis_name is an unimplemented stats
    combination; it must refuse loudly (like masked BatchNorm), not
    silently pmean per-shard moments."""
    from pdgn_tpu.models.layers import batch_mask, linear_bn_stats

    x = jnp.ones((4, 6, 8))
    k = jnp.ones((8, 16))
    b = jnp.zeros((16,))
    with batch_mask(jnp.asarray([1.0, 1.0, 1.0, 0.0])):
        with pytest.raises(NotImplementedError):
            linear_bn_stats(x, k, b, "data")
