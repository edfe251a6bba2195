"""Paired (stacked real|fake) discriminator pass == two sequential passes.

The train step evaluates D(real) and D(fake) in one rank-4 stacked apply
with per-half BN statistics (models/discriminator.py ``paired``); the
reference runs two sequential forwards (models/PDGNet_v2.py:716-739).
These must agree exactly: logits, updated running statistics (two-step
EMA fold), and loss gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdgn_tpu.models.discriminator import (
    PointDiscriminator1,
    PointDiscriminator2,
    PointDiscriminator4,
)


def _sequential(disc, variables, real, fake):
    """Reference semantics: D(real) then D(fake), threading batch_stats."""
    pred_r, upd = disc.apply(variables, real, mutable=["batch_stats"])
    variables = {"params": variables["params"], **upd}
    pred_f, upd = disc.apply(variables, fake, mutable=["batch_stats"])
    return pred_r, pred_f, upd["batch_stats"]


@pytest.mark.parametrize("factory,n", [
    (PointDiscriminator1, 64),   # narrow widths -> linear_bn_stats path
    (PointDiscriminator4, 96),   # 1024-wide tail -> plain BatchNorm path
])
def test_paired_matches_sequential(factory, n):
    disc = factory()
    paired = disc.clone(paired=True)
    rng = np.random.RandomState(0)
    real = jnp.asarray(rng.randn(3, n, 3).astype(np.float32))
    fake = jnp.asarray(rng.randn(3, n, 3).astype(np.float32))
    variables = disc.init(jax.random.PRNGKey(0), real)

    pred_r, pred_f, stats_seq = _sequential(disc, variables, real, fake)
    pred_p, upd = paired.apply(variables, jnp.stack([real, fake]),
                               mutable=["batch_stats"])

    np.testing.assert_allclose(pred_p[0], pred_r, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(pred_p[1], pred_f, rtol=1e-5, atol=1e-5)
    flat_seq = jax.tree_util.tree_leaves(stats_seq)
    flat_par = jax.tree_util.tree_leaves(upd["batch_stats"])
    for a, b in zip(flat_seq, flat_par):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_paired_gradients_match():
    disc = PointDiscriminator2()
    paired = disc.clone(paired=True)
    rng = np.random.RandomState(1)
    real = jnp.asarray(rng.randn(2, 48, 3).astype(np.float32))
    fake = jnp.asarray(rng.randn(2, 48, 3).astype(np.float32))
    variables = disc.init(jax.random.PRNGKey(1), real)
    stats = variables["batch_stats"]

    def loss_seq(params):
        pr, _ = disc.apply({"params": params, "batch_stats": stats}, real,
                           mutable=["batch_stats"])
        pf, _ = disc.apply({"params": params, "batch_stats": stats}, fake,
                           mutable=["batch_stats"])
        return (jnp.mean((pr - 1.0) ** 2) + jnp.mean(pf ** 2)) / 2.0

    def loss_pair(params):
        pred, _ = paired.apply({"params": params, "batch_stats": stats},
                               jnp.stack([real, fake]),
                               mutable=["batch_stats"])
        return (jnp.mean((pred[0] - 1.0) ** 2)
                + jnp.mean(pred[1] ** 2)) / 2.0

    l_s, g_s = jax.value_and_grad(loss_seq)(variables["params"])
    l_p, g_p = jax.value_and_grad(loss_pair)(variables["params"])
    np.testing.assert_allclose(l_p, l_s, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_s),
                    jax.tree_util.tree_leaves(g_p)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_paired_masked_batch():
    """Padded-batch masking applies identically to both halves."""
    from pdgn_tpu.models.layers import batch_mask

    disc = PointDiscriminator1()
    paired = disc.clone(paired=True)
    rng = np.random.RandomState(2)
    real = jnp.asarray(rng.randn(4, 32, 3).astype(np.float32))
    fake = jnp.asarray(rng.randn(4, 32, 3).astype(np.float32))
    variables = disc.init(jax.random.PRNGKey(2), real)
    mask = jnp.asarray([1.0, 1.0, 1.0, 0.0])

    with batch_mask(mask):
        pr, pf, stats_seq = _sequential(disc, variables, real, fake)
        pred_p, upd = paired.apply(variables, jnp.stack([real, fake]),
                                   mutable=["batch_stats"])
    np.testing.assert_allclose(pred_p[0], pr, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(pred_p[1], pf, rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(stats_seq),
                    jax.tree_util.tree_leaves(upd["batch_stats"])):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_dense_br_pool_matches_unfused():
    """DenseBRPool == DenseBR + max, including negative BN scales.

    The fused pool picks min instead of max where the BN scale is
    negative; forcing half the scales negative exercises that branch.
    """
    from pdgn_tpu.models.layers import DenseBR, DenseBRPool, batch_mask

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 40, 16).astype(np.float32))
    fused = DenseBRPool(32)
    unfused = DenseBR(32, negative_slope=0.01)
    variables = fused.init(jax.random.PRNGKey(3), x)
    # same variable tree by construction; flip half the BN scales negative
    sc = variables["params"]["BatchNorm_0"]["bn"]["scale"]
    sc = sc.at[::2].multiply(-1.0)
    variables = jax.tree_util.tree_map(lambda v: v, variables)
    variables["params"]["BatchNorm_0"]["bn"]["scale"] = sc

    ref, ref_upd = unfused.apply(variables, x, mutable=["batch_stats"])
    ref = jnp.max(ref, axis=-2)
    got, got_upd = fused.apply(variables, x, mutable=["batch_stats"])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(ref_upd),
                    jax.tree_util.tree_leaves(got_upd)):
        # reduction order differs between the two compiled programs
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)

    # masked (padded batch): stats exclude the padded sample
    mask = jnp.asarray([1.0, 1.0, 0.0, 1.0])
    with batch_mask(mask):
        ref, _ = unfused.apply(variables, x, mutable=["batch_stats"])
        ref = jnp.max(ref, axis=-2)
        got, _ = fused.apply(variables, x, mutable=["batch_stats"])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    # paired rank-4 input
    xp = jnp.stack([x, x[::-1]])
    ref0, _ = unfused.clone(paired=True).apply(variables, xp,
                                               mutable=["batch_stats"])
    ref0 = jnp.max(ref0, axis=-2)
    got0, _ = fused.clone(paired=True).apply(variables, xp,
                                             mutable=["batch_stats"])
    np.testing.assert_allclose(got0, ref0, rtol=1e-5, atol=1e-6)
