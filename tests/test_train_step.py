"""GAN train-step smoke tests (tiny generator, CPU).

Uses ``base_points=16`` (stages 32/64/128/256 points) so one full jitted
step — 2 generator forwards, 4 D updates, the 6-pair shape-preserving
loss and the G update — compiles in reasonable time on CPU. The real
sizes run on TPU via bench.py / the trainer.
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
from pdgn_tpu.train import TrainConfig, init_state, make_train_step
from pdgn_tpu.train.checkpoint import load as ckpt_load
from pdgn_tpu.train.checkpoint import save as ckpt_save

BASE = 16
SIZES = (32, 64, 128, 256)
BATCH = 4


@pytest.fixture(scope="module")
def setup():
    gen = PointGenerator(num_point=SIZES[-1], num_k=20, base_points=BASE)
    discs = (
        PointDiscriminator1(), PointDiscriminator2(),
        PointDiscriminator3(), PointDiscriminator4(),
    )
    cfg = TrainConfig()
    state = init_state(gen, discs, cfg, jax.random.PRNGKey(0), BATCH,
                       num_points=SIZES)
    step = jax.jit(make_train_step(gen, discs, cfg))
    rng = np.random.RandomState(0)
    reals = tuple(
        jnp.asarray(rng.randn(BATCH, n, 3).astype(np.float32)) for n in SIZES
    )
    return state, step, reals


def test_train_step_runs_and_updates(setup):
    state, step, reals = setup
    new_state, metrics = step(state, reals, jax.random.PRNGKey(1))
    for k in ("d_loss1", "d_loss2", "d_loss3", "d_loss4", "g_loss",
              "similar_loss"):
        v = float(metrics[k])
        assert np.isfinite(v), (k, v)
    assert int(new_state.step) == 1
    # parameters actually moved
    before = jax.tree.leaves(state.g.params)[0]
    after = jax.tree.leaves(new_state.g.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_d_losses_decrease_over_steps(setup):
    state, step, reals = setup
    rng = jax.random.PRNGKey(2)
    first = None
    for i in range(5):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, reals, sub)
        if first is None:
            first = float(metrics["d_loss1"])
    last = float(metrics["d_loss1"])
    # LSGAN D loss starts near 0.25-0.5 and should drop as D learns
    assert last < first, (first, last)


def test_checkpoint_roundtrip(tmp_path, setup):
    state, step, reals = setup
    state, _ = step(state, reals, jax.random.PRNGKey(3))
    ckpt_save(str(tmp_path), state, epoch=7, category="chair")
    assert (tmp_path / "7_chair_G.msgpack").exists()
    assert (tmp_path / "7_chair_D.msgpack").exists()

    restored, epoch = ckpt_load(
        str(tmp_path / "7_chair_G.msgpack"),
        str(tmp_path / "7_chair_D.msgpack"),
        state,
    )
    assert epoch == 7
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # restored state must be steppable
    _, metrics = step(restored, reals, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["g_loss"]))


def test_bf16_compute_dtype_step_runs_finite():
    """--compute_dtype bfloat16 (generator large activations in bf16,
    fp32 params/BN stats/coordinate heads) must produce a finite step."""
    import jax

    from pdgn_tpu.models import (
        PointDiscriminator1, PointDiscriminator2,
        PointDiscriminator3, PointDiscriminator4, PointGenerator,
    )
    from pdgn_tpu.train import TrainConfig, init_state, make_train_step

    sizes = (32, 64, 128, 256)
    batch = 4
    gen = PointGenerator(num_point=sizes[-1], num_k=20, base_points=16,
                         dtype="bfloat16")
    discs = (PointDiscriminator1(), PointDiscriminator2(),
             PointDiscriminator3(), PointDiscriminator4())
    cfg = TrainConfig()
    state = init_state(gen, discs, cfg, jax.random.PRNGKey(0), batch,
                       num_points=sizes)
    rng = np.random.RandomState(0)
    reals = tuple(jnp.asarray(rng.randn(batch, n, 3).astype(np.float32))
                  for n in sizes)
    step = jax.jit(make_train_step(gen, discs, cfg))
    state, m = step(state, reals, jax.random.PRNGKey(1))
    state, m = step(state, reals, jax.random.PRNGKey(2))
    for k, v in m.items():
        assert np.isfinite(float(v)), (k, v)
    # params stay fp32
    assert state.g.params["fc1"]["dense"]["kernel"].dtype == jnp.float32


def test_batched_sampler_matches_single(setup):
    """sample_many(keys) == [sample(key) for key in keys] (finest clouds)."""
    from pdgn_tpu.train import make_batched_sampler, make_sampler

    state, _, _ = setup
    gen = PointGenerator(num_point=SIZES[-1], num_k=20, base_points=BASE)
    cfg = TrainConfig()
    sample = jax.jit(make_sampler(gen, cfg), static_argnames=("batch_size",))
    many = jax.jit(make_batched_sampler(gen, cfg),
                   static_argnames=("batch_size",))
    keys = jax.random.split(jax.random.PRNGKey(7), 3)
    stacked = many(state.g.params, state.g.batch_stats, keys, BATCH)
    assert stacked.shape == (3, BATCH, SIZES[-1], 3)
    for i, k in enumerate(keys):
        single = sample(state.g.params, state.g.batch_stats, k, BATCH)[3]
        # scan vs standalone are separately compiled programs: BN stats
        # chains amplify reduction-order differences to ~1e-5 abs
        np.testing.assert_allclose(stacked[i], single, rtol=2e-3, atol=1e-5)


def test_flat_adam_refuses_mixed_dtype_updates(monkeypatch):
    """The bundles are keyed on the UPDATE dtype and reused for the
    moments (param dtype): a mismatch must raise, not silently promote
    the stored mu/nu away from optax.adam's per-tensor schema."""
    import pytest

    from pdgn_tpu.train.train_step import make_optimizer

    monkeypatch.setenv("PDGN_FLAT_ADAM", "1")
    opt = make_optimizer(TrainConfig())
    params = {"w": jnp.zeros((4, 4), jnp.bfloat16)}
    state = opt.init(params)  # moments follow the param dtype (bf16)
    grads = {"w": jnp.ones((4, 4), jnp.float32)}  # upstream-promoted
    with pytest.raises(TypeError, match="moment dtype"):
        opt.update(grads, state, params)


def test_flat_adam_bit_equals_plain_optax(monkeypatch):
    """PDGN_FLAT_ADAM=1 runs Adam's math on flattened per-dtype bundles
    (kept as a measured opt-in negative result — in-step it loses to
    donated-buffer aliasing, PERF.md round 5). The elementwise math must
    be BIT-identical to plain optax.adam, and the stored state must keep
    the per-tensor chain(scale_by_adam, scale) schema that checkpoints
    and the torch converter pin."""
    import numpy as np
    import optax

    from pdgn_tpu.train.train_step import make_optimizer

    monkeypatch.setenv("PDGN_FLAT_ADAM", "1")
    cfg = TrainConfig()
    flat_opt = make_optimizer(cfg)
    plain_opt = optax.adam(cfg.learning_rate, b1=cfg.beta1, b2=cfg.beta2)

    rng = np.random.RandomState(0)
    params = {
        "dense": {"kernel": jnp.asarray(rng.randn(17, 33), jnp.float32),
                  "bias": jnp.asarray(rng.randn(33), jnp.float32)},
        "bn": {"scale": jnp.asarray(rng.rand(5), jnp.float32),
               # a second dtype exercises the per-dtype bundling
               "half": jnp.asarray(rng.randn(9, 4), jnp.bfloat16)},
    }
    s_flat = flat_opt.init(params)
    s_plain = plain_opt.init(params)
    # identical state schema (per-tensor mu/nu trees, shared count)
    assert isinstance(s_flat[0], optax.ScaleByAdamState)
    assert (jax.tree_util.tree_structure(s_flat[0].mu)
            == jax.tree_util.tree_structure(params))

    p_flat, p_plain = params, params
    for i in range(3):
        grads = jax.tree.map(
            lambda p: (jnp.asarray(
                rng.randn(*p.shape), jnp.float32) * 0.1).astype(p.dtype),
            params)
        u_flat, s_flat = jax.jit(flat_opt.update)(grads, s_flat, p_flat)
        u_plain, s_plain = jax.jit(plain_opt.update)(grads, s_plain, p_plain)
        p_flat = optax.apply_updates(p_flat, u_flat)
        p_plain = optax.apply_updates(p_plain, u_plain)
        for a, b in zip(jax.tree_util.tree_leaves(p_flat),
                        jax.tree_util.tree_leaves(p_plain)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(s_flat),
                        jax.tree_util.tree_leaves(s_plain)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
