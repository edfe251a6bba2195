"""The jitted GAN train step: 4 discriminator updates + 1 generator update.

TPU-native re-architecture of the reference per-batch loop
(models/PDGNet_v2.py:157-256). The reference issues 9 network forwards and
5 backwards as separate CUDA launches with host round-trips between them;
here the whole step — noise sampling, generator forwards, all four
discriminator updates, the 6-pair shape-preserving loss and the generator
update — is one XLA program. Data parallelism comes from sharding the
batch axis of the inputs over a mesh (see pdgn_tpu.parallel.mesh); no
explicit collectives are needed.

Semantics preserved from the reference:

* D_i sees real and detached-fake in *separate* forwards (two BN batches,
  in that order) — models/PDGNet_v2.py:185-186;
* the generator runs twice per step with *fresh* noise for the G update
  (:178 and :228), both forwards updating its BN running stats;
* the G update flows through the discriminators *after* their parameter
  update, using the fakes' own batch statistics;
* training noise is N(0, 0.2^2) (:178); losses/weights per §3.1.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, Callable, Dict, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from pdgn_tpu.losses.gan import g_adv_loss, mse_loss
from pdgn_tpu.losses.shape_preserving import shape_preserving_terms
from pdgn_tpu.models.layers import batch_mask


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Loss weights / hyperparameters (v2 defaults).

    v1 (reference models/PDGNet.py:262-265): ``cov_weight=5.0``,
    ``similar_weight=0.5``. v2 (models/PDGNet_v2.py:250-253):
    ``cov_weight=1.0``, ``similar_weight=0.1``.
    """

    learning_rate: float = 1e-4
    beta1: float = 0.5
    beta2: float = 0.999
    noise_dim: int = 128
    noise_sigma: float = 0.2
    adv_weights: Tuple[float, float, float, float] = (1.2, 1.2, 1.2, 1.0)
    mu_weight: float = 1.0
    cov_weight: float = 1.0
    similar_weight: float = 0.1
    shape_nsample: int = 20

    @classmethod
    def v1(cls, **kw) -> "TrainConfig":
        kw.setdefault("cov_weight", 5.0)
        kw.setdefault("similar_weight", 0.5)
        return cls(**kw)


class NetState(flax.struct.PyTreeNode):
    """Parameters + BN statistics + optimizer state for one network."""

    params: Any
    batch_stats: Any
    opt_state: Any


class GANState(flax.struct.PyTreeNode):
    """Full training state: generator + 4 discriminators + step counter."""

    g: NetState
    d: Tuple[NetState, ...]
    step: jnp.ndarray


# 1-D offset alignment for the flat-Adam bundles: fp32/bf16 arrays tile
# as (8, 128) on TPU, so a slice/concat at a non-multiple-of-1024 offset
# pays a lane/sublane relayout per leaf (measured: unaligned bundling is
# 1.8x SLOWER than per-tensor adam; aligned bundling is the win).
_ALIGN = 1024


def _flatten_like(treedef, shapes, spans, tree):
    """Concatenate a tree's leaves into one 1-D array per dtype group,
    zero-padding each leaf to the alignment boundary."""
    leaves = treedef.flatten_up_to(tree)
    groups = {}
    for leaf, (dt, lo, hi, padded) in zip(leaves, spans):
        flat = jnp.ravel(leaf)
        if padded != flat.size:
            flat = jnp.pad(flat, (0, padded - flat.size))
        groups.setdefault(dt, []).append(flat)
    return {dt: jnp.concatenate(parts) if len(parts) > 1 else parts[0]
            for dt, parts in groups.items()}


def _unflatten_like(treedef, shapes, spans, flat):
    """Inverse of :func:`_flatten_like` (drops the alignment padding)."""
    leaves = []
    for shape, (dt, lo, hi, _) in zip(shapes, spans):
        leaves.append(jax.lax.slice(flat[dt], (lo,), (hi,)).reshape(shape))
    return treedef.unflatten(leaves)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam(lr, betas=(0.5, 0.999)) — reference models/PDGNet_v2.py:121-125.

    ``PDGN_FLAT_ADAM=1`` opts into running Adam's *math* on flattened
    per-dtype bundles (bit-identical floats, same stored per-tensor
    state schema). Measured and NOT the default (PERF.md round 5): the
    per-tensor form costs ~10.6 ms/step across ~4,200 tiny ops, and
    bundling wins standalone once the spans are tile-aligned (11.2 vs
    13.4 ms wall) — but IN-STEP it loses (13.86 -> 12.26 steps/s even
    aligned) because the bundles defeat XLA's donated-buffer aliasing
    of the moment arrays and add a full materialise/split round trip.
    Kept behind the flag as the measured negative result.
    """
    if os.environ.get("PDGN_FLAT_ADAM", "") in ("", "0"):
        return optax.adam(cfg.learning_rate, b1=cfg.beta1, b2=cfg.beta2)
    inner = optax.adam(cfg.learning_rate, b1=cfg.beta1, b2=cfg.beta2)

    def init(params):
        return inner.init(params)

    def update(updates, state, params=None):
        del params  # adam's update is parameter-independent
        adam_state, tail = state[0], state[1:]
        leaves, treedef = jax.tree_util.tree_flatten(updates)
        # spans are keyed on the UPDATE leaf dtype and reused for mu/nu
        # (whose dtype follows the params): a mismatch would make
        # jnp.concatenate silently promote the stored moments, drifting
        # the opt_state schema from optax.adam's — refuse loudly instead
        for u, m in zip(leaves, treedef.flatten_up_to(adam_state.mu)):
            if jnp.result_type(u) != jnp.result_type(m):
                raise TypeError(
                    "PDGN_FLAT_ADAM needs every update leaf dtype to "
                    f"match its Adam moment dtype (got {jnp.result_type(u)}"
                    f" update vs {jnp.result_type(m)} moment); use the "
                    "default per-tensor adam for mixed-dtype updates")
        shapes = [l.shape for l in leaves]
        offsets = {}
        spans = []
        for leaf in leaves:
            dt = str(jnp.result_type(leaf))  # str: stable pytree dict key
            lo = offsets.get(dt, 0)
            padded = -(-leaf.size // _ALIGN) * _ALIGN
            offsets[dt] = lo + padded
            spans.append((dt, lo, lo + leaf.size, padded))
        args = (treedef, shapes, spans)

        flat_state = (
            optax.ScaleByAdamState(
                count=adam_state.count,
                mu=_flatten_like(*args, adam_state.mu),
                nu=_flatten_like(*args, adam_state.nu),
            ),
        ) + tail
        flat_updates, flat_new = inner.update(
            _flatten_like(*args, updates), flat_state)
        new_adam = flat_new[0]
        new_state = (
            optax.ScaleByAdamState(
                count=new_adam.count,
                mu=_unflatten_like(*args, new_adam.mu),
                nu=_unflatten_like(*args, new_adam.nu),
            ),
        ) + tuple(flat_new[1:])
        return _unflatten_like(*args, flat_updates), new_state

    return optax.GradientTransformation(init, update)


def init_state(
    generator,
    discriminators: Sequence[Any],
    cfg: TrainConfig,
    rng: jax.Array,
    batch_size: int,
    num_points: Sequence[int] = (256, 512, 1024, 2048),
) -> GANState:
    """Initialise all parameters and optimizer states.

    The whole initialisation runs as ONE jitted program: parameter and
    batch-stat shapes are batch-independent, so the dummy inputs trace at
    batch 1 regardless of ``batch_size`` (one compile, persistently
    cacheable) and XLA dead-code-eliminates the forward compute whose
    outputs feed no parameter. Unjitted flax ``init`` dispatches every
    initialiser op eagerly — measured 515 s through the axon TPU relay
    at the reference training scale vs seconds jitted.
    """
    del batch_size  # shapes below are batch-independent; trace at B=1
    opt = make_optimizer(cfg)

    def _init(rng):
        g_rng, *d_rngs = jax.random.split(rng, 1 + len(discriminators))
        z = jnp.zeros((1, cfg.noise_dim))
        g_vars = generator.init(g_rng, z)
        g_state = NetState(
            params=g_vars["params"],
            batch_stats=g_vars["batch_stats"],
            opt_state=opt.init(g_vars["params"]),
        )
        d_states = []
        for disc, d_rng, n in zip(discriminators, d_rngs, num_points):
            d_vars = disc.init(d_rng, jnp.zeros((1, n, 3)))
            d_states.append(
                NetState(
                    params=d_vars["params"],
                    batch_stats=d_vars["batch_stats"],
                    opt_state=opt.init(d_vars["params"]),
                )
            )
        return GANState(g=g_state, d=tuple(d_states),
                        step=jnp.zeros((), jnp.int32))

    return jax.jit(_init)(rng)


def make_train_step(
    generator,
    discriminators: Sequence[Any],
    cfg: TrainConfig,
) -> Callable[[GANState, Tuple[jnp.ndarray, ...], jax.Array],
              Tuple[GANState, Dict[str, jnp.ndarray]]]:
    """Build the jitted GAN step.

    Returns ``step(state, reals, rng) -> (state, metrics)`` where ``reals``
    is the 4-tuple of real clouds ``(B, {256,512,1024,2048}, 3)``.
    """
    opt = make_optimizer(cfg)

    def gen_apply(params, stats, z):
        outs, upd = generator.apply(
            {"params": params, "batch_stats": stats}, z,
            mutable=["batch_stats"],
        )
        return outs, upd["batch_stats"]

    def disc_apply(i, params, stats, x):
        outs, upd = discriminators[i].apply(
            {"params": params, "batch_stats": stats}, x,
            mutable=["batch_stats"],
        )
        return outs, upd["batch_stats"]

    # paired clones for the D update: evaluate D(real) and D(fake) in one
    # stacked pass with independent per-half BN statistics — identical math
    # to the reference's sequential D(real); D(fake) (same loss, grads and
    # running-stat updates) at twice the GEMM rows and half the dispatches
    discs_paired = tuple(d.clone(paired=True) for d in discriminators)

    def d_update(i, d_state: NetState, real, fake, mask):
        def loss_fn(params, stats):
            pred, upd = discs_paired[i].apply(
                {"params": params, "batch_stats": stats},
                jnp.stack([real, fake]), mutable=["batch_stats"],
            )
            loss = (
                mse_loss(pred[0], jnp.ones_like(pred[0]), mask)
                + mse_loss(pred[1], jnp.zeros_like(pred[1]), mask)
            ) / 2.0
            return loss, upd["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            d_state.params, d_state.batch_stats
        )
        updates, new_opt = opt.update(grads, d_state.opt_state, d_state.params)
        new_params = optax.apply_updates(d_state.params, updates)
        return NetState(new_params, new_stats, new_opt), loss

    def g_update(g_state: NetState, d_states, z, mask):
        def loss_fn(g_params):
            fakes, g_stats = gen_apply(g_params, g_state.batch_stats, z)

            similar_mu, similar_cov = shape_preserving_terms(
                fakes, nsample=cfg.shape_nsample, mask=mask)
            similar = (cfg.mu_weight * similar_mu
                       + cfg.cov_weight * similar_cov)

            adv = 0.0
            new_d_stats = []
            for i in range(4):
                pred, d_stats_i = disc_apply(
                    i, d_states[i].params, d_states[i].batch_stats, fakes[i]
                )
                adv = adv + cfg.adv_weights[i] * g_adv_loss(pred, mask)
                new_d_stats.append(d_stats_i)

            loss = adv + cfg.similar_weight * similar
            return loss, (g_stats, tuple(new_d_stats), similar)

        (loss, (g_stats, new_d_stats, similar)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(g_state.params)
        updates, new_opt = opt.update(grads, g_state.opt_state, g_state.params)
        new_params = optax.apply_updates(g_state.params, updates)
        new_g = NetState(new_params, g_stats, new_opt)
        new_ds = [
            NetState(d.params, s, d.opt_state)
            for d, s in zip(d_states, new_d_stats)
        ]
        return new_g, new_ds, loss, similar

    def train_step(state: GANState, reals, rng, mask=None):
        B = reals[0].shape[0]
        rng_d, rng_g = jax.random.split(rng)

        with batch_mask(mask):
            # fakes for the D updates (detached, as in the reference)
            noise_d = cfg.noise_sigma * jax.random.normal(
                rng_d, (B, cfg.noise_dim))
            fakes, g_stats = gen_apply(state.g.params, state.g.batch_stats,
                                       noise_d)
            fakes = jax.tree.map(jax.lax.stop_gradient, fakes)
            g_state = NetState(state.g.params, g_stats, state.g.opt_state)

            d_states = []
            d_losses = []
            for i in range(4):
                new_d, loss_i = d_update(i, state.d[i], reals[i], fakes[i],
                                         mask)
                d_states.append(new_d)
                d_losses.append(loss_i)

            # generator update with fresh noise
            noise_g = cfg.noise_sigma * jax.random.normal(
                rng_g, (B, cfg.noise_dim))
            g_state, d_states, g_loss, similar = g_update(
                g_state, d_states, noise_g, mask)

        new_state = GANState(
            g=g_state, d=tuple(d_states), step=state.step + 1
        )
        metrics = {
            "d_loss1": d_losses[0],
            "d_loss2": d_losses[1],
            "d_loss3": d_losses[2],
            "d_loss4": d_losses[3],
            "g_loss": g_loss,
            "similar_loss": similar,
        }
        return new_state, metrics

    return train_step


def make_sampler(generator, cfg: TrainConfig, mesh=None):
    """Test-time sampler: z ~ N(0, 1) (reference :304 — note std 1, not 0.2).

    Uses the *batch statistics* of the sampled batch, matching the
    reference quirk that the generator is never put in eval mode.
    Returns only the finest (2048-pt) cloud plus the full tuple.

    ``mesh``: shard the sample batch over the mesh's data axis —
    embarrassingly-parallel multi-chip generation (params replicated, no
    collectives except the BN batch-statistics reductions XLA inserts,
    which keep stats global exactly like the single-chip trace).
    """

    def sample(params, batch_stats, rng, batch_size: int):
        z = jax.random.normal(rng, (batch_size, cfg.noise_dim))
        if mesh is not None and mesh.devices.size > 1:
            from pdgn_tpu.parallel.mesh import batch_sharding

            z = jax.lax.with_sharding_constraint(z, batch_sharding(mesh))
        outs, _ = generator.apply(
            {"params": params, "batch_stats": batch_stats}, z,
            mutable=["batch_stats"],
        )
        return outs

    return sample


def make_batched_sampler(generator, cfg: TrainConfig, mesh=None):
    """Multi-batch sampler: one dispatch for many sampling batches.

    ``sample_many(params, batch_stats, keys, batch_size)`` scans the
    single-batch sampler over a ``(n,)`` vector of PRNG keys and returns
    the stacked finest clouds ``(n, batch_size, 2048, 3)``. Production
    generation (the test phase's sample loop, bulk serving) issues one
    device program instead of n — per-call host/dispatch latency
    (~2.7 ms/call through the axon relay at B=128) amortises to nothing.
    Each scan step computes the same math as ``make_sampler`` for the
    same key (identical up to compiler reduction-order noise — the scan
    is a separately compiled program). ``mesh`` shards every batch over
    the data axis (see :func:`make_sampler`).
    """
    sample = make_sampler(generator, cfg, mesh=mesh)

    def sample_many(params, batch_stats, keys, batch_size: int):
        def body(_, key):
            outs = sample(params, batch_stats, key, batch_size)
            return _, outs[3]

        _, finest = jax.lax.scan(body, None, keys)
        return finest

    return sample_many
