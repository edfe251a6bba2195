"""Benchmark: generated 2048-pt clouds/sec/chip (primary driver metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.
``vs_baseline`` is value / 5000 (the BASELINE.md target of >=5k clouds/s/chip
on v5e; the reference publishes no throughput numbers).

Extras: GAN train step/s at the reference batch 35, and a small-scale eval
pairwise throughput probe (pairs/s of 2048-pt CD+EMD), from which the full
chair-eval wall-clock is estimated (~3 x 662^2 pairs).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: model-sized programs take minutes to
# compile; cache them across runs
jax.config.update("jax_compilation_cache_dir", "/tmp/pdgn_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_sampling(batch: int = 128, iters: int = 30) -> float:
    """bf16 compute path (fp32 params, BN statistics and coordinate
    heads) — the production sampling configuration, through the
    bulk-generation API (one dispatch for all ``iters`` batches;
    pdgn_tpu.train.make_batched_sampler)."""
    from pdgn_tpu.models import PointGenerator
    from pdgn_tpu.train import TrainConfig, make_batched_sampler

    model = PointGenerator(dtype="bfloat16")
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((batch, 128)))
    many = jax.jit(make_batched_sampler(model, TrainConfig()),
                   static_argnames=("batch_size",))
    keys = jax.random.split(jax.random.PRNGKey(0), iters)

    def run():
        out = many(variables["params"], variables["batch_stats"], keys,
                   batch_size=batch)
        return jnp.sum(out[-1])

    # warm-up; float() forces completion (the axon relay's
    # block_until_ready returns at dispatch, not completion)
    float(run())
    float(run())
    t0 = time.perf_counter()
    acc = run()
    float(acc)
    dt = (time.perf_counter() - t0) / iters
    return batch / dt


def bench_train_step(batch: int = 35, iters: int = 10) -> float:
    from pdgn_tpu.models import (
        PointDiscriminator1, PointDiscriminator2,
        PointDiscriminator3, PointDiscriminator4, PointGenerator,
    )
    from pdgn_tpu.train import TrainConfig, init_state, make_train_step

    gen = PointGenerator()
    discs = (PointDiscriminator1(), PointDiscriminator2(),
             PointDiscriminator3(), PointDiscriminator4())
    cfg = TrainConfig()
    state = init_state(gen, discs, cfg, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_train_step(gen, discs, cfg), donate_argnums=(0,))
    rng = np.random.RandomState(0)
    reals = tuple(
        jnp.asarray(rng.randn(batch, n, 3).astype(np.float32))
        for n in (256, 512, 1024, 2048)
    )
    for i in range(2):  # warm up compile + tunnel
        state, m = step(state, reals, jax.random.PRNGKey(i))
    float(m["g_loss"])  # force completion through the axon relay
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, reals, jax.random.PRNGKey(i))
    float(m["g_loss"])  # state chains serially; fetching the last
    # metric forces the whole chain
    return iters / (time.perf_counter() - t0)


def bench_eval_pairs(tile: int = 64, reps: int = 4) -> float:
    """CD+EMD pair throughput on 2048-pt clouds (pairs/sec).

    Uses the same implementation pairwise_cd_emd would select in
    production (the fused 'xla' path on TPU).
    """
    from pdgn_tpu.eval.metrics import _pair_tile, _select_impl

    rng = np.random.RandomState(0)
    s = jnp.asarray(rng.randn(tile, 2048, 3).astype(np.float32) * 0.3)
    r = jnp.asarray(rng.randn(tile, 2048, 3).astype(np.float32) * 0.3)
    impl = _select_impl(2048, 2048, True)
    acc = jnp.zeros((), jnp.float32)
    out = _pair_tile(s, r, True, impl)
    acc = acc + jnp.sum(out[0]) + jnp.sum(out[1])
    float(acc)
    acc = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = _pair_tile(s, r, True, impl)
        acc = acc + jnp.sum(out[0]) + jnp.sum(out[1])
    float(acc)
    dt = (time.perf_counter() - t0) / reps
    return tile * tile / dt


def main():
    t_start = time.time()
    clouds_per_sec = bench_sampling()
    extras = {}
    try:
        extras["gan_steps_per_sec_b35"] = round(bench_train_step(), 3)
    except Exception as e:  # keep the primary metric robust
        extras["gan_steps_per_sec_b35"] = f"error: {e}"
    try:
        pairs = bench_eval_pairs()
        extras["eval_cd_emd_pairs_per_sec"] = round(pairs, 1)
        # full chair eval: 3 pairwise matrices of ~662^2 pairs
        extras["est_full_chair_eval_minutes"] = round(
            3 * 662 * 662 / pairs / 60, 2)
    except Exception as e:
        extras["eval_cd_emd_pairs_per_sec"] = f"error: {e}"
    extras["bench_wall_s"] = round(time.time() - t_start, 1)
    extras["device"] = str(jax.devices()[0])

    print(json.dumps({
        "metric": "generated 2048-pt clouds/sec/chip",
        "value": round(clouds_per_sec, 1),
        "unit": "clouds/s",
        "vs_baseline": round(clouds_per_sec / 5000.0, 3),
        "extras": extras,
    }))


if __name__ == "__main__":
    sys.exit(main())
