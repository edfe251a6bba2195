"""Benchmark: generated 2048-pt clouds/sec/chip (primary driver metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.
``vs_baseline`` is value / 5000 (the BASELINE.md target of >=5k clouds/s/chip
on v5e; the reference publishes no throughput numbers).

Extras: MFU of the sampling path (achieved model FLOP/s over the chip's
bf16 peak), GAN train step/s at the reference batch 35 with its XLA FLOP
count and MFU, and a small-scale eval pairwise throughput probe (pairs/s
of 2048-pt CD+EMD), from which the full chair-eval wall-clock is
estimated (~3 x 662^2 pairs).

Flap-proofing (round-4 verdict #1): the TPU tunnel in this environment
can die such that *any* device op hangs forever (an exception is the
good case). Every measurement therefore runs in a child subprocess with
a hard timeout, after an up-front probe that executes a real computation
(an import-only probe lies: the backend registers fine while dead). On
unrecoverable backend failure this script still prints the structured
JSON line (value 0.0 + an "error" field) and exits 0 — the perf record
degrades to a parseable error instead of a traceback.

Run a single measurement in-process with ``python bench.py --child
{probe,sampling,train,eval}`` (prints a one-line JSON child record).
"""

import json
import os
import subprocess
import sys
import time

# single-chip peak used for MFU reporting (TPU v5e bf16).
CHIP_PEAK_FLOPS = 197e12
# generator forward model-FLOP constant, measured from the kernel op
# counts (PERF.md "Sampling roofline"): ~34 GF per generated cloud.
MODEL_GF_PER_SAMPLE = 34.0
TARGET_CLOUDS_PER_SEC = 5000.0


def _child_setup():
    """Per-child jax configuration (children only — the parent never
    imports jax, so a dead backend cannot hang the orchestrator)."""
    import jax

    # persistent compilation cache: model-sized programs take minutes to
    # compile; cache them across runs
    jax.config.update("jax_compilation_cache_dir", "/tmp/pdgn_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def child_probe() -> dict:
    """A real computation through the backend — the only trustworthy
    liveness check (import/device enumeration succeed on a dead relay)."""
    jax = _child_setup()
    import jax.numpy as jnp

    t0 = time.perf_counter()
    x = jnp.ones((256, 256))
    val = float(jnp.sum(x @ x))
    return {
        "ok": val == 256.0 * 256 * 256,
        "value": val,
        "extras": {
            "device": str(jax.devices()[0]),
            "probe_s": round(time.perf_counter() - t0, 2),
        },
    }


def _smoke() -> bool:
    """PDGN_BENCH_SMOKE=1 shrinks every measurement to CPU-testable
    size — validates the orchestration end-to-end, not performance."""
    return os.environ.get("PDGN_BENCH_SMOKE", "") not in ("", "0")


def child_sampling(batch: int = 128, iters: int = 30) -> dict:
    """bf16 compute path (fp32 params, BN statistics and coordinate
    heads) — the production sampling configuration, through the
    bulk-generation API (one dispatch for all ``iters`` batches;
    pdgn_tpu.train.make_batched_sampler)."""
    jax = _child_setup()
    import jax.numpy as jnp

    from pdgn_tpu.models import PointGenerator
    from pdgn_tpu.train import TrainConfig, make_batched_sampler

    if _smoke():
        batch, iters = 4, 2
        model = PointGenerator(num_point=256, dtype="bfloat16",
                               base_points=16)
    else:
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
    clouds_per_sec = batch / dt
    return {
        "ok": True,
        "value": round(clouds_per_sec, 1),
        "extras": {
            "mfu_sampling": round(
                clouds_per_sec * MODEL_GF_PER_SAMPLE * 1e9 / CHIP_PEAK_FLOPS,
                4),
            "device": str(jax.devices()[0]),
        },
    }


def child_train(batch: int = 35, iters: int = 10,
                gen_dtype: str = None) -> dict:
    """GAN step throughput. ``gen_dtype='bfloat16'`` measures the
    validated fast configuration (G-only mixed precision — quality
    inside the fp32 seed band, PERF.md; discriminators stay fp32, the
    bf16-D variant is measured-collapsing)."""
    jax = _child_setup()
    import jax.numpy as jnp
    import numpy as np

    from pdgn_tpu.models import (
        PointDiscriminator1, PointDiscriminator2,
        PointDiscriminator3, PointDiscriminator4, PointGenerator,
    )
    from pdgn_tpu.train import TrainConfig, init_state, make_train_step

    sizes = (256, 512, 1024, 2048)
    if _smoke():
        batch, iters, sizes = 2, 1, (32, 64, 128, 256)
        gen = PointGenerator(num_point=256, base_points=16,
                             dtype=gen_dtype)
    else:
        gen = PointGenerator(dtype=gen_dtype)
    discs = (PointDiscriminator1(), PointDiscriminator2(),
             PointDiscriminator3(), PointDiscriminator4())
    cfg = TrainConfig()
    state = init_state(gen, discs, cfg, jax.random.PRNGKey(0), batch,
                       num_points=sizes)
    step = jax.jit(make_train_step(gen, discs, cfg), donate_argnums=(0,))
    rng = np.random.RandomState(0)
    reals = tuple(
        jnp.asarray(rng.randn(batch, n, 3).astype(np.float32))
        for n in sizes
    )
    extras = {}
    try:  # XLA's own FLOP count for the whole step (for the MFU figure)
        cost = step.lower(state, reals, jax.random.PRNGKey(0)
                          ).compile().cost_analysis()
        extras["train_step_xla_flops"] = float(cost["flops"])
    except Exception:
        pass
    for i in range(2):  # warm up compile + tunnel
        state, m = step(state, reals, jax.random.PRNGKey(i))
    float(m["g_loss"])  # force completion through the axon relay
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, reals, jax.random.PRNGKey(i))
    float(m["g_loss"])  # state chains serially; fetching the last
    # metric forces the whole chain
    steps_per_sec = iters / (time.perf_counter() - t0)
    if "train_step_xla_flops" in extras:
        extras["mfu_train"] = round(
            steps_per_sec * extras["train_step_xla_flops"] / CHIP_PEAK_FLOPS,
            4)
    return {"ok": True, "value": round(steps_per_sec, 3), "extras": extras}


def child_eval(tile: int = 64, reps: int = 4) -> dict:
    """CD+EMD pair throughput on 2048-pt clouds (pairs/sec).

    Uses the same implementation pairwise_cd_emd would select in
    production (the fused 'xla' path on TPU).
    """
    _child_setup()
    import jax.numpy as jnp
    import numpy as np

    from pdgn_tpu.eval.metrics import _pair_tile, _select_impl

    if _smoke():
        tile, reps = 2, 1
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
    return {"ok": True, "value": round(tile * tile / dt, 1), "extras": {}}


_CHILDREN = {
    "probe": child_probe,
    "sampling": child_sampling,
    "train": child_train,
    "train_bf16": lambda: child_train(gen_dtype="bfloat16"),
    "eval": child_eval,
}


def _run_child(name: str, timeout_s: float) -> dict:
    """Run one measurement in a subprocess with a hard timeout.

    Returns the child's JSON record, or {"ok": False, "error", "hung"}.
    A hang (timeout) is distinguished from a crash: a hung tunnel makes
    retries pointless while a crash may be a transient flap.
    """
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", name],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            timeout=timeout_s, cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        return {"ok": False, "hung": True,
                "error": f"{name}: no result in {timeout_s:.0f}s "
                         "(backend hang)"}
    elapsed = time.perf_counter() - t0
    for line in reversed(proc.stdout.decode(errors="replace").splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                rec = json.loads(line)
                rec.setdefault("ok", False)
                rec["elapsed_s"] = round(elapsed, 1)
                return rec
            except json.JSONDecodeError:
                break
    tail = proc.stderr.decode(errors="replace").strip().splitlines()[-3:]
    return {"ok": False, "hung": False,
            "error": f"{name}: rc={proc.returncode}: " + " | ".join(tail)}


def _probe() -> dict:
    """Probe until the backend answers a real computation (bounded).

    PDGN_BENCH_PROBE_ATTEMPTS / PDGN_BENCH_PROBE_TIMEOUT_S /
    PDGN_BENCH_BACKOFF_S override the retry policy (test hooks).
    """
    attempts = int(os.environ.get("PDGN_BENCH_PROBE_ATTEMPTS", "3"))
    t_first = float(os.environ.get("PDGN_BENCH_PROBE_TIMEOUT_S", "300"))
    backoff = float(os.environ.get("PDGN_BENCH_BACKOFF_S", "20"))
    rec = {"ok": False, "error": "probe never ran"}
    for i in range(attempts):
        # first attempt is generous (covers a cold compile through the
        # relay); a hang burns its full budget, so later ones are shorter
        rec = _run_child("probe", t_first if i == 0 else t_first / 2)
        if rec.get("ok"):
            return rec
        if i + 1 < attempts:
            time.sleep(backoff)
    return rec


def _emit(value: float, extras: dict, error: str = None) -> None:
    record = {
        "metric": "generated 2048-pt clouds/sec/chip",
        "value": value,
        "unit": "clouds/s",
        "vs_baseline": round(value / TARGET_CLOUDS_PER_SEC, 3),
        "extras": extras,
    }
    if error:
        record["error"] = error
    print(json.dumps(record))


def main() -> int:
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        fn = _CHILDREN[sys.argv[2]]
        try:
            print(json.dumps(fn()))
        except Exception as e:  # a crash is a parseable child record too
            print(json.dumps({"ok": False,
                              "error": f"{type(e).__name__}: {e}"}))
        return 0

    t_start = time.time()
    extras = {}
    probe = _probe()
    if not probe.get("ok"):
        extras["bench_wall_s"] = round(time.time() - t_start, 1)
        # not a measurement from this run: the last full live-bench
        # figures (PERF.md "Live bench record", captured 2026-08-18),
        # embedded so a dead-tunnel record still carries the last known
        # performance
        extras["last_live_clouds_per_sec"] = 4303.9
        extras["last_live_gan_steps_per_sec_b35"] = 13.049
        _emit(0.0, extras,
              "TPU backend unavailable: " + probe.get("error", "probe "
              "failed") + " (last live-bench numbers are in PERF.md)")
        return 0
    extras["device"] = probe.get("extras", {}).get("device", "?")

    samp = _run_child("sampling", 2100.0)
    if not samp.get("ok") and not samp.get("hung"):
        samp = _run_child("sampling", 2100.0)  # crash = flap: retry once
    for name, key, timeout_s in (
            ("train", "gan_steps_per_sec_b35", 2400.0),
            ("train_bf16", "gan_steps_per_sec_b35_bf16g", 2400.0),
            ("eval", "eval_cd_emd_pairs_per_sec", 900.0)):
        rec = _run_child(name, timeout_s)
        if rec.get("ok"):
            extras[key] = rec["value"]
            sub = dict(rec.get("extras", {}))
            if name == "train_bf16":  # don't clobber the fp32 figures
                sub = {f"{k}_bf16g": v for k, v in sub.items()}
            extras.update(sub)
        else:
            extras[key] = "error: " + rec.get("error", "?")
    if isinstance(extras.get("eval_cd_emd_pairs_per_sec"), (int, float)):
        # full chair eval: 3 pairwise matrices of ~662^2 pairs
        extras["est_full_chair_eval_minutes"] = round(
            3 * 662 * 662 / extras["eval_cd_emd_pairs_per_sec"] / 60, 2)
    extras["bench_wall_s"] = round(time.time() - t_start, 1)

    if samp.get("ok"):
        extras.update(samp.get("extras", {}))
        _emit(samp["value"], extras)
    else:
        _emit(0.0, extras, "sampling benchmark failed after probe OK: "
              + samp.get("error", "?"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
