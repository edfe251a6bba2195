"""Benchmark: generated 2048-pt clouds/sec/chip (primary driver metric).

Prints JSON lines {"metric", "value", "unit", "vs_baseline", "extras"};
the LAST line is the record (earlier lines are the same record emitted
incrementally as each measurement lands, so a truncated run still ends
in a parseable line). ``vs_baseline`` is value / 5000 (the BASELINE.md
target of >=5k clouds/s/chip on v5e; the reference publishes no
throughput numbers).

Extras: MFU of the sampling path (achieved model FLOP/s over the chip's
bf16 peak), GAN train step/s at the reference batch 35 with its XLA FLOP
count and MFU, and a small-scale eval pairwise throughput probe (pairs/s
of 2048-pt CD+EMD), from which the full chair-eval wall-clock is
estimated (~3 x 662^2 pairs).

Orchestration (round-5 verdict #1): the driver runs this under a hard
timeout (~600 s; the rounds that produced records ran 434-460 s), and
the round-4 layout — five subprocesses, each paying jax import + tunnel
init + compile, JSON only at the very end — took ~20 min and timed out
with an EMPTY tail. Now:

- ONE measurement child runs every measurement in-process (backend init
  and the compilation cache are paid once) and prints a flushed JSON
  record per measurement;
- the parent never imports jax (a dead backend cannot hang it), reads
  the child's records against a global deadline
  (``PDGN_BENCH_BUDGET_S``, default 560 s) plus per-measurement hang
  caps, and EMITS THE PRIMARY RECORD AS SOON AS SAMPLING LANDS — later
  measurements re-emit an enriched record, every print flushed, so a
  driver timeout at ANY point still leaves a parseable last line;
- the train measurement runs LAST: its first execution pays a
  measured 330-390 s device-side load of the 41 MB step executable
  (PERF.md round-5), which fits the budget only warm-cache — an
  overrun costs only the train figures, never the record;
- measurements that don't fit the remaining budget are skipped with a
  note, never silently;
- the bf16-G train measurement is off by default (``PDGN_BENCH_BF16=1``
  opts in) — it duplicates the fp32 compile for a secondary figure.

The axon tunnel can also die such that *any* device op hangs forever
(an exception is the good case), so the first child measurement is a
real-computation probe (an import-only probe lies: the backend
registers fine while dead). A hang before the probe answers is retried
(``PDGN_BENCH_PROBE_ATTEMPTS``); a hang after it finalizes with what
has been measured. On unrecoverable backend failure the script still
prints the structured JSON line (value 0.0 + an "error" field) quoting
the last LIVE figures from ``measurements/bench_live.json`` (written by
every successful non-smoke run — never hardcoded), and exits 0.

Run measurements in-process with ``python bench.py --child
probe,sampling,...`` (or a single name), one JSON line each.
"""

import json
import os
import queue
import subprocess
import sys
import threading
import time

# single-chip peak used for MFU reporting (TPU v5e bf16).
CHIP_PEAK_FLOPS = 197e12
# generator forward model-FLOP constant, measured from the kernel op
# counts (PERF.md "Sampling roofline"): ~34 GF per generated cloud.
MODEL_GF_PER_SAMPLE = 34.0
TARGET_CLOUDS_PER_SEC = 5000.0
LIVE_RECORD_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "measurements",
    "bench_live.json")


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
    # compile once via lower().compile() and call the compiled object —
    # this both yields XLA's own FLOP count (for MFU) and avoids a
    # second trace/compile through jit's cache
    compiled = None
    try:
        compiled = step.lower(state, reals, jax.random.PRNGKey(0)).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):  # older jax returns [dict]
            cost = cost[0]
        extras["train_step_xla_flops"] = float(cost["flops"])
    except Exception:
        pass
    run = compiled if compiled is not None else step
    for i in range(2):  # warm up compile + tunnel
        state, m = run(state, reals, jax.random.PRNGKey(i))
    float(m["g_loss"])  # force completion through the axon relay
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = run(state, reals, jax.random.PRNGKey(i))
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

# hang caps per measurement (seconds since the previous record): long
# enough for a cold compile through the relay, short enough that a hung
# tunnel doesn't eat the whole budget. The global deadline also applies.
# The train caps cover the measured 330-390 s FIRST-EXECUTION load of
# the 41 MB step executable (PERF.md round-5: ~9 s/MB through the
# relay; per-process unless the server-side program cache is warm) —
# train runs LAST so an overrun can only cost the train figures.
_HANG_CAPS = {"probe": 240.0, "sampling": 300.0, "train": 460.0,
              "train_bf16": 460.0, "eval": 200.0}


def _run_children(names) -> int:
    """``--child a,b,c``: run measurements in-process, one flushed JSON
    record line each. Exit code is always 0 (a crash is a record)."""
    for name in names:
        # orchestration-test fault injection (tests/test_bench.py):
        # hang or crash the child right before the named measurement
        if os.environ.get("PDGN_BENCH_FAKE_HANG") == name:
            time.sleep(86400)
        if os.environ.get("PDGN_BENCH_FAKE_CRASH") == name:
            os._exit(17)
        if os.environ.get("PDGN_BENCH_FAKE_FAIL") == name:
            print(json.dumps({"ok": False, "error": "injected failure",
                              "name": name, "elapsed_s": 0.0}), flush=True)
            continue
        t0 = time.perf_counter()
        try:
            rec = _CHILDREN[name]()
            rec.setdefault("ok", True)
        except Exception as e:  # a crash is a parseable child record too
            rec = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        rec["name"] = name
        rec["elapsed_s"] = round(time.perf_counter() - t0, 1)
        print(json.dumps(rec), flush=True)
    return 0


class _ChildStream:
    """One measurement child; records arrive on a queue with timeouts.

    stdout and stderr are pumped by daemon threads so the child can
    never block on a full pipe; stderr keeps a tail for diagnostics.
    """

    def __init__(self, names):
        self.proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child",
             ",".join(names)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        self._q = queue.Queue()
        self.stderr_tail = []
        threading.Thread(target=self._pump_out, daemon=True).start()
        threading.Thread(target=self._pump_err, daemon=True).start()

    def _pump_out(self):
        for raw in self.proc.stdout:
            line = raw.decode(errors="replace").strip()
            if line.startswith("{"):
                try:
                    self._q.put(json.loads(line))
                except json.JSONDecodeError:
                    pass
        self._q.put(None)  # EOF

    def _pump_err(self):
        for raw in self.proc.stderr:
            self.stderr_tail.append(raw.decode(errors="replace").rstrip())
            del self.stderr_tail[:-30]

    def next_record(self, timeout_s: float):
        """The next child record, or 'eof', or 'hang' (timeout)."""
        try:
            rec = self._q.get(timeout=max(timeout_s, 0.01))
        except queue.Empty:
            return "hang"
        return "eof" if rec is None else rec

    def kill(self):
        if self.proc.poll() is None:
            self.proc.kill()
        try:
            self.proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            pass


def _emit(value: float, extras: dict, error: str = None) -> dict:
    record = {
        "metric": "generated 2048-pt clouds/sec/chip",
        "value": value,
        "unit": "clouds/s",
        "vs_baseline": round(value / TARGET_CLOUDS_PER_SEC, 3),
        "extras": extras,
    }
    if error:
        record["error"] = error
    print(json.dumps(record), flush=True)
    return record


def _read_last_live() -> dict:
    """Last successful live-bench figures (checked-in, updated by every
    successful non-smoke run — VERDICT r4 #6: never hardcoded)."""
    try:
        with open(LIVE_RECORD_PATH) as f:
            return json.load(f)
    except Exception:
        return {}


def _write_last_live(record: dict) -> None:
    try:
        os.makedirs(os.path.dirname(LIVE_RECORD_PATH), exist_ok=True)
        with open(LIVE_RECORD_PATH, "w") as f:
            json.dump({"captured_unix": round(time.time(), 1),
                       "record": record}, f, indent=1)
            f.write("\n")
    except OSError:
        pass  # read-only checkout: the printed record is the evidence


def _fallback_error_record(extras: dict, error: str) -> None:
    last = _read_last_live()
    if last:
        extras["last_live"] = last  # not measurements from this run
    _emit(0.0, extras, error + " (last live figures: measurements/"
          "bench_live.json, echoed in extras.last_live)")


_SECONDARY_KEYS = {
    "train": "gan_steps_per_sec_b35",
    "train_bf16": "gan_steps_per_sec_b35_bf16g",
    "eval": "eval_cd_emd_pairs_per_sec",
}


def main() -> int:
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        return _run_children(sys.argv[2].split(","))

    t_start = time.time()
    budget = float(os.environ.get("PDGN_BENCH_BUDGET_S", "560"))
    probe_attempts = int(os.environ.get("PDGN_BENCH_PROBE_ATTEMPTS", "3"))
    probe_cap = float(os.environ.get("PDGN_BENCH_PROBE_TIMEOUT_S",
                                     str(_HANG_CAPS["probe"])))
    backoff = float(os.environ.get("PDGN_BENCH_BACKOFF_S", "20"))
    deadline = t_start + budget

    # cheap-first order: eval (~1 min warm) lands before train, so a
    # train overrun (the big compile) can only cost the train figures
    plan = ["probe", "sampling", "eval", "train"]
    if os.environ.get("PDGN_BENCH_BF16", "") not in ("", "0"):
        plan.append("train_bf16")

    extras = {}
    results = {}
    fail_reason = None
    launches_left = probe_attempts  # relaunch budget (probe retries and
    # one flap retry share it; a post-probe HANG never relaunches —
    # a hung tunnel makes retries pointless)

    def remaining():
        return deadline - time.time()

    def note_skip(names, why):
        for n in names:
            if n != "probe" and n not in results:
                extras[_SECONDARY_KEYS.get(n, n)] = "skipped: " + why

    def absorb(name, rec):
        results[name] = rec
        if name == "probe":
            extras["device"] = rec.get("extras", {}).get("device", "?")
            return
        if name == "sampling":
            if rec.get("ok"):
                extras.update(rec.get("extras", {}))
            return
        if rec.get("ok"):
            extras[_SECONDARY_KEYS[name]] = rec["value"]
            sub = dict(rec.get("extras", {}))
            if name == "train_bf16":  # don't clobber the fp32 figures
                sub = {f"{k}_bf16g": v for k, v in sub.items()}
            extras.update(sub)
        else:
            extras[_SECONDARY_KEYS[name]] = (
                "error: " + rec.get("error", "?"))

    def emit_progress():
        """Re-emit the (enriched) record after every landed measurement
        so any truncation point leaves a parseable last line."""
        if "eval_cd_emd_pairs_per_sec" in extras and isinstance(
                extras["eval_cd_emd_pairs_per_sec"], (int, float)):
            # full chair eval: 3 pairwise matrices of ~662^2 pairs
            extras["est_full_chair_eval_minutes"] = round(
                3 * 662 * 662 / extras["eval_cd_emd_pairs_per_sec"] / 60, 2)
        extras["bench_wall_s"] = round(time.time() - t_start, 1)
        samp = results.get("sampling")
        if samp and samp.get("ok"):
            return _emit(samp["value"], extras)
        return None

    def note_fail(name, why):
        """The current measurement produced no record: mark it 'error'
        (note_skip marks the never-launched rest) — never silently."""
        if name != "probe":
            extras[_SECONDARY_KEYS.get(name, name)] = "error: " + why

    pending = list(plan)
    stream = None
    # NOT gated on fail_reason: a sampling ok=False keeps the loop alive
    # for the secondaries, and a subsequent flap may still relaunch them.
    while pending and launches_left > 0:
        launches_left -= 1
        stream = _ChildStream(pending)
        relaunch = False
        while pending:
            name = pending[0]
            cap = probe_cap if name == "probe" else float(os.environ.get(
                f"PDGN_BENCH_HANG_CAP_{name.upper()}_S",
                _HANG_CAPS[name]))
            wait = min(cap, remaining() - 5)
            if wait <= 0:
                if fail_reason is None and name in ("probe", "sampling"):
                    fail_reason = (f"bench budget ({budget:.0f}s) "
                                   f"exhausted before {name}")
                note_skip(pending, "bench budget exhausted "
                          f"({budget:.0f}s)")
                pending = []
                break
            rec = stream.next_record(wait)
            if rec == "hang":
                stream.kill()
                if name == "probe" and launches_left > 0:
                    relaunch = True  # dead-at-start tunnel: retry probe
                else:
                    why = (f"{name}: no result in {wait:.0f}s "
                           "(backend hang)")
                    fail_reason = fail_reason or why
                    note_fail(name, why)
                    note_skip(pending[1:], "backend hang at " + name)
                    pending = []
                break
            if rec == "eof":  # child crashed mid-plan: maybe a flap
                tail = " | ".join(stream.stderr_tail[-3:])
                if launches_left > 0 and remaining() > 60:
                    relaunch = True
                    if "probe" not in pending:
                        pending = ["probe"] + pending  # re-verify liveness
                else:
                    why = f"child crashed at {name}: {tail}"
                    fail_reason = fail_reason or why
                    note_fail(name, why)
                    note_skip(pending[1:], "child crash at " + name)
                    pending = []
                break
            if rec.get("name") != name:
                continue  # stale/out-of-order record: ignore
            pending.pop(0)
            if name == "probe" and not rec.get("ok"):
                if launches_left > 0:
                    stream.kill()
                    relaunch = True
                    pending = plan[:]  # full retry after backoff
                    time.sleep(backoff)
                else:
                    fail_reason = fail_reason or (
                        "probe failed: " + rec.get("error", "not ok"))
                    note_skip(pending, "probe failed")
                    pending = []
                break
            absorb(name, rec)
            if name != "probe":
                emit_progress()
            if name == "sampling" and not rec.get("ok"):
                fail_reason = fail_reason or (
                    "sampling failed after probe OK: "
                    + rec.get("error", "?"))
                # keep going: secondaries still carry information
        if not relaunch:
            break
    if stream is not None:
        stream.kill()

    if not results.get("probe", {}).get("ok"):
        extras["bench_wall_s"] = round(time.time() - t_start, 1)
        _fallback_error_record(
            extras, "TPU backend unavailable: "
            + (fail_reason or "probe never answered"))
        return 0

    final = emit_progress()
    if final is None:  # probe OK but sampling missing/failed
        extras["bench_wall_s"] = round(time.time() - t_start, 1)
        _fallback_error_record(extras, fail_reason
                               or "sampling did not complete")
        return 0
    clean = fail_reason is None and all(
        results.get(n, {}).get("ok") for n in plan)
    if not _smoke() and final["value"] > 0 and clean:
        # only a fully-clean pass may replace the checked-in last-live
        # figures (a partial record would erase good train/eval numbers)
        _write_last_live(final)
    return 0


if __name__ == "__main__":
    sys.exit(main())
