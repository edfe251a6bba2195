"""Device-op breakdown of pdgn_tpu training programs (profiler-based).

Quantifies where a program's device time goes, kernel by kernel — the
methodology behind PERF.md's forward roofline, packaged as a tool so the
backward can be profiled the same way (round-4 item: G fwd+bwd is 29.3
ms of the ~80 ms train step at B=35; this attributes it).

Modes (all at training shapes, defaults B=35, fp32):

  gfwd   generator forward: sum over the four output clouds
  gbwd   d/dparams of gfwd — forward + backward in one program
  shape  shape-preserving loss fwd+bwd on four random clouds
         (pdgn_tpu.losses.shape_preserving_loss, k=20)
  step   the full GAN train step (pdgn_tpu.train.make_train_step)
  samp   the production sampling forward (bf16 generator, B=128 —
         override with --batch) for the epilogue/stage attribution

Each mode compiles its program, warms it up, runs ``--iters`` executions
under ``jax.profiler.trace`` (forcing completion through the axon relay
with a host fetch — block_until_ready returns at dispatch there), then
parses the written ``*.trace.json.gz`` and prints per-op device time,
aggregated over duplicate launches, as ms/iteration and % of the
device-side total. ``--parse PATH`` re-parses an existing trace instead
of running anything (used by the CPU tests).

The reference has no profiling subsystem; this sits beside the trainer's
``--profile_dir`` flag (train/trainer.py) as the analysis half.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZES = (256, 512, 1024, 2048)
SMOKE = os.environ.get("PDGN_PROFILE_SMOKE", "") not in ("", "0")
if SMOKE:  # CPU-testable sizes: validates the builders, not performance
    SIZES = (32, 64, 128, 256)


def _gen_kwargs():
    return dict(num_point=SIZES[-1], base_points=16) if SMOKE else {}


def _setup_jax():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/pdgn_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def _gen_and_params(batch):
    import jax
    import jax.numpy as jnp

    from pdgn_tpu.models import PointGenerator

    model = PointGenerator(**_gen_kwargs())
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((batch, 128)))
    return model, variables


def build_gfwd(batch):
    import jax
    import jax.numpy as jnp

    model, variables = _gen_and_params(batch)
    z = jax.random.normal(jax.random.PRNGKey(1), (batch, 128)) * 0.2

    @jax.jit
    def run(params, batch_stats, z):
        outs, _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, z,
            mutable=["batch_stats"])
        return sum(jnp.sum(o) for o in outs)

    return (lambda: run(variables["params"], variables["batch_stats"], z))


def build_gbwd(batch):
    import jax
    import jax.numpy as jnp

    model, variables = _gen_and_params(batch)
    z = jax.random.normal(jax.random.PRNGKey(1), (batch, 128)) * 0.2

    def loss(params, batch_stats, z):
        outs, _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, z,
            mutable=["batch_stats"])
        return sum(jnp.sum(o) for o in outs)

    grad = jax.jit(jax.grad(loss))

    def run():
        g = grad(variables["params"], variables["batch_stats"], z)
        return jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b), g, jnp.zeros(()))

    return run


def build_shape(batch):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pdgn_tpu.losses import shape_preserving_loss

    rng = np.random.RandomState(0)
    clouds = tuple(jnp.asarray(rng.randn(batch, n, 3).astype(np.float32))
                   for n in SIZES)

    def loss(clouds):
        return shape_preserving_loss(clouds)

    grad = jax.jit(jax.grad(loss))

    def run():
        g = grad(clouds)
        return sum(jnp.sum(x) for x in g)

    return run


def build_step(batch):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pdgn_tpu.models import (
        PointDiscriminator1, PointDiscriminator2,
        PointDiscriminator3, PointDiscriminator4, PointGenerator,
    )
    from pdgn_tpu.train import TrainConfig, init_state, make_train_step

    gen = PointGenerator(**_gen_kwargs())
    discs = (PointDiscriminator1(), PointDiscriminator2(),
             PointDiscriminator3(), PointDiscriminator4())
    cfg = TrainConfig()
    state = [init_state(gen, discs, cfg, jax.random.PRNGKey(0), batch,
                        num_points=SIZES)]
    step = jax.jit(make_train_step(gen, discs, cfg))
    rng = np.random.RandomState(0)
    reals = tuple(jnp.asarray(rng.randn(batch, n, 3).astype(np.float32))
                  for n in SIZES)

    def run():
        state[0], m = step(state[0], reals, jax.random.PRNGKey(2))
        return m["g_loss"]

    return run


def build_samp(batch):
    """Production sampling configuration: bf16 compute path, fp32
    params/statistics/heads (bench.py's child_sampling single batch)."""
    import jax
    import jax.numpy as jnp

    from pdgn_tpu.models import PointGenerator

    model = PointGenerator(dtype="bfloat16", **_gen_kwargs())
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((batch, 128)))
    z = jax.random.normal(jax.random.PRNGKey(1), (batch, 128))

    @jax.jit
    def run(params, batch_stats, z):
        outs, _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, z,
            mutable=["batch_stats"])
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    return (lambda: run(variables["params"], variables["batch_stats"], z))


BUILDERS = {"gfwd": build_gfwd, "gbwd": build_gbwd,
            "shape": build_shape, "step": build_step,
            "samp": build_samp}


def resolve_batch(mode: str, batch):
    """Per-mode default batch: samp profiles the production B=128
    sampling configuration, every other mode the B=35 training shapes.
    An explicit --batch (batch is not None) always wins — including
    ``samp --batch 35``, which must profile B=35, not remap to 128."""
    if batch is not None:
        return batch
    return 128 if mode == "samp" else 35


def parse_trace(path: str, iters: int = 1):
    """Aggregate device-side complete events from a trace.json.gz.

    Returns (rows, total_ms_per_iter) where rows are
    (ms_per_iter, count, name) sorted descending. Device tracks are the
    pids whose process_name metadata does NOT look like the host python
    process; python source frames are filtered by name shape.
    """
    with gzip.open(path) as f:
        data = json.load(f)
    events = data["traceEvents"]

    proc_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            proc_names[ev.get("pid")] = ev.get("args", {}).get("name", "")

    def is_device_pid(pid):
        name = proc_names.get(pid, "")
        return ("TPU" in name or "/device" in name
                or "XLA" in name or "Chip" in name)

    have_device = any(is_device_pid(p) for p in proc_names)
    agg = collections.defaultdict(lambda: [0.0, 0])
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        name = ev.get("name", "")
        if have_device and not is_device_pid(ev.get("pid")):
            continue
        if (".py" in name or name.startswith("$") or "Thread" in name
                or "ThunkExecutor" in name or "np.asarray" in name
                or name.startswith("Xla") or name == "wrapper"):
            continue  # host-side runtime/python frames, not device ops
        agg[name][0] += ev["dur"] / 1000.0  # us -> ms
        agg[name][1] += 1
    rows = sorted(((ms / iters, n, name) for name, (ms, n) in agg.items()),
                  reverse=True)
    total = sum(r[0] for r in rows)
    return rows, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=sorted(BUILDERS) + ["parse"])
    # default is per-mode (samp profiles the production B=128 sampling
    # config, everything else the B=35 training shapes); an explicit
    # --batch always wins — None marks "flag omitted" unambiguously
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--out", default="/tmp/pdgn_profile")
    ap.add_argument("--parse", help="existing trace.json.gz (mode=parse)")
    args = ap.parse_args()

    if args.mode == "parse":
        rows, total = parse_trace(args.parse, args.iters)
    else:
        jax = _setup_jax()
        run = BUILDERS[args.mode](resolve_batch(args.mode, args.batch))
        print(f"[{args.mode}] compiling/warming on "
              f"{jax.devices()[0]} ...", flush=True)
        float(run())
        float(run())
        t0 = time.perf_counter()
        float(run())
        wall = time.perf_counter() - t0
        print(f"[{args.mode}] warm wall/iter: {wall * 1000:.1f} ms",
              flush=True)
        run_dir = os.path.join(args.out, args.mode)
        with jax.profiler.trace(run_dir):
            acc = 0.0
            for _ in range(args.iters):
                acc += float(run())
        traces = sorted(glob.glob(os.path.join(
            run_dir, "plugins", "profile", "*", "*.trace.json.gz")),
            key=os.path.getmtime)
        if not traces:
            print("no trace.json.gz written (is tensorboard installed?)")
            return 1
        rows, total = parse_trace(traces[-1], args.iters)

    print(f"\ndevice-side total: {total:.2f} ms/iter")
    print(f"{'ms/iter':>10} {'count':>6} {'%':>6}  op")
    for ms, count, name in rows[:args.top]:
        print(f"{ms:10.3f} {count:6d} {100 * ms / max(total, 1e-9):6.1f}"
              f"  {name[:90]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
