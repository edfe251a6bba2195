"""Incremental measurement-queue runner (round-5 verdict weak #4).

The round-4 queue (``tpu_measurement_queue.sh``) appended to /tmp logs
and only surfaced results when the whole queue finished — when the round
ended mid-queue, every completed job's evidence evaporated. This runner
writes each job's record into the repo (``measurements/queue/<name>.json``)
THE MOMENT the job completes: stdout tail, rc, wall seconds, and any
JSON lines the job printed, so a partially-run queue still leaves every
finished measurement on disk for PERF.md.

Jobs are listed in a plain JSON file (see ``measurements/queue/README``)
or passed as ``name=command`` arguments:

    python scripts/run_queue.py 'gbwd=python scripts/profile_breakdown.py \
        gbwd --iters 4' 'train=python bench.py --child train'

Every TPU job is gated on a live real-computation probe (the axon tunnel
flaps; an import-only probe lies — a dead tunnel makes every device op
hang). While the tunnel is dead the runner sleeps and retries; jobs run
under a hard timeout. Unlike the round-4 shell queue, no SIGSTOP games
with a background CPU run are played: run CPU work separately at
``nice -n 19`` so TPU host-side compiles win the (single) core.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "measurements", "queue")
PROBE_SNIPPET = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((256, 256), jnp.bfloat16);"
    "print('alive', float(jnp.sum((x @ x).astype(jnp.float32))), flush=True)"
)


def probe(timeout_s: float = 120.0) -> bool:
    """A real computation through the backend (import-only probes lie)."""
    try:
        proc = subprocess.run([sys.executable, "-c", PROBE_SNIPPET],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.DEVNULL, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False
    return proc.returncode == 0 and b"alive" in proc.stdout


def wait_tpu(poll_s: float = 180.0) -> None:
    while not probe():
        print(f"tunnel dead, retry in {poll_s:.0f}s", flush=True)
        time.sleep(poll_s)


def run_job(name: str, cmd: str, timeout_s: float = 2400.0,
            needs_tpu: bool = True) -> dict:
    """Run one job; write its record to measurements/queue/ immediately."""
    if needs_tpu:
        wait_tpu()
    print(f"--- [{name}] start", flush=True)
    t0 = time.time()
    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR="/tmp/pdgn_tpu_jax_cache",
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1")
    # own session so a timeout can kill the WHOLE process group:
    # shell=True + subprocess.run's timeout would SIGKILL only /bin/sh,
    # leaving a compound command's real workload running (holding the
    # single TPU busy) AND holding the stdout pipe, which wedges the
    # post-kill communicate() forever.
    proc = subprocess.Popen(cmd, shell=True, cwd=REPO, env=env,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT,
                            start_new_session=True)
    try:
        out_b, _ = proc.communicate(timeout=timeout_s)
        rc = proc.returncode
    except subprocess.TimeoutExpired:
        rc = 124
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            proc.kill()
        try:
            out_b, _ = proc.communicate(timeout=10)
        except subprocess.TimeoutExpired:
            out_b = b""
    out = (out_b or b"").decode(errors="replace")
    wall = round(time.time() - t0, 1)
    json_lines = []
    for line in out.splitlines():
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                json_lines.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    rec = {"name": name, "cmd": cmd, "rc": rc, "wall_s": wall,
           "finished_unix": round(time.time(), 1),
           "json_lines": json_lines,
           "tail": out.splitlines()[-40:]}
    os.makedirs(OUT_DIR, exist_ok=True)
    with open(os.path.join(OUT_DIR, f"{name}.json"), "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    print(f"--- [{name}] rc={rc} wall={wall}s -> "
          f"measurements/queue/{name}.json", flush=True)
    return rec


def main() -> int:
    jobs = []
    for arg in sys.argv[1:]:
        if arg.endswith(".json"):
            with open(arg) as f:
                for j in json.load(f):
                    jobs.append((j["name"], j["cmd"],
                                 float(j.get("timeout_s", 2400)),
                                 bool(j.get("needs_tpu", True))))
        else:
            name, cmd = arg.split("=", 1)
            jobs.append((name, cmd, 2400.0, True))
    if not jobs:
        print(__doc__)
        return 2
    for name, cmd, timeout_s, needs_tpu in jobs:
        run_job(name, cmd, timeout_s, needs_tpu)
    print("queue done", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
