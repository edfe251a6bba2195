"""bench.py orchestration tests.

The driver runs ``python bench.py`` on real TPU hardware at the end of
every round; its one JSON line is the round's perf record. The round-3
record was lost to a tunnel death mid-bench, so the orchestration is now
hang/flap-proof (each measurement is a child subprocess with a hard
timeout behind a real-computation probe) and these tests pin that
contract: a dead backend degrades to a parseable error record with
rc=0, and a live backend produces the full record.
"""

import json
import os
import subprocess
import sys

BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench.py")


def _run(env_extra, timeout=600):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never dial the TPU relay
    env.update(env_extra)
    proc = subprocess.run([sys.executable, BENCH], stdout=subprocess.PIPE,
                          stderr=subprocess.PIPE, env=env, timeout=timeout)
    line = proc.stdout.decode().strip().splitlines()[-1]
    return proc.returncode, json.loads(line)


def test_probe_child_reports_ok():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run([sys.executable, BENCH, "--child", "probe"],
                          stdout=subprocess.PIPE, env=env, timeout=120)
    rec = json.loads(proc.stdout.decode().strip().splitlines()[-1])
    assert rec["ok"] is True
    assert rec["extras"]["device"]


def test_dead_backend_degrades_to_error_record():
    """An unusable backend must still produce the structured JSON line
    (value 0.0 + error field) at rc 0 — never a traceback."""
    rc, rec = _run({
        "JAX_PLATFORMS": "no_such_platform",
        "PDGN_BENCH_PROBE_ATTEMPTS": "2",
        "PDGN_BENCH_PROBE_TIMEOUT_S": "60",
        "PDGN_BENCH_BACKOFF_S": "1",
    })
    assert rc == 0
    assert rec["metric"] == "generated 2048-pt clouds/sec/chip"
    assert rec["value"] == 0.0
    assert rec["vs_baseline"] == 0.0
    assert "error" in rec and "unavailable" in rec["error"]


def test_smoke_bench_produces_full_record():
    """End-to-end success path at CPU-testable sizes: all four children
    run and every extras field the driver record is read for exists."""
    rc, rec = _run({
        "JAX_PLATFORMS": "cpu",
        "PDGN_BENCH_SMOKE": "1",
        "PDGN_BENCH_PROBE_TIMEOUT_S": "120",
    }, timeout=1200)
    assert rc == 0
    assert "error" not in rec
    assert rec["value"] > 0
    ex = rec["extras"]
    assert ex["mfu_sampling"] > 0
    assert ex["gan_steps_per_sec_b35"] > 0
    assert ex["gan_steps_per_sec_b35_bf16g"] > 0
    assert ex["train_step_xla_flops"] > 0
    assert ex["mfu_train"] > 0
    assert ex["mfu_train_bf16g"] > 0
    assert ex["eval_cd_emd_pairs_per_sec"] > 0
    assert ex["est_full_chair_eval_minutes"] > 0
