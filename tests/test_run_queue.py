"""scripts/run_queue.py — the incremental measurement-queue runner.

Round-4 verdict weak #4: queue results must land in the repo the moment
each job completes, not at queue end. These tests drive the runner with
no-TPU jobs (``needs_tpu: false`` skips the liveness probe) and pin the
per-job record contract.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNNER = os.path.join(REPO, "scripts", "run_queue.py")


def _run(args, cwd):
    return subprocess.run([sys.executable, RUNNER] + args,
                          stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                          cwd=cwd, timeout=120)


def test_record_written_per_job_with_json_lines(tmp_path, monkeypatch):
    # point OUT_DIR at a temp repo clone of the layout via env? The
    # runner writes to <repo>/measurements/queue — run it with a patched
    # module instead to keep the real repo clean.
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import run_queue
    finally:
        sys.path.pop(0)
    monkeypatch.setattr(run_queue, "OUT_DIR", str(tmp_path / "queue"))

    rec = run_queue.run_job(
        "hello",
        "echo 'pre'; echo '{\"ok\": true, \"value\": 7}'",
        timeout_s=30, needs_tpu=False)
    assert rec["rc"] == 0
    assert rec["json_lines"] == [{"ok": True, "value": 7}]
    # the record is ON DISK the moment the job returns
    path = tmp_path / "queue" / "hello.json"
    with open(path) as f:
        on_disk = json.load(f)
    assert on_disk["name"] == "hello"
    assert on_disk["json_lines"] == [{"ok": True, "value": 7}]
    assert "pre" in "\n".join(on_disk["tail"])


def test_failing_and_timing_out_jobs_still_leave_records(tmp_path,
                                                         monkeypatch):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import run_queue
    finally:
        sys.path.pop(0)
    monkeypatch.setattr(run_queue, "OUT_DIR", str(tmp_path / "queue"))

    rec = run_queue.run_job("boom", "echo bad; exit 3",
                            timeout_s=30, needs_tpu=False)
    assert rec["rc"] == 3
    assert (tmp_path / "queue" / "boom.json").exists()

    rec = run_queue.run_job("slow", "sleep 60",
                            timeout_s=1, needs_tpu=False)
    assert rec["rc"] == 124
    with open(tmp_path / "queue" / "slow.json") as f:
        assert json.load(f)["rc"] == 124
