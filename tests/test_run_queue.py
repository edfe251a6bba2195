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


def test_timeout_kills_the_whole_process_group(tmp_path, monkeypatch):
    """A compound-command job forks its real workload under /bin/sh; the
    per-job timeout must kill the WHOLE group (a sh-only kill leaves the
    workload holding the TPU and the stdout pipe, wedging the runner)."""
    import time

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import run_queue
    finally:
        sys.path.pop(0)
    monkeypatch.setattr(run_queue, "OUT_DIR", str(tmp_path / "queue"))

    pidfile = tmp_path / "grandchild.pid"
    # the trailing '; true' forces sh to FORK python (no exec fast path)
    cmd = (f"{sys.executable} -c \"import os,time; "
           f"open('{pidfile}','w').write(str(os.getpid())); "
           f"time.sleep(300)\" ; true")
    t0 = time.time()
    rec = run_queue.run_job("wedge", cmd, timeout_s=2, needs_tpu=False)
    assert rec["rc"] == 124
    assert time.time() - t0 < 30  # returned promptly, no pipe wedge
    pid = int(pidfile.read_text())
    for _ in range(50):
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            break
        time.sleep(0.1)
    else:
        os.kill(pid, 9)  # clean up before failing
        raise AssertionError("grandchild survived the job timeout")
