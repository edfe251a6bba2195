"""Tests for scripts/profile_breakdown.py's trace parser."""

import gzip
import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "profile_breakdown",
        os.path.join(REPO, "scripts", "profile_breakdown.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_trace(path, events):
    with gzip.open(path, "wt") as f:
        json.dump({"traceEvents": events}, f)


def test_parse_aggregates_device_ops_only(tmp_path):
    tool = _load_tool()
    trace = str(tmp_path / "t.trace.json.gz")
    _write_trace(trace, [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "python3"}},
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        # host frames: must be dropped (wrong pid)
        {"ph": "X", "pid": 1, "name": "train.py:12 step", "dur": 9e6},
        # device ops: two launches of the same fusion aggregate
        {"ph": "X", "pid": 7, "name": "fusion.1", "dur": 1000.0},
        {"ph": "X", "pid": 7, "name": "fusion.1", "dur": 3000.0},
        {"ph": "X", "pid": 7, "name": "custom-call.2", "dur": 2000.0},
        # runtime frame on the device pid: denylisted by name
        {"ph": "X", "pid": 7, "name": "ThunkExecutor::Execute",
         "dur": 5e6},
    ])
    rows, total = tool.parse_trace(trace, iters=2)
    assert abs(total - 3.0) < 1e-9          # (4000 + 2000) us / 2 iters
    assert [(name, count) for _, count, name in rows] == [
        ("fusion.1", 2), ("custom-call.2", 1)]
    assert abs(rows[0][0] - 2.0) < 1e-9     # ms per iter


def test_parse_host_only_trace_drops_python_frames(tmp_path):
    tool = _load_tool()
    trace = str(tmp_path / "h.trace.json.gz")
    _write_trace(trace, [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "python3"}},
        {"ph": "X", "pid": 1, "name": "$array.py:297 __float__",
         "dur": 8e6},
        {"ph": "X", "pid": 1, "name": "dot_general.5", "dur": 500.0},
    ])
    rows, total = tool.parse_trace(trace, iters=1)
    assert [name for _, _, name in rows] == ["dot_general.5"]
    assert abs(total - 0.5) < 1e-9


def test_builders_registry_complete():
    tool = _load_tool()
    assert set(tool.BUILDERS) == {"gfwd", "gbwd", "shape", "step",
                              "samp"}


def test_batch_defaults_are_per_mode_and_explicit_flag_wins():
    tool = _load_tool()
    assert tool.resolve_batch("samp", None) == 128
    assert tool.resolve_batch("step", None) == 35
    assert tool.resolve_batch("gbwd", None) == 35
    # an explicit request must never be remapped (samp --batch 35 used
    # to silently profile B=128 while labeled as the user's config)
    assert tool.resolve_batch("samp", 35) == 35
    assert tool.resolve_batch("step", 128) == 128
