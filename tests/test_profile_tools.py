"""tools/profile_step.py trace parsing: synthetic perfetto trace → tables."""

import gzip
import importlib.util
import json
from pathlib import Path


def _load_profile_step():
    spec = importlib.util.spec_from_file_location(
        "profile_step", Path(__file__).resolve().parent.parent / "tools" / "profile_step.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_parse_trace_synthetic(tmp_path, capsys):
    ps = _load_profile_step()
    meta = [
        {"ph": "M", "pid": 3, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "pid": 3, "tid": 3, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
    ]
    # dominant module: 2 steps of 100us; a tiny side module that must NOT
    # set the step count (the bug the dominant-module logic fixed)
    mods = [
        {"ph": "X", "pid": 3, "tid": 2, "name": "jit_train_step(1)", "ts": t, "dur": 100}
        for t in (0, 200)
    ] + [
        {"ph": "X", "pid": 3, "tid": 2, "name": "jit_add(2)", "ts": t, "dur": 1}
        for t in (110, 120, 310, 320)
    ]
    ops = [
        {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.7", "ts": 0, "dur": 60,
         "args": {"hlo_category": "convolution fusion", "bytes_accessed": "1000000",
                  "long_name": "%fusion.7 = bf16[8,56,56,96]{...} fusion(...)"}},
        {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.7", "ts": 200, "dur": 60,
         "args": {"hlo_category": "convolution fusion", "bytes_accessed": "1000000",
                  "long_name": "%fusion.7 = bf16[8,56,56,96]{...} fusion(...)"}},
        {"ph": "X", "pid": 3, "tid": 3, "name": "copy.1", "ts": 60, "dur": 40,
         "args": {"hlo_category": "copy", "long_name": "%copy.1 = f32[64]{...}"}},
        {"ph": "X", "pid": 3, "tid": 3, "name": "copy.1", "ts": 260, "dur": 40,
         "args": {"hlo_category": "copy", "long_name": "%copy.1 = f32[64]{...}"}},
    ]
    trace_dir = tmp_path / "t"
    trace_dir.mkdir()
    with gzip.open(trace_dir / "vm.trace.json.gz", "wt") as fh:
        json.dump({"traceEvents": meta + mods + ops}, fh)

    ps.parse_trace(str(trace_dir), steps=2, top=10)
    out = capsys.readouterr().out
    # dominant-module step: 100us over 2 executions → 0.10 ms, not diluted
    # by the 4 tiny jit_add executions
    assert "0.10 ms (jit_train_step × 2)" in out
    assert "convolution fusion [8,56,56,96]" in out
    assert "copy [64]" in out
    # 60us + 2*1MB over 2 steps → 0.060 ms/step at ~16.7 GB/s
    assert "0.060" in out


def test_parse_trace_missing_file(tmp_path, capsys):
    ps = _load_profile_step()
    ps.parse_trace(str(tmp_path), steps=1, top=5)
    assert "no trace file found" in capsys.readouterr().err
