"""tools/profile_step.py trace parsing: lane selection + aggregation.

The profiler tool's parser must pick ONLY the op-level device row — a TPU
trace's device pid carries three overlapping rows (Steps / XLA Modules /
XLA Ops) that each cover the same device time, so summing across rows
triple-counts (the round-4 first-run bug). Pin it with a synthetic
Chrome-trace file shaped like the real axon capture.
"""

import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from tools.profile_step import _category, parse_trace  # noqa: E402


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "run"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def test_parse_trace_uses_only_xla_ops_lane(tmp_path):
    meta = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 701, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 3, "tid": 1, "name": "thread_name",
         "args": {"name": "Steps"}},
        {"ph": "M", "pid": 3, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "pid": 3, "tid": 3, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 701, "tid": 9, "name": "thread_name",
         "args": {"name": "python"}},
    ]
    # the same 100us step covered on all three device rows + a host event
    events = meta + [
        {"ph": "X", "pid": 3, "tid": 1, "name": "17", "dur": 100.0},
        {"ph": "X", "pid": 3, "tid": 2, "name": "jit_step", "dur": 100.0},
        {"ph": "X", "pid": 3, "tid": 3, "name": "convolution.5", "dur": 60.0},
        {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.1", "dur": 30.0},
        {"ph": "X", "pid": 3, "tid": 3,
         "name": "select-and-scatter.36", "dur": 10.0},
        {"ph": "X", "pid": 701, "tid": 9, "name": "python", "dur": 999.0},
    ]
    out = parse_trace(_write_trace(tmp_path, events), steps=2)
    # only the XLA Ops row counts: (60+30+10)/2 steps — not 300/2, not 999
    assert out["device_us_per_step"] == 50.0
    cats = out["categories_us_per_step"]
    assert cats["convolution"] == 30.0
    assert cats["fusion"] == 15.0
    assert cats["select-and-scatter"] == 5.0
    names = [n for n, _ in out["top_ops_us_per_step"]]
    assert names[0] == "convolution.5" and "17" not in names


def test_parse_trace_suffixed_ops_lane_matches(tmp_path):
    """Lane-name drift tolerance: 'XLA Ops#1' still counts as the op row."""
    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 1, "name": "thread_name",
         "args": {"name": "Steps"}},
        {"ph": "M", "pid": 3, "tid": 3, "name": "thread_name",
         "args": {"name": "XLA Ops#1"}},
        {"ph": "X", "pid": 3, "tid": 1, "name": "17", "dur": 100.0},
        {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.1", "dur": 40.0},
    ]
    out = parse_trace(_write_trace(tmp_path, events), steps=2)
    assert out["device_us_per_step"] == 20.0


def test_parse_trace_no_ops_lane_is_hard_error(tmp_path):
    """Without an op-level row the only 'fallback' is summing overlapping
    rows — the exact triple-counting bug the tool exists to avoid. Must
    refuse, not silently inflate."""
    import pytest

    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 1, "name": "thread_name",
         "args": {"name": "Steps"}},
        {"ph": "M", "pid": 3, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
        {"ph": "X", "pid": 3, "tid": 1, "name": "17", "dur": 100.0},
        {"ph": "X", "pid": 3, "tid": 2, "name": "jit_step", "dur": 100.0},
    ]
    with pytest.raises(SystemExit, match="triple-counts"):
        parse_trace(_write_trace(tmp_path, events), steps=2)


def test_category_mapping():
    assert _category("%convolution.123") == "convolution"
    assert _category("multiply_reduce_fusion.4") == "fusion"
    assert _category("copy_add_fusion") == "fusion"
    assert _category("copy.70") == "copy/transpose"
    assert _category("transpose.2") == "copy/transpose"
    assert _category("all-reduce.1") == "collective"
    assert _category("all-to-all.3") == "collective"
    assert _category("reduce.9") == "reduce"
    assert _category("select-and-scatter.36") == "select-and-scatter"
