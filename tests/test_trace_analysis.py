"""trace_analysis on a synthetic Chrome-trace file (+ the real one when a
profiler run left it behind)."""

import gzip
import json
import os

from mapping_tpu.utils import trace_analysis as TA


def _write_trace(root):
    d = os.path.join(root, "plugins", "profile", "2026_01_01_00_00_00")
    os.makedirs(d)
    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        # enclosing region (no category) must not double-count
        {"ph": "X", "pid": 3, "ts": 0, "dur": 10000, "name": "jit_run"},
        {"ph": "X", "pid": 3, "ts": 0, "dur": 6000, "name": "conv.1",
         "args": {"hlo_category": "convolution fusion",
                  "model_flops": "2000000000",
                  "long_name": "%conv.1 = bf16[8,64,64,32]{...} "
                               "convolution(...), window={size=3x3}"}},
        {"ph": "X", "pid": 3, "ts": 6000, "dur": 3000, "name": "fusion.2",
         "args": {"hlo_category": "loop fusion", "model_flops": "0",
                  "long_name": "%fusion.2 = f32[8,64,64,32]{...} fusion(...)"}},
        # a host event that must be excluded
        {"ph": "X", "pid": 9, "ts": 0, "dur": 99999, "name": "host_thing",
         "args": {"hlo_category": "loop fusion"}},
    ]
    path = os.path.join(d, "vm.trace.json.gz")
    with gzip.open(path, "wt") as f:
        json.dump({"traceEvents": events}, f)
    return path


def test_by_category_and_top_ops(tmp_path):
    _write_trace(str(tmp_path))
    path = TA.find_trace_json(str(tmp_path))
    events = TA.load_device_events(path)
    assert len(events) == 3  # host event excluded, region included
    cats = TA.by_category(events)
    assert cats[0][0] == "convolution fusion"
    assert abs(cats[0][1] - 6.0) < 1e-9  # ms
    assert abs(cats[0][3] - 0.002) < 1e-9  # TF
    assert cats[1][0] == "loop fusion"
    total = sum(r[1] for r in cats)
    assert abs(total - 9.0) < 1e-9  # jit_run region not double-counted

    ops = TA.top_ops(events, 5)
    assert ops[0][0].startswith("convolution fusion: bf16[8,64,64,32]")
    assert "win=size=3x3" in ops[0][0]
    # rate: 2 GF / 6 ms = 0.333 TFLOP/s
    assert abs(ops[0][3] - 2e9 / 6000 / 1e6) < 1e-6


def test_summarize_renders(tmp_path):
    _write_trace(str(tmp_path))
    text = TA.summarize(str(tmp_path), top_n=3)
    assert "convolution fusion" in text
    assert "top 3 op groups" in text
