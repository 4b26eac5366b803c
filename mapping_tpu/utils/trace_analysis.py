"""Analysis of jax.profiler traces: where do the device milliseconds go?

The ProfilerTrace callback (train/callbacks.py) captures traces during
training; this module turns the Chrome-trace JSON the profiler writes
(`plugins/profile/*/\\*.trace.json.gz`) into per-HLO-category and per-op
tables without needing TensorBoard. This is the tool behind the committed
backward profile in PERF.md (the reference had only wall-clock
ExperimentTiming, src/steps/pytorch/callbacks.py:325-371 — no per-op
attribution at all).

Usage:
    python -m mapping_tpu.utils.trace_analysis <trace_dir> [top_n]
"""

import collections
import glob
import gzip
import json
import os
import re
from typing import Dict, List, Optional, Tuple


def find_trace_json(trace_dir: str) -> str:
    """Newest *.trace.json(.gz) under a profiler output directory."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json*"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace.json under {trace_dir}")
    return max(paths, key=os.path.getmtime)


def load_device_events(path: str) -> List[dict]:
    """Complete ('X') events on device tracks, with their args."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    device_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    return [e for e in events
            if e.get("ph") == "X" and e.get("pid") in device_pids]


def by_category(events: List[dict]) -> List[Tuple[str, float, int, float]]:
    """(hlo_category, total_ms, count, model_tflops) rows, descending time.

    Events without an hlo_category (the enclosing jit/while regions) are
    skipped — they double-count their children.
    """
    agg: Dict[str, List[float]] = collections.defaultdict(lambda: [0.0, 0, 0.0])
    for e in events:
        cat = e.get("args", {}).get("hlo_category")
        if not cat:
            continue
        agg[cat][0] += e["dur"]
        agg[cat][1] += 1
        agg[cat][2] += float(e["args"].get("model_flops", 0) or 0)
    return sorted(
        ((cat, dur / 1e3, int(cnt), fl / 1e12)
         for cat, (dur, cnt, fl) in agg.items()),
        key=lambda r: -r[1])


def top_ops(events: List[dict], n: int = 20,
            category: Optional[str] = None
            ) -> List[Tuple[str, float, int, float]]:
    """(op signature, total_ms, count, tflops_per_sec) rows.

    Ops group by their shape/window signature (extracted from the HLO
    long_name) so the K identical instances of a scanned step aggregate.
    """
    agg: Dict[str, List[float]] = collections.defaultdict(lambda: [0.0, 0, 0.0])
    for e in events:
        args = e.get("args", {})
        cat = args.get("hlo_category")
        if not cat or (category and cat != category):
            continue
        ln = args.get("long_name", e["name"])
        shape = ln.split("=")[1].strip().split(" ")[0] if "=" in ln else ln
        win = re.search(r"window=\{([^}]*)\}", ln)
        key = f"{cat}: {shape[:48]}" + (f" win={win.group(1)[:32]}" if win
                                        else "")
        agg[key][0] += e["dur"]
        agg[key][1] += 1
        agg[key][2] += float(args.get("model_flops", 0) or 0)
    rows = sorted(((k, d / 1e3, int(c), (f / d / 1e6) if d else 0.0)
                   for k, (d, c, f) in agg.items()), key=lambda r: -r[1])
    return rows[:n]


def summarize(trace_dir: str, top_n: int = 20) -> str:
    path = find_trace_json(trace_dir)
    events = load_device_events(path)
    lines = [f"trace: {path}", f"device events: {len(events)}"]
    cats = by_category(events)
    total_ms = sum(r[1] for r in cats)
    total_tf = sum(r[3] for r in cats)
    lines.append(f"leaf device time {total_ms:.1f} ms, "
                 f"model FLOPs {total_tf:.2f} TF")
    lines.append(f"{'category':28s} {'ms':>9s} {'count':>7s} {'TF':>7s}")
    for cat, ms, cnt, tf in cats:
        lines.append(f"{cat:28s} {ms:9.2f} {cnt:7d} {tf:7.2f}")
    lines.append("")
    lines.append(f"top {top_n} op groups:")
    for key, ms, cnt, rate in top_ops(events, top_n):
        lines.append(f"{ms:9.2f} ms x{cnt:5d} {rate:7.1f} TFLOP/s  {key}")
    return "\n".join(lines)


if __name__ == "__main__":
    import sys

    print(summarize(sys.argv[1],
                    int(sys.argv[2]) if len(sys.argv) > 2 else 20))
