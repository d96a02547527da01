"""Summarize a captured jax.profiler trace: device time, achieved FLOP/s and
bandwidth per HLO category, and the top ops by source location.

Usage:
    python -m vae_channel_dynamics_tpu.tools.profile_summary \
        --trace_dir results/<run>/profile

Pairs with the trainer's ``profiling:`` config section (utils/profiling.py):
run a few profiled steps, then read where the time goes without TensorBoard.
The reference has no profiling at all (SURVEY.md §5)."""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
from typing import Any, Dict, List


def _find_trace(trace_dir: str) -> str:
    matches = sorted(
        glob.glob(
            os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
        )
    )
    if not matches:
        raise FileNotFoundError(f"No *.trace.json.gz under {trace_dir}")
    return matches[-1]


def load_device_ops(trace_path: str) -> List[Dict[str, Any]]:
    with gzip.open(trace_path) as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    tids = {
        (e["pid"], e["tid"]): e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    ops = []
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if "TPU" not in pids.get(e.get("pid"), ""):
            continue
        if tids.get((e["pid"], e["tid"])) != "XLA Ops":
            continue
        ops.append(e)
    return ops


def summarize(trace_dir: str, top_n: int = 15) -> str:
    path = _find_trace(trace_dir)
    ops = load_device_ops(path)
    if not ops:
        return f"No device XLA ops found in {path}"

    cat_time: collections.Counter = collections.Counter()
    cat_flops: collections.Counter = collections.Counter()
    cat_bytes: collections.Counter = collections.Counter()
    by_src: collections.Counter = collections.Counter()
    for e in ops:
        a = e.get("args", {})
        cat = a.get("hlo_category", "?")
        cat_time[cat] += e["dur"]
        cat_flops[cat] += int(a.get("model_flops", 0) or 0)
        cat_bytes[cat] += int(a.get("raw_bytes_accessed", 0) or 0)
        src = a.get("tf_op", e["name"])
        by_src[src] += e["dur"]

    total_us = sum(cat_time.values())
    lines = [
        f"trace: {path}",
        f"device busy time: {total_us/1e3:.1f} ms over the captured window",
        "",
        f"{'category':28s} {'ms':>9s} {'%':>6s} {'TFLOP/s':>8s} {'GB/s':>7s}",
    ]
    for cat, us in cat_time.most_common():
        tf = cat_flops[cat] / (us * 1e-6) / 1e12 if us else 0.0
        gb = cat_bytes[cat] / (us * 1e-6) / 1e9 if us else 0.0
        lines.append(
            f"{cat:28s} {us/1e3:9.1f} {us/total_us*100:6.1f} {tf:8.1f} {gb:7.0f}"
        )
    total_flops = sum(cat_flops.values())
    lines += [
        "",
        f"achieved overall: {total_flops/(total_us*1e-6)/1e12:.1f} TFLOP/s "
        f"({total_flops/1e12:.2f} TF in the window)",
        "",
        f"top {top_n} ops by device time:",
    ]
    for src, us in by_src.most_common(top_n):
        lines.append(f"{us/1e3:8.1f} ms  {src[:110]}")
    return "\n".join(lines)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Summarize a profiler trace.")
    parser.add_argument("--trace_dir", required=True)
    parser.add_argument("--top", type=int, default=15)
    args = parser.parse_args(argv)
    print(summarize(args.trace_dir, args.top))
    return 0


if __name__ == "__main__":
    sys.exit(main())
