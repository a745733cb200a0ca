#!/usr/bin/env python
"""Summarize a jax.profiler trace: per-HLO-op device time, sorted.

Usage:
    python tools/parse_trace.py /tmp/jax_trace [--top 30] [--device TPU]

Pairs with `infomax3d_tpu.utils.debug.profile_trace`, which writes the trace
directory.  The profiler emits `plugins/profile/<ts>/*.trace.json.gz` in
Chrome trace-event format; device compute lives on the pid whose name is
`/device:TPU:0` (or `/device:CPU:0` under JAX_PLATFORMS=cpu) in the
"XLA Ops" thread.  Events carry `dur` (us) and `args.long_name` (the HLO
with shapes), which is what you need to find the dominant kernels.
"""
import argparse
import collections
import glob
import gzip
import json
import os


def load_trace_events(log_dir: str):
    pats = sorted(glob.glob(os.path.join(
        log_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not pats:
        raise SystemExit(f"no trace.json.gz under {log_dir}/plugins/profile/")
    with gzip.open(pats[-1], "rt") as f:
        return json.load(f)["traceEvents"]


def summarize(events, device_substr: str = "TPU"):
    # map pid -> process name, (pid, tid) -> thread name
    pids, tids = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"]["name"]
    dev_pids = {p for p, n in pids.items()
                if "/device:" in n and device_substr in n}
    if not dev_pids:  # fall back to any device pid (CPU traces)
        dev_pids = {p for p, n in pids.items() if "/device:" in n}
    per_op = collections.defaultdict(lambda: [0.0, 0, ""])
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        if "XLA Ops" not in tids.get((e["pid"], e["tid"]), ""):
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        rec = per_op[e["name"]]
        rec[0] += dur
        rec[1] += 1
        if not rec[2]:
            rec[2] = (e.get("args") or {}).get("long_name", "")[:120]
        total += dur
    return per_op, total


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("log_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--device", default="TPU",
                    help="substring of the device pid name (TPU/CPU)")
    a = ap.parse_args(argv)
    per_op, total = summarize(load_trace_events(a.log_dir), a.device)
    rows = sorted(per_op.items(), key=lambda kv: -kv[1][0])[:a.top]
    print(f"{'ms':>10} {'%':>6} {'calls':>6}  op")
    for name, (ms, calls, long_name) in rows:
        pct = 100.0 * ms / total if total else 0.0
        print(f"{ms:10.3f} {pct:6.2f} {calls:6d}  {name}")
        if long_name:
            print(f"{'':24}  {long_name}")
    print(f"{total:10.3f} 100.00        TOTAL device XLA-op time")


if __name__ == "__main__":
    main()
