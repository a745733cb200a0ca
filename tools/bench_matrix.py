"""Run bench.py under the dispatch env-gate matrix and print a table.

Usage:  python tools/bench_matrix.py [--quick]

Rows: (bf16, stats-kernel) combinations — the two runtime gates that pick
between kernel paths (ops/pallas/spmm.py dispatch).  .bench_history.json is
backed up and restored so vs_baseline bookkeeping is untouched.
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CASES = [
    ("bf16 + stats-kernel", {"INFOMAX3D_BF16": "1",
                             "INFOMAX3D_STATS_KERNEL": "1"}),
    ("bf16, f32 multi-reduce", {"INFOMAX3D_BF16": "1",
                                "INFOMAX3D_STATS_KERNEL": "0"}),
    ("fp32", {"INFOMAX3D_BF16": "0"}),
    # the multi-conformer flagship (pre-train_QMugs.yml: C=3 molecule-major
    # conformer packing, NTXentMultiplePositives, same PNA+Net3D widths) —
    # ~3x the QM9 flagship's 3D edge volume through the same kernels
    ("qmugs C=3 bf16 + kernel", {"INFOMAX3D_BENCH": "qmugs",
                                 "INFOMAX3D_BF16": "1",
                                 "INFOMAX3D_STATS_KERNEL": "1"}),
]


def main():
    hist = os.path.join(REPO, ".bench_history.json")
    backup = hist + ".bak"
    if os.path.exists(hist):
        shutil.copy(hist, backup)
    rows = []
    try:
        for name, env_over in CASES:
            env = dict(os.environ, **env_over)
            out = subprocess.run([sys.executable,
                                  os.path.join(REPO, "bench.py")],
                                 env=env, capture_output=True, text=True,
                                 timeout=2400)
            lines = [ln for ln in out.stdout.splitlines()
                     if ln.startswith("{")]
            if lines:
                r = json.loads(lines[-1])
                rows.append((name, r["value"], r["extra"]["step_ms"],
                             r["extra"].get("mfu_pct")))
            else:
                rows.append((name, None, None, out.stderr[-200:]))
    finally:
        if os.path.exists(backup):
            shutil.move(backup, hist)
    print(f"{'case':28} {'edges/s':>12} {'ms/step':>8} {'MFU%':>6}")
    for name, v, ms, mfu in rows:
        if v is None:
            print(f"{name:28} FAILED: {mfu}")
        else:
            print(f"{name:28} {v:12,.0f} {ms:8.2f} "
                  f"{mfu if mfu is not None else float('nan'):6.2f}")


if __name__ == "__main__":
    main()
