#!/usr/bin/env bash
# Multi-host edges/s scaling ladder (BASELINE.md: >=90% edges/s scaling to
# 2 hosts).  Runs the flagship bench at 1 chip, then the full local host,
# then 2 hosts via jax.distributed — READY TO RUN the moment multi-chip /
# multi-host TPU hardware exists; in this repo's single-chip dev
# environment only rung 1 executes and the script says so.
#
# Usage:
#   rung 1 (single chip, any environment):   tools/bench_2host.sh
#   rung 2 (all local chips, one host):      tools/bench_2host.sh host
#   rung 3 (two hosts):  on EACH host, with HOST0 set to the rendezvous
#   address (host 0's ip:port) and PID to 0 or 1:
#       HOST0=10.0.0.1:8476 PID=0 NHOSTS=2 tools/bench_2host.sh multi
#       HOST0=10.0.0.1:8476 PID=1 NHOSTS=2 tools/bench_2host.sh multi
#
# Each rung prints one JSON line {"rung": ..., "edges_per_s": ...}; compute
# scaling efficiency as edges_per_s(rung N) / (chips * edges_per_s(rung 1)).
set -euo pipefail
cd "$(dirname "$0")/.."
MODE="${1:-chip}"

case "$MODE" in
  chip)
    python - <<'EOF'
import json, subprocess, sys
out = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                     text=True, timeout=1800)
line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
r = json.loads(line)
print(json.dumps({"rung": "1chip", "edges_per_s": r["value"],
                  "step_ms": r["extra"]["step_ms"]}))
EOF
    ;;
  host)
    python - <<'EOF'
import json
import jax
n = jax.device_count()
if n < 2:
    print(json.dumps({"rung": "1host", "skipped":
                      f"only {n} local chip(s) — single-chip environment"}))
    raise SystemExit(0)
from tools.bench_dp import run_dp_bench       # noqa: E402
r = run_dp_bench(n_shards=n)
print(json.dumps({"rung": "1host", "chips": n, **r}))
EOF
    ;;
  multi)
    : "${HOST0:?set HOST0=ip:port of host 0}"
    : "${PID:?set PID=process index (0..NHOSTS-1)}"
    NHOSTS="${NHOSTS:-2}"
    python - <<EOF
import json
import jax
jax.distributed.initialize(coordinator_address="${HOST0}",
                           num_processes=${NHOSTS},
                           process_id=${PID})
n = jax.device_count()
from tools.bench_dp import run_dp_bench
r = run_dp_bench(n_shards=n)
if jax.process_index() == 0:
    print(json.dumps({"rung": "${NHOSTS}hosts", "chips": n, **r}))
EOF
    ;;
  *)
    echo "unknown mode '$MODE' (chip|host|multi)" >&2
    exit 2
    ;;
esac
