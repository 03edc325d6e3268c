#!/bin/bash
# One-shot hardware measurement sweep (run when the TPU relay is healthy).
# Captures everything the round scorecard needs into benchmarks/measured/.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
OUT=benchmarks/measured
mkdir -p "$OUT"
stamp=$(date +%Y%m%d-%H%M%S)

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ==="
  timeout "$t" "$@" 2>&1 | tee "$OUT/${name}-${stamp}.log"
  local rc=${PIPESTATUS[0]}
  echo "--- $name exit=$rc ---"
}

run smoke     1200 python benchmarks/smoke_tpu.py
run bench     2400 python bench.py
run run_bench 3600 python benchmarks/run_bench.py --json
run profile_b1   1200 python benchmarks/profile_b1.py 1
run profile_b128 1200 python benchmarks/profile_b1.py 128
run deep100m  3600 python benchmarks/deep100m_v2.py
run ab_kernel 2400 python benchmarks/ab_kernel.py
run recall_curves 5400 python benchmarks/recall_curves.py
run recall_gist 5400 python benchmarks/recall_curves.py --geometry gist --small --nq 128
run serve 2400 python benchmarks/bench_serve.py
echo "All logs in $OUT/ (stamp $stamp)"
