#!/bin/bash
# Round-4 TPU runbook: run the moment the axon tunnel is up.
#
# Captures, in priority order (logged to bench_logs/r4_runbook.log):
#   1. scripts/tpu_validate_r3.py  — round-3 device changes (PQ exact-tier
#      kernel, aliased lane-padded view) that never ran on a real chip;
#   2. scripts/tpu_validate_r4.py  — round-4 quantized/sharded hybrid tiers;
#   3. the bench configs whose round-3 numbers are unaudited (BENCH_r03
#      rc=1): flagship re-rank, beyond-HBM fp32 at N=8M, int8, PQ, and the
#      flagship-scale early-stopping config.
#
# Each step is individually timed out so one hang cannot burn the window.
cd "$(dirname "$0")/.." || exit 1
mkdir -p bench_logs
LOG=bench_logs/r4_runbook.log
{
  echo "==== runbook start $(date -u +%FT%TZ) ===="
  echo "---- validate r3 ----"
  timeout 1100 python scripts/tpu_validate_r3.py
  echo "rc=$?"
  echo "---- validate r4 ----"
  timeout 1100 python scripts/tpu_validate_r4.py
  echo "rc=$?"
  echo "---- bench flagship (rerank N=2M Q=512 high) ----"
  timeout 3500 python bench.py
  echo "rc=$?"
  echo "---- bench fp32-stream N=8M (beyond-HBM hybrid) ----"
  timeout 3500 python bench.py --config fp32-stream --n 8000000 --skip-baseline
  echo "rc=$?"
  echo "---- bench int8 ----"
  timeout 3500 python bench.py --config int8 --skip-baseline
  echo "rc=$?"
  echo "---- bench pq (fast) ----"
  timeout 3500 python bench.py --config pq --precision fast --skip-baseline
  echo "rc=$?"
  echo "---- bench early-stopping ----"
  timeout 3500 python bench.py --config early-stopping --skip-baseline
  echo "rc=$?"
  echo "==== runbook end $(date -u +%FT%TZ) ===="
} >> "$LOG" 2>&1
