#!/bin/bash
# Round-4d TPU runbook: capture the overlapped-fetch serving path on chip.
#
#   1. scripts/tpu_validate_r4.py — the dense-hybrid stage should now PASS:
#      sparse chunks stage bucketed blocks that fit the leftover budget
#      (the r4b run FAILed with a 96 MiB full-chunk re-upload per warm call);
#   2. flagship bench with the chunked overlapped score fetch + --loops 3;
#   3. beyond-HBM fp32 N=8M re-run (same serving path, bigger table).
cd "$(dirname "$0")/.." || exit 1
mkdir -p bench_logs
LOG=bench_logs/r4d_runbook.log
{
  echo "==== r4d runbook start $(date -u +%FT%TZ) ===="
  echo "---- validate r4 (bucketed hybrid blocks) ----"
  timeout 2200 python scripts/tpu_validate_r4.py
  echo "rc=$?"
  echo "---- bench flagship (overlapped fetch, 3 loops) ----"
  timeout 3500 python bench.py
  echo "rc=$?"
  echo "---- bench fp32-stream N=8M ----"
  timeout 3500 python bench.py --config fp32-stream --n 8000000 --skip-baseline
  echo "rc=$?"
  echo "==== r4d runbook end $(date -u +%FT%TZ) ===="
} >> "$LOG" 2>&1
