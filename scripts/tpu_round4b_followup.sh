#!/bin/bash
# Round-4 follow-up: wait for the main runbook (PID in $1) to release the
# chip, then re-run the two validation scripts — validate_r3 against the
# FIXED PQ ADC kernel (reshape-free one-hot, commit ad4b7ac) and the
# instrumented validate_r4 (stage timers, halved upload volume).
cd "$(dirname "$0")/.." || exit 1
mkdir -p bench_logs
LOG=bench_logs/r4b_followup.log
MAIN_PID=${1:?usage: tpu_round4b_followup.sh <runbook-pid>}
{
  echo "==== follow-up waiting on pid $MAIN_PID $(date -u +%FT%TZ) ===="
  while kill -0 "$MAIN_PID" 2>/dev/null; do sleep 30; done
  echo "==== main runbook done; validations start $(date -u +%FT%TZ) ===="
  echo "---- validate r3 (fixed kernel) ----"
  timeout 2200 python scripts/tpu_validate_r3.py
  echo "rc=$?"
  echo "---- validate r4 (instrumented) ----"
  timeout 2200 python scripts/tpu_validate_r4.py
  echo "rc=$?"
  echo "---- verify drive (TPU) ----"
  timeout 1100 python scripts/verify_drive.py
  echo "rc=$?"
  echo "==== follow-up end $(date -u +%FT%TZ) ===="
} >> "$LOG" 2>&1
