#!/bin/bash
# Round-4e TPU runbook (run after the r4e serve bench frees the chip):
#   1. persistent-compile-cache probe, twice — does the axon backend
#      serve/write .jax_cache at all? (bench configures it every run but
#      the directory never appears);
#   2. BatchingServer aggregate-throughput bench at the flagship shape
#      (64 concurrent 8-query requests, N=2M, depth-1000);
#   3. end-to-end verify drive on the real chip.
cd "$(dirname "$0")/.." || exit 1
# the build container's bare `python` has no packages; use the venv
command -v python >/dev/null && python -c "import numpy" 2>/dev/null \
  || export PATH=/opt/venv/bin:$PATH
mkdir -p bench_logs
LOG=bench_logs/r4e_runbook.log
{
  echo "==== r4e runbook start $(date -u +%FT%TZ) ===="
  echo "---- compile-cache probe (run 1) ----"
  timeout 900 python scripts/probe_compile_cache.py
  echo "rc=$?"
  echo "---- compile-cache probe (run 2: HIT if persistence works) ----"
  timeout 900 python scripts/probe_compile_cache.py
  echo "rc=$?"
  echo "---- bench server (BatchingServer, 64x8-query requests) ----"
  timeout 3500 python bench.py --config server --skip-baseline
  echo "rc=$?"
  echo "---- verify drive (TPU) ----"
  timeout 1100 python scripts/verify_drive.py
  echo "rc=$?"
  echo "==== r4e runbook end $(date -u +%FT%TZ) ===="
} >> "$LOG" 2>&1
