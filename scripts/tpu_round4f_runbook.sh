#!/bin/bash
# Round-4f TPU runbook:
#   1. server bench re-run — trusted-merge batch dispatch (skips the 512k-row
#      re-sort) + warm persistent compile cache (preload should collapse);
#   2. serve bench re-run — copy_to_host_async at dispatch; preload now
#      reports its upload vs program-warm split.
cd "$(dirname "$0")/.." || exit 1
command -v python >/dev/null && python -c "import numpy" 2>/dev/null \
  || export PATH=/opt/venv/bin:$PATH
mkdir -p bench_logs
LOG=bench_logs/r4f_runbook.log
{
  echo "==== r4f runbook start $(date -u +%FT%TZ) ===="
  echo "---- bench server (trusted merge, warm compile cache) ----"
  timeout 3500 python bench.py --config server --skip-baseline
  echo "rc=$?"
  echo "---- bench serve (async result copy, preload split) ----"
  timeout 3500 python bench.py --config serve --skip-baseline --loops 3
  echo "rc=$?"
  echo "==== r4f runbook end $(date -u +%FT%TZ) ===="
} >> "$LOG" 2>&1
