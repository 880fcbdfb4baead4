#!/bin/bash
# Round-4o TPU runbook: re-capture the bench rows affected by the
# pairwise stream kernel (now serving every precision tier on 2D
# tables):
#   1. serve headline (fast preselect 14.2 -> 11.9 ms device);
#   2. rerank at the default "high" tier (scan ~42 -> 29.1 ms, now
#      true fp32);
#   3. rerank at "exact" (scan ~80 -> 29.1 ms — the big one).
cd "$(dirname "$0")/.." || exit 1
command -v python >/dev/null && python -c "import numpy" 2>/dev/null \
  || export PATH=/opt/venv/bin:$PATH
mkdir -p bench_logs
LOG=bench_logs/r4o_runbook.log
{
  echo "==== r4o runbook start $(date -u +%FT%TZ) ===="
  echo "---- bench serve --refine 22 ----"
  timeout 3500 python bench.py --config serve --refine 22 --skip-baseline
  echo "rc=$?"
  echo "---- bench rerank (high) ----"
  timeout 3500 python bench.py --config rerank --skip-baseline
  echo "rc=$?"
  echo "---- bench rerank --precision exact ----"
  timeout 3500 python bench.py --config rerank --precision exact --skip-baseline
  echo "rc=$?"
  echo "==== r4o runbook end $(date -u +%FT%TZ) ===="
} >> "$LOG" 2>&1
