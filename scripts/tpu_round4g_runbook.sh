#!/bin/bash
# Round-4g TPU runbook:
#   1. serve bench with the two-phase refine (bf16 preselect + exact
#      rescore) — the streaming scan drops from 3 bf16 passes to 1;
#   2. TPU verify drive (includes the new refine check #10).
cd "$(dirname "$0")/.." || exit 1
command -v python >/dev/null && python -c "import numpy" 2>/dev/null \
  || export PATH=/opt/venv/bin:$PATH
mkdir -p bench_logs
LOG=bench_logs/r4g_runbook.log
{
  echo "==== r4g runbook start $(date -u +%FT%TZ) ===="
  echo "---- bench serve --refine 22 ----"
  timeout 3500 python bench.py --config serve --refine 22 --skip-baseline
  echo "rc=$?"
  echo "---- verify drive (TPU) ----"
  timeout 1100 python scripts/verify_drive.py
  echo "rc=$?"
  echo "==== r4g runbook end $(date -u +%FT%TZ) ===="
} >> "$LOG" 2>&1
