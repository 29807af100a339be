#!/bin/sh
# Attribute the merge kernel's in-scan time: sweep HMSR_MERGE_DIAG variants
# (env is read at import, so one process per variant) over the merge stage
# of tools/bisect_pipeline.py.
# Usage: sh tools/diag_merge_sweep.sh [HxW] [N] [variants...]
# Results append to tools/diag_merge_sweep.log. Each variant line records
# the exit status; a timeout (rc=124) aborts the sweep — per CLAUDE.md the
# chip needs minutes to recover after a killed TPU process, so continuing
# would just cascade timeouts.
SIZE=${1:-1500x2000}
N=${2:-20}
shift 2 2>/dev/null
VARIANTS=${*:-"baseline noexp notap nocov covfast covnorow"}
LOG=tools/diag_merge_sweep.log
for d in $VARIANTS; do
  [ "$d" = baseline ] && d=""
  echo "=== HMSR_MERGE_DIAG='$d' $SIZE N=$N ===" | tee -a "$LOG"
  out=$(HMSR_MERGE_DIAG="$d" HMSR_DEBUG_TRUNC=1 timeout "${HMSR_SWEEP_TIMEOUT:-1100}" \
        python tools/bisect_pipeline.py merge "$SIZE" "$N" 2>&1)
  rc=$?
  echo "$out" | grep -E "stage=|FAIL|Error" | tee -a "$LOG"
  if [ $rc -ne 0 ]; then
    echo "EXIT=$rc (variant '$d' failed)" | tee -a "$LOG"
    if [ $rc -eq 124 ]; then
      echo "TIMEOUT — aborting sweep (chip needs recovery time)" | tee -a "$LOG"
      exit 124
    fi
  fi
done
