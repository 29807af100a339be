#!/bin/sh
# Attribute the merge kernel's in-scan time: sweep HMSR_MERGE_DIAG variants
# (env is read at import, so one process per variant) over the merge stage
# of tools/bisect_pipeline.py. Usage: sh tools/diag_merge_sweep.sh [HxW] [N]
# Results append to tools/diag_merge_sweep.log.
SIZE=${1:-1500x2000}
N=${2:-20}
LOG=tools/diag_merge_sweep.log
for d in "" noexp notap nocov; do
  echo "=== HMSR_MERGE_DIAG='$d' $SIZE N=$N ===" | tee -a "$LOG"
  HMSR_MERGE_DIAG="$d" timeout 580 python tools/bisect_pipeline.py merge "$SIZE" "$N" 2>&1 \
    | grep -E "stage=|FAIL|Error" | tee -a "$LOG"
done
