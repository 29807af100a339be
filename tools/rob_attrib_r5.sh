#!/bin/bash
# Round-5 robustness-stage internal attribution (VERDICT r04 next-step #2).
#
# One process per HMSR_ROB_TRUNC variant (the knob is read once at config
# time), 12MP/Ts=16 coherent frames, via tools/bisect_pipeline.py's "rob"
# stage. Deltas of the steady times:
#   align          -> cumulative through alignment (baseline)
#   trunc1 - align -> guide image + 3x3 local stats
#   trunc2 - trunc1-> Pallas Dodgson upscale-warp of the stats
#   trunc3 - trunc2-> noise-model distance + S map + threshold chain
#   full  - trunc3 -> 5x5 local min
# The chip is single-tenant: runs are strictly sequential.
set -u
cd "$(dirname "$0")/.."
LOG=tools/rob_attrib_r5.log
echo "=== r5 robustness attribution, 12MP/Ts=16 coherent frames, $(date)" | tee "$LOG"

run() { # name, extra env...
  local name=$1; shift
  echo "--- $name" | tee -a "$LOG"
  env "$@" timeout 2400 python tools/bisect_pipeline.py rob 3000x4000 20 \
    2>&1 | grep -v "^WARNING" | tee -a "$LOG"
}

echo "--- align baseline + full rob" | tee -a "$LOG"
timeout 3600 python tools/bisect_pipeline.py align,rob 3000x4000 20 \
  2>&1 | grep -v "^WARNING" | tee -a "$LOG"
run trunc1 HMSR_ROB_TRUNC=1
run trunc2 HMSR_ROB_TRUNC=2
run trunc3 HMSR_ROB_TRUNC=3
echo "=== done $(date)" | tee -a "$LOG"
