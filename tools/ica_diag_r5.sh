#!/bin/bash
# Round-5 GN-step kernel per-program attribution (VERDICT r04 next-step #3).
#
# One process per HMSR_ICA_DIAG variant (the knob is read once at import),
# 12MP/Ts=16 coherent frames, via tools/bisect_pipeline.py's "align" stage.
# Every variant zeroes the flow UPDATE (runtime zero), freezing the flow at
# its block-matching seed, so all variants see identical coherent DMA
# patterns; checksums differ from production by design. Cumulative strip:
#   zero      - full kernel work, zeroed update (diag baseline)
#   notap     - + skip tap matmuls / bilinear / residual reductions
#   norealign - + skip realign matmuls / dynamic slices
#   nodma     - + skip the group-window DMA
# Deltas: zero-notap = tap phase, notap-norealign = realign phase,
# norealign-nodma = group DMA, nodma = launch/grid/params/out floor.
# The diag covers the GN-step kernels (L2 + L3: 6 launches/frame); the BM
# kernels and the fused L0/L1 kernels run full in every variant.
set -u
cd "$(dirname "$0")/.."
LOG=tools/ica_diag_r5.log
echo "=== r5 ICA GN-step attribution, 12MP/Ts=16 coherent frames, $(date)" | tee "$LOG"

run() {
  echo "--- $1" | tee -a "$LOG"
  env HMSR_DEBUG_TRUNC=1 HMSR_ICA_DIAG=$2 \
    timeout 3600 python tools/bisect_pipeline.py align 3000x4000 20 \
    2>&1 | grep -v "^WARNING" | tee -a "$LOG"
}

run zero zero
run notap notap
run norealign norealign
run nodma nodma
echo "=== done $(date)" | tee -a "$LOG"
