#!/bin/bash
# Round-4 chip queue v4: stacked-kernel tile sweep end-to-end (the tiles
# the decode scan actually runs, not standalone GEMVs), with the 2048-pad
# LM head. Then the winner feeds bench.py directly.
set -u
cd /root/repo
run() {
  local name=$1; shift
  local t=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$t" "$@" > "/tmp/r4_$name.log" 2>&1
  local rc=$?
  grep -v WARNING "/tmp/r4_$name.log" | tail -14
  echo "--- $name rc=$rc"
}

# end-to-end stacked decode at 28 layers across W4A8 kernel tilings
GGML_TILE_SWEEP="2048x2048,1024x2048,2048x4096,4096x2048,1024x4096" \
  run tilesweep 4800 python -u tools/diag_stacked_combo.py 28 512 noelem,twostep

echo "ALL DONE $(date)"
