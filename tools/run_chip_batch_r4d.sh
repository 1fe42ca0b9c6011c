#!/bin/bash
# Round-4 chip queue v5: mid-geometry quality gate eval + TPU kernel-path
# quality row (VERDICT r03 item 4), then the final headline bench on the
# r04 default path (stacked two-step + fused 64-step loop + 2048 LM pad).
set -u
cd /root/repo
run() {
  local name=$1; shift
  local t=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$t" "$@" > "/tmp/r4_$name.log" 2>&1
  local rc=$?
  grep -v WARNING "/tmp/r4_$name.log" | tail -12
  echo "--- $name rc=$rc"
}

# mid-geometry (117M-scale) quality gate: trained on chip earlier this
# round; eval all formats on the chip + write the TPU-row bundle at mid
# geometry
GGML_QGATE_PLATFORM=default run qgate_mid 5400 python -u tools/quality_gate.py --geometry mid

# the kernel-path quality row (vec_dot contract at whole-model scale)
run qrow2 2400 python -u tools/quality_tpu_row.py

# final headline bench, r04 default path
run bench_final 3600 python -u bench.py

# unrolled A/B on the same code
run bench_unrolled 3600 python -u bench.py --unrolled

echo "ALL DONE $(date)"
