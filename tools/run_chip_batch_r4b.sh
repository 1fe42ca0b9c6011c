#!/bin/bash
# Round-4 chip queue v3: GEMV tile sweeps at the true stacked decode
# shapes, whisper re-measure (encoder timing fix), 117M-proxy training
# for the mid-geometry quality gate, then the TPU quality row.
set -u
cd /root/repo
run() {
  local name=$1; shift
  local t=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$t" "$@" > "/tmp/r4_$name.log" 2>&1
  local rc=$?
  grep -v WARNING "/tmp/r4_$name.log" | tail -6
  echo "--- $name rc=$rc"
}

# GEMV kernel tile sweep at the reference shape and BOTH production
# stacked shapes (qkvf: K=4096 N=28672; of: K=20480 N=4096)
run qmm_ref 2400 python -u tools/bench_qmm_variants.py -r 30 -f "rowpair|ceiling|w4a8|production"
GGML_QMM_K=4096 GGML_QMM_N=28672 run qmm_qkvf 2400 python -u tools/bench_qmm_variants.py -r 30 -f "rowpair|ceiling|w4a8-rp|production"
GGML_QMM_K=20480 GGML_QMM_N=4096 run qmm_of 2400 python -u tools/bench_qmm_variants.py -r 30 -f "rowpair|ceiling|w4a8-rp|production"

# whisper with the fixed (fetch-forced) encoder timing
run whisper_s2 2400 python tools/bench_models.py whisper-small-q5_0
run whisper_m2 2400 python tools/bench_models.py whisper-medium-q5_0

# train the 117M-scale quality-gate proxy on the chip
GGML_QGATE_PLATFORM=default run qgate_mid_train 3600 python tools/quality_gate.py --geometry mid --train-only

echo "ALL DONE $(date)"
