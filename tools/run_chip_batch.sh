#!/bin/bash
# Round-3 chip measurement queue — run once the tunnel chip is reachable.
# Each stage logs to /tmp/r3_<stage>.log; stages are ordered so compile-cache
# warming from earlier stages benefits later ones. Safe to re-run; every
# stage is independently timeout-bounded.
set -u
cd /root/repo
run() {
  local name=$1; shift
  local t=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$t" "$@" > "/tmp/r3_$name.log" 2>&1
  local rc=$?
  tail -3 "/tmp/r3_$name.log" | grep -v WARNING
  echo "--- $name rc=$rc"
}

# 1. headline: chained decode + p50 TTFT (also the BENCH_r03 preview)
run bench 2400 python bench.py

# 2. the stacked-decode ablation (answers the 5.75 ms mystery + A/Bs the
#    fused KV-write kernel)
run combo 3500 python -u tools/diag_stacked_combo.py 28 512 full,twostep,noupd,neither

# 3. fused-loop scan decode (tok/s through one executable)
run scan 1800 python bench.py --scan

# 3b. stacked headline A/B: same metric through the scan-over-layers path
#     (reports its own warmup_s — the cold-start story)
run bench_stacked 2400 python bench.py --stacked

# 4. secondary configs
run llama 2400 python tools/bench_models.py llama2-7b-q4_k-stacked
run whisper_s 2400 python tools/bench_models.py whisper-small-q5_0
run whisper_m 2400 python tools/bench_models.py whisper-medium-q5_0

# 5. quality gate TPU kernel-path row
run qrow 1800 python tools/quality_tpu_row.py

# 6. serving benchmark (8 concurrent, mixed prefill/decode)
run serve 3500 python examples/serve.py --bench -np 8

echo "ALL DONE $(date)"
