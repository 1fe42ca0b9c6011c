#!/bin/bash
# Round-4 chip measurement queue v2 — run AFTER the path-default fix
# (two-step stacked decode). Stages log to /tmp/r4_<stage>.log.
# Ordered: attribution first (informs kernel work), secondary configs,
# quality row, serving, and the deliberately-cold cold-start A/B LAST
# (it wipes .jax_cache).
set -u
cd /root/repo
run() {
  local name=$1; shift
  local t=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$t" "$@" > "/tmp/r4_$name.log" 2>&1
  local rc=$?
  grep -v WARNING "/tmp/r4_$name.log" | tail -4
  echo "--- $name rc=$rc"
}

# 1. floor attribution: NL slope (fixed vs per-layer) + elementwise share
run diag_floor14 2400 python -u tools/diag_stacked_combo.py 14 512 neither,noelem
run diag_floor28 2400 python -u tools/diag_stacked_combo.py 28 512 neither,noelem,xlaattn

# 2. GEMV kernel ceiling at the decode shape (tile sweep)
run qmm 2400 python -u tools/bench_qmm_variants.py -r 30 -f "rowpair\|ceiling\|production"

# 3. secondary configs (stacked decode now defaults to two-step)
run llama 2800 python tools/bench_models.py llama2-7b-q4_k-stacked
run whisper_s 2400 python tools/bench_models.py whisper-small-q5_0
run whisper_m 2400 python tools/bench_models.py whisper-medium-q5_0

# 4. quality gate TPU kernel-path row
run qrow 1800 python tools/quality_tpu_row.py

# 5. serving benchmark (8 concurrent, mixed prefill/decode)
run serve 3500 python examples/serve.py --bench -np 8

# 6. cold-start story: wipe the compile cache, then unrolled vs stacked
#    warmup_s/TTFT from truly cold (VERDICT r03 item 6). LAST on purpose.
rm -rf /root/repo/.jax_cache
run cold_unrolled 3000 python bench.py
rm -rf /root/repo/.jax_cache
run cold_stacked 3000 python bench.py --stacked

echo "ALL DONE $(date)"
