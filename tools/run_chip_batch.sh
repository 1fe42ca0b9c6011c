#!/bin/bash
# Chip measurement queue — THE one entry point for real-TPU measurements.
# (VERDICT r04 item 9: the r3/r4 one-shot queue scripts are consolidated
# here; tools/MEASUREMENTS.md is the manifest of what each stage measures
# and where its result lands.)
#
# Usage:
#   tools/run_chip_batch.sh                 # standard round queue
#   tools/run_chip_batch.sh bench llama     # just the named stages
#   tools/run_chip_batch.sh --list          # print the stage table
#
# Each stage logs to /tmp/chip_<stage>.log, is timeout-bounded, and is
# independent (safe to re-run). Stages that wipe .jax_cache say so and
# never run unless named explicitly.
set -u
cd /root/repo

run() {
  local name=$1; shift
  local t=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$t" "$@" > "/tmp/chip_$name.log" 2>&1
  local rc=$?
  grep -v WARNING "/tmp/chip_$name.log" | tail -6
  echo "--- $name rc=$rc"
}

# stage <name>: one measurement; see tools/MEASUREMENTS.md for the doc row
stage() {
  local name=$1
  case "$name" in
    bench)          run bench 3600 python -u bench.py ;;
    bench_unrolled) run bench_unrolled 3600 python -u bench.py --unrolled ;;
    llama)          run llama 2800 python tools/bench_models.py llama2-7b-q4_k-stacked ;;
    whisper_s)      run whisper_s 2400 python tools/bench_models.py whisper-small-q5_0 ;;
    whisper_m)      run whisper_m 2400 python tools/bench_models.py whisper-medium-q5_0 ;;
    whisper_rtf)    run whisper_rtf 2400 python tools/bench_models.py whisper-small-rtf ;;
    qrow)           run qrow 3600 python -u tools/quality_tpu_row.py ;;
    qrow_mid)       run qrow_mid 3600 python -u tools/quality_tpu_row.py --mid ;;
    serve)          run serve 3500 python examples/serve.py --bench -np 8 ;;
    serve_steady)   run serve_steady 3500 python examples/serve.py --bench -np 8 --n_predict 256 --steady ;;
    prefill_diag)   run prefill_diag 3600 python -u tools/diag_prefill.py ;;
    decode_diag)    run decode_diag 3500 python -u tools/diag_stacked_combo.py 28 512 neither,noelem,twostep ;;
    qmm)            run qmm 2400 python -u tools/bench_qmm_variants.py -r 30 -f "rowpair|ceiling|w4a8|production" ;;
    hbm)            run hbm 1200 python -u tools/bench_hbm.py ;;
    gpt2)           run gpt2_117m 2400 python tools/bench_models.py gpt2-117m-q4_0
                    run gpt2_1558m_q8 2400 python tools/bench_models.py gpt2-1558m-q8_0
                    run gpt2_1558m_q5k 2400 python tools/bench_models.py gpt2-1558m-q5_k ;;
    gpt2_mid)       run gpt2_345m 2400 python tools/bench_models.py gpt2-345m-q4_0
                    run gpt2_774m 2400 python tools/bench_models.py gpt2-774m-q4_0 ;;
    batch)          run batch4 2400 python -u bench.py --batch=4
                    run batch8 2400 python -u bench.py --batch=8 --kv=q8_0 ;;
    qgate_mid_train) GGML_QGATE_PLATFORM=default run qgate_mid_train 3600 \
                       python tools/quality_gate.py --geometry mid --train-only ;;
    # train the proxy ON the chip (CPU-infeasible), but eval on CPU — the
    # 22 whole-model PPL rows are tunnel-wait-bound on the chip (measured
    # ~10 min/format r05) and deterministic on CPU anyway
    qgate_mid)      GGML_QGATE_PLATFORM=default run qgate_mid_train 3600 \
                       python tools/quality_gate.py --geometry mid --train-only
                    run qgate_mid 7200 \
                       python -u tools/quality_gate.py --geometry mid ;;
    # cold-start A/B: wipes the compile cache — only runs when named.
    cold)           rm -rf /root/repo/.jax_cache
                    run cold_bench 3000 python bench.py ;;
    *) echo "unknown stage: $name (see --list)"; return 1 ;;
  esac
}

STANDARD="bench llama whisper_s whisper_rtf qrow serve_steady"

if [ "${1:-}" = "--list" ]; then
  sed -n 's/^    \([a-z_]*\)) .*/\1/p' "$0" | sort -u
  echo "(default queue: $STANDARD)"
  exit 0
fi

for s in ${*:-$STANDARD}; do stage "$s"; done
echo "ALL DONE $(date)"
