#!/usr/bin/env bash
# One-command CI — the analog of the reference's ci/run.sh
# (/root/reference/ci/run.sh:90-158: build, test suite, fixed-seed e2e model
# runs, bench smoke). Stages:
#
#   1. native build        g++ the C++ codec/encoder libraries from scratch
#   2. sanitizers          re-build them under ASan+UBSan and run the native
#                          test files through them (the reference wires
#                          TSan/ASan/UBSan into every test,
#                          CMakeLists.txt:33-35)
#   3. test suite          full pytest on CPU with 8 virtual devices;
#                          includes the fixed-seed e2e generation goldens
#                          (tests/test_examples_cli.py) and the whisper
#                          golden transcript (tests/test_whisper.py)
#   4. multichip dryrun    tp/dp/pp/sp shardings + fused-kernel and batched
#                          steps on an 8-device virtual mesh
#   5. bench smoke         one JSON line on the real TPU (skipped off-TPU)
#
# Usage: ci/run.sh [--fast]   (--fast skips stages 2 and 5)
set -euo pipefail
cd "$(dirname "$0")/.."
FAST="${1:-}"

echo "== [1/5] native build =="
GGML_IMAX_TPU_NATIVE=1 python - <<'EOF'
from ggml_imax_tpu.native import lib, iq_lib
assert lib() is not None, "codecs.cpp failed to build"
assert iq_lib() is not None, "iq_encoders.cpp failed to build"
print("native libraries ok")
EOF

if [ "$FAST" != "--fast" ]; then
  echo "== [2/5] sanitizers (ASan+UBSan) =="
  ASAN_RT="$(g++ -print-file-name=libasan.so)"
  GGML_IMAX_TPU_NATIVE_FLAGS="-fsanitize=address,undefined -fno-sanitize-recover=all" \
    LD_PRELOAD="$ASAN_RT" \
    ASAN_OPTIONS="detect_leaks=0:abort_on_error=1" \
    python -m pytest tests/test_native_codecs.py tests/test_iq_encoders.py \
      tests/test_imatrix_quant.py -q -p no:cacheprovider
else
  echo "== [2/5] sanitizers skipped (--fast) =="
fi

echo "== [3/5] test suite =="
python -m pytest tests/ -x -q

echo "== [4/5] multichip dryrun =="
JAX_PLATFORMS=cpu python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

echo "== [5/5] bench smoke =="
if [ "$FAST" != "--fast" ] && \
   timeout 180 python -c "import jax; raise SystemExit(0 if jax.devices()[0].platform=='tpu' else 1)" \
   2>/dev/null; then
  python bench.py
else
  echo "no TPU (or --fast): bench skipped"
fi

echo "CI GREEN"
