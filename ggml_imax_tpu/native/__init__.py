"""Native (C++) host-side codec library: build-on-first-use + ctypes ABI.

The reference keeps all host codec loops in C (src/ggml-quants.c); here the
same loops live in codecs.cpp, compiled once with g++ -O3 -fopenmp into a
shared object cached next to the source (keyed by source hash). The numpy
codecs in quant/codecs.py remain the bit-exact fallback — `lib()` returns
None when no toolchain is available, and GGML_IMAX_TPU_NATIVE=0 disables
native entirely.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from pathlib import Path

_HERE = Path(__file__).parent
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


# -ffp-contract=off: FMA contraction would merge mul+add into one rounding
# (e.g. inside nearest_int's bit trick operand) and break bit-exactness
_FLAGS = "-O3 -march=native -ffp-contract=off -fopenmp -shared -fPIC -fvisibility=hidden"


def _build(src: Path, out: Path) -> bool:
    cmd = ["g++", *_FLAGS.split(), str(src), "-o", str(out)]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if r.returncode != 0:
        import sys
        print(f"[ggml_imax_tpu.native] build failed:\n{r.stderr}",
              file=sys.stderr)
        return False
    return True


def lib():
    """-> ctypes.CDLL of the codec library, or None (fallback to numpy)."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("GGML_IMAX_TPU_NATIVE", "1") == "0":
            return None
        src = _HERE / "codecs.cpp"
        tag = hashlib.sha256(src.read_bytes() + _FLAGS.encode()).hexdigest()[:16]
        so = _HERE / f"_codecs_{tag}.so"
        if not so.exists():
            tmp = so.with_suffix(".so.tmp")
            if not _build(src, tmp):
                return None
            os.replace(tmp, so)
        try:
            cdll = ctypes.CDLL(str(so))
            if cdll.codecs_abi_version() != 1:
                return None
            _LIB = cdll
        except OSError:
            return None
        return _LIB
