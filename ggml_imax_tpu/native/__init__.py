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
    cmd = ["g++", *_flags().split(), str(src), "-o", str(out)]
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


def _flags() -> str:
    """Build flags; GGML_IMAX_TPU_NATIVE_FLAGS appends extra ones (the CI
    sanitizer job adds -fsanitize=address,undefined — ci/run.sh)."""
    return (_FLAGS + " "
            + os.environ.get("GGML_IMAX_TPU_NATIVE_FLAGS", "")).strip()


def _load(stem: str, abi_symbol: str):
    if os.environ.get("GGML_IMAX_TPU_NATIVE", "1") == "0":
        return None
    src = _HERE / f"{stem}.cpp"
    tag = hashlib.sha256(src.read_bytes() + _flags().encode()).hexdigest()[:16]
    so = _HERE / f"_{stem}_{tag}.so"
    if not so.exists():
        tmp = so.with_suffix(".so.tmp")
        if not _build(src, tmp):
            return None
        os.replace(tmp, so)
    try:
        cdll = ctypes.CDLL(str(so))
        if getattr(cdll, abi_symbol)() != 1:
            return None
        return cdll
    except OSError:
        return None


def lib():
    """-> ctypes.CDLL of the codec library, or None (fallback to numpy)."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        _LIB = _load("codecs", "codecs_abi_version")
        return _LIB


_IQ_LIB = None
_IQ_TRIED = False


def iq_lib():
    """-> ctypes.CDLL of the IQ encoder library (iq_encoders.cpp), or None.

    Separate object from lib(): the IQ grid-search encoders (the analog of
    quantize_iq2_xxs & siblings, /root/reference/src/ggml-quants.c:12529+)
    carry their own grid/neighbour state and have no numpy fallback — the
    searches are inherently sequential."""
    global _IQ_LIB, _IQ_TRIED
    if _IQ_LIB is not None or _IQ_TRIED:
        return _IQ_LIB
    with _LOCK:
        if _IQ_LIB is not None or _IQ_TRIED:
            return _IQ_LIB
        _IQ_TRIED = True
        _IQ_LIB = _load("iq_encoders", "iq_abi_version")
        return _IQ_LIB
