"""IQ weight-space encoders (IQ2_XXS/XS/S, IQ3_XXS/S, IQ1_S/M).

Python face of native/iq_encoders.cpp — the codebook grid-search quantizers
of the reference (quantize_iq2_xxs and siblings,
/root/reference/src/ggml-quants.c:12529-14200). The l-value seed tables are
derived here from the formats' normative decode grids (quant/iq_grids.npz,
the ggml-common.h codebooks) and handed to the C++ init, which builds the
exact-match map and nearest-neighbour lists (iq2xs_init_impl /
iq3xs_init_impl analogs, ggml-quants.c:12139/:12933).

These encoders have no numpy fallback: the searches are sequential
coordinate-descent/grid walks, and bit-exactness vs the reference requires
C float semantics. `available()` reports whether the native library built.
"""
from __future__ import annotations

import ctypes
import pathlib

import numpy as np

from ..native import iq_lib
from .formats import GGMLType, row_size

# grid-set ids in iq_encoders.cpp
_GS_IQ2_XXS, _GS_IQ2_XS, _GS_IQ2_S, _GS_IQ1, _GS_IQ3_256, _GS_IQ3_512 = range(6)

_SPEC = {
    # type -> (gridset id, npz grid name, C symbol, qw required)
    GGMLType.IQ2_XXS: (_GS_IQ2_XXS, "iq2xxs_grid", "iq2_xxs_quantize", True),
    GGMLType.IQ2_XS: (_GS_IQ2_XS, "iq2xs_grid", "iq2_xs_quantize", True),
    GGMLType.IQ2_S: (_GS_IQ2_S, "iq2s_grid", "iq2_s_quantize", False),
    GGMLType.IQ3_XXS: (_GS_IQ3_256, "iq3xxs_grid", "iq3_xxs_quantize", False),
    GGMLType.IQ3_S: (_GS_IQ3_512, "iq3s_grid", "iq3_s_quantize", False),
    GGMLType.IQ1_S: (_GS_IQ1, "iq1s_grid", "iq1_s_quantize", True),
    GGMLType.IQ1_M: (_GS_IQ1, "iq1s_grid", "iq1_m_quantize", False),
}

_INITED: set[int] = set()


def _seeds(name: str, grid: np.ndarray) -> np.ndarray:
    """Decode grid -> packed l-value seed table (the kgrid_* constants of
    iq2xs_init_impl/iq3xs_init_impl).

    The decode tables store each lattice coordinate as its DEQUANT magnitude
    (a codebook value, e.g. {8,25,43,62} for iq2_xxs, {-1,0,1} for iq1), while
    the init-time grid works on the quant level l. Both tables share the same
    grid order (the stored grid_index addresses either), so l is the rank of
    the coordinate's value among the grid's sorted unique values."""
    if name.startswith("iq3"):
        b = grid.astype(np.uint32).view(np.uint8).reshape(-1, 4)
        bits, npos = 3, 4
    elif name == "iq1s_grid":
        b = grid.view(np.int8).reshape(-1, 8)
        bits, npos = 2, 8
    else:
        b = grid.view(np.uint8).reshape(-1, 8)
        bits, npos = 2, 8
    vals = np.unique(b)
    assert len(vals) <= (1 << bits), (name, vals)
    l = np.searchsorted(vals, b).astype(np.uint16)
    return (l << (bits * np.arange(npos, dtype=np.uint16))).sum(
        1, dtype=np.uint16)


def available() -> bool:
    return iq_lib() is not None


def _ensure_init(t: GGMLType):
    lib = iq_lib()
    if lib is None:
        raise RuntimeError("native IQ encoder library unavailable "
                           "(no C++ toolchain or GGML_IMAX_TPU_NATIVE=0)")
    gs, grid_name, _, _ = _SPEC[t]
    if gs in _INITED:
        return lib
    z = np.load(pathlib.Path(__file__).parent / "iq_grids.npz")
    seeds = np.ascontiguousarray(_seeds(grid_name, z[grid_name]))
    lib.iq_init.argtypes = [ctypes.c_int, ctypes.c_void_p, ctypes.c_int]
    rc = lib.iq_init(gs, seeds.ctypes.data, len(seeds))
    assert rc == 0, (t, rc)
    _INITED.add(gs)
    return lib


def quantize_iq(x2d: np.ndarray, t: GGMLType,
                qw: np.ndarray | None = None) -> np.ndarray:
    """Encode a (nrow, n) f32 matrix to raw IQ blocks -> (nrow, row_bytes)
    uint8. `qw` is the per-column importance row (imatrix), required for
    IQ2_XXS/IQ2_XS/IQ1_S (ggml_quantize_requires_imatrix, ggml.c:21586)."""
    lib = _ensure_init(t)
    _, _, sym, qw_required = _SPEC[t]
    x2d = np.ascontiguousarray(x2d, dtype=np.float32)
    nrow, n = x2d.shape
    assert n % 256 == 0, n
    if qw is None and qw_required:
        raise ValueError(f"{t.name} requires an importance matrix "
                         "(ggml_quantize_requires_imatrix)")
    qw_ptr = None
    if qw is not None:
        qw = np.ascontiguousarray(qw, dtype=np.float32)
        assert qw.shape == (n,), qw.shape
        qw_ptr = qw.ctypes.data
    out = np.zeros((nrow, row_size(t, n)), dtype=np.uint8)
    fn = getattr(lib, sym)
    fn.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                   ctypes.c_int64, ctypes.c_void_p]
    fn(x2d.ctypes.data, out.ctypes.data, nrow, n, qw_ptr)
    return out
