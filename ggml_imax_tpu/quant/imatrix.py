"""Importance-matrix (imatrix) support.

Reference: ggml_quantize_chunk takes an optional importance matrix
(/root/reference/src/ggml.c:21594, API ggml.h:2246-2254) used by the
imatrix-aware quantizers (quantize_row_q4_0_impl, ggml-quants.c:2871:
per-element weights `qw[j] * sqrt(sigma2 + x[j]^2)` feeding the
error-weighted scale search). Collection of the imatrix itself lives in
llama.cpp's imatrix example — here it is an activation observer hooked into
qmatmul: for each quantized weight it accumulates the mean square of the
activation entries that multiply each contraction row, exactly the
"importance" the quantizers consume.
"""
from __future__ import annotations

import numpy as np

# NB: the ops package re-exports the qmatmul *function* which shadows the
# submodule on attribute lookup; importlib reaches the module itself
import importlib

qmm = importlib.import_module("ggml_imax_tpu.ops.qmatmul")
from . import codecs
from .device import QTensor
from .formats import QK, GGMLType

f32 = np.float32


class ImatrixCollector:
    """Accumulate per-contraction-row activation second moments.

    Usage:
        with ImatrixCollector() as col:
            model.forward(...)            # any number of calls
        imx = col.matrix(params["layers"][0]["q_w"])   # (K,) float32
    """

    def __init__(self):
        self._sums: dict[int, np.ndarray] = {}
        self._counts: dict[int, int] = {}

    def __enter__(self):
        qmm.set_activation_observer(self._observe)
        return self

    def __exit__(self, *exc):
        qmm.set_activation_observer(None)

    def _observe(self, qt: QTensor, x):
        # called at trace time inside jit; pull the value via pure_callback
        # would be heavy — instead observe only concrete (non-traced) calls.
        import jax
        if isinstance(x, jax.core.Tracer):
            return
        xs = np.asarray(x, dtype=f32).reshape(-1, qt.k)
        key = id(qt)
        acc = (xs * xs).sum(axis=0)
        if key in self._sums:
            self._sums[key] += acc
            self._counts[key] += xs.shape[0]
        else:
            self._sums[key] = acc
            self._counts[key] = xs.shape[0]

    def matrix(self, qt: QTensor) -> np.ndarray | None:
        key = id(qt)
        if key not in self._sums:
            return None
        return (self._sums[key] / max(1, self._counts[key])).astype(f32)


def quantize_q4_0_imatrix(x2d: np.ndarray, qw: np.ndarray) -> np.ndarray:
    """quantize_row_q4_0_impl with quant_weights (ggml-quants.c:2871).
    x2d: (n_rows, n_per_row); qw: (n_per_row,). Returns encoded bytes."""
    nr, n = x2d.shape
    assert n % QK == 0 and qw.shape == (n,)
    xb = np.ascontiguousarray(x2d, f32)
    sigma2 = (xb * xb).mean(axis=1)                       # per row
    blocks = xb.reshape(nr, n // QK, QK)
    weight = qw.reshape(1, n // QK, QK) * np.sqrt(
        sigma2[:, None, None] + blocks * blocks)
    flat_x = blocks.reshape(-1, QK)
    flat_w = weight.reshape(-1, QK).astype(f32)
    d, L = codecs._make_qx_quants(flat_x, 8, flat_w)      # L in [0, 15]
    out = np.zeros(len(flat_x), dtype=codecs.BLOCK_DTYPES[GGMLType.Q4_0])
    out["d"] = codecs._fp16(d)
    Lu = L.astype(np.uint8)
    out["qs"] = Lu[:, :QK // 2] | (Lu[:, QK // 2:] << 4)
    return out.view(np.uint8).reshape(-1)


def quantize_rows(x2d: np.ndarray, t: GGMLType,
                  imatrix: np.ndarray | None = None) -> np.ndarray:
    """ggml_quantize_chunk analog (ggml.c:21594): row-parallel quantization
    with optional importance matrix. Falls back to the plain quantizer for
    types without an imatrix-aware path (matching the reference for the
    basic formats it leaves unweighted)."""
    if imatrix is not None and t == GGMLType.Q4_0:
        return quantize_q4_0_imatrix(x2d, imatrix)
    return codecs.quantize(x2d, t)


def quantize_requires_imatrix(t: GGMLType) -> bool:
    """ggml_quantize_requires_imatrix (ggml.c:21586): true for the codebook
    IQ formats. IQ2_XXS/IQ2_XS/IQ3_XXS are decode-only here (their k-means
    grid-search encoders are not implemented)."""
    return t in (GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
                 GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S,
                 GGMLType.IQ1_M)
