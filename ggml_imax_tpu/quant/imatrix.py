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
from .formats import QK, QK_K, GGMLType

f32 = np.float32


def name_params(params, prefix: str = ""):
    """Assign path-derived names to every QTensor leaf of a params pytree
    (dicts/lists, the loaders' shape). Names make imatrix collection work
    through jit (the collector keys on them — llama.cpp's imatrix example
    keys on tensor names the same way)."""
    from dataclasses import replace as _replace

    def walk(d, path):
        if isinstance(d, dict):
            return {k: walk(v, f"{path}.{k}" if path else k)
                    for k, v in d.items()}
        if isinstance(d, list):
            return [walk(v, f"{path}[{i}]") for i, v in enumerate(d)]
        if isinstance(d, QTensor) and not d.name:
            return _replace(d, name=path)
        return d

    return walk(params, prefix)


class ImatrixCollector:
    """Accumulate per-contraction-row activation second moments.

    Usage:
        with ImatrixCollector() as col:
            model.forward(...)            # eager OR jitted calls
        imx = col.matrix(params["layers"][0]["q_w"])   # (K,) float32

    Under jit the activation is a tracer at observe time; the collector
    plants a `jax.debug.callback` so the concrete value is accumulated on
    the host at run time. Jitted collection requires *named* QTensors
    (quant.device.QTensor.name, see `name_params`) because Python object
    identity does not survive tracing; unnamed tensors are collected only
    in eager calls. The callback stays baked into the compiled function, so
    it checks `_active` — accumulation stops when the context exits.
    """

    def __init__(self):
        self._sums: dict[object, np.ndarray] = {}
        self._counts: dict[object, int] = {}
        self._active = False
        self._warned_unnamed = False

    def __enter__(self):
        self._active = True
        qmm.set_activation_observer(self._observe)
        return self

    def __exit__(self, *exc):
        self._active = False
        qmm.set_activation_observer(None)

    def _accumulate(self, key, x):
        if not self._active:
            return
        xs = np.asarray(x, dtype=f32)
        acc = (xs * xs).sum(axis=0)
        if key in self._sums:
            self._sums[key] += acc
            self._counts[key] += xs.shape[0]
        else:
            self._sums[key] = acc
            self._counts[key] = xs.shape[0]

    def _observe(self, qt: QTensor, x):
        import jax
        if isinstance(x, jax.core.Tracer):
            if not qt.name:
                if not self._warned_unnamed:
                    self._warned_unnamed = True
                    import warnings
                    warnings.warn(
                        "ImatrixCollector: unnamed QTensor inside jit — "
                        "skipped. Wrap params with quant.imatrix.name_params "
                        "to collect through jitted forwards.")
                return
            key = qt.name
            jax.debug.callback(
                lambda v, key=key: self._accumulate(key, v),
                x.reshape(-1, qt.k))
            return
        self._accumulate(qt.name or id(qt), np.asarray(x).reshape(-1, qt.k))

    def matrix(self, qt: QTensor) -> np.ndarray | None:
        key = qt.name or id(qt)
        sums = self._sums.get(key)
        if sums is None and qt.name:
            sums = self._sums.get(id(qt))
        if sums is None:
            return None
        cnt = self._counts[key if key in self._sums else id(qt)]
        return (sums / max(1, cnt)).astype(f32)

    def matrices(self) -> dict:
        """All collected imatrix rows keyed by QTensor name (jit-collected
        entries always have names)."""
        return {k: (self._sums[k] / max(1, self._counts[k])).astype(f32)
                for k in self._sums}


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


def _row_weighted(x2d: np.ndarray, qw: np.ndarray, group: int):
    """weight = qw * sqrt(sigma2 + x^2) with per-ROW sigma2 = mean(x^2)
    (the basic-format imatrix weighting, quantize_row_q4_0_impl
    ggml-quants.c:2871-2884). Returns (flat_x, flat_w) at (rows*blocks, group)."""
    nr, n = x2d.shape
    xb = np.ascontiguousarray(x2d, f32)
    sigma2 = (codecs._seqsum(xb * xb) / f32(n)).astype(f32)
    blocks = xb.reshape(nr, n // group, group)
    weight = (qw.reshape(1, n // group, group)
              * np.sqrt(sigma2[:, None, None] + blocks * blocks)).astype(f32)
    return blocks.reshape(-1, group), weight.reshape(-1, group)


def quantize_q4_1_imatrix(x2d: np.ndarray, qw: np.ndarray) -> np.ndarray:
    """quantize_row_q4_1_impl (ggml-quants.c:2914): weighted affine search
    via make_qkx3_quants (== make_qkx2 with weights, ggml-quants.c:1496)."""
    flat_x, flat_w = _row_weighted(x2d, np.ascontiguousarray(qw, f32), QK)
    d, mins, L = codecs._make_qkx2_quants(flat_x, flat_w, 15, -0.9, 0.05, 36, False)
    out = np.zeros(len(flat_x), dtype=codecs.BLOCK_DTYPES[GGMLType.Q4_1])
    out["d"] = codecs._fp16(d)
    # qkx3's the_min is -min; the block stores the actual (negative) min
    # (ggml-quants.c:2949: y[ib].m = FP16(-min))
    out["m"] = codecs._fp16(-mins)
    Lu = L.astype(np.uint8)
    out["qs"] = Lu[:, :QK // 2] | (Lu[:, QK // 2:] << 4)
    return out.view(np.uint8).reshape(-1)


def quantize_q5_0_imatrix(x2d: np.ndarray, qw: np.ndarray) -> np.ndarray:
    """quantize_row_q5_0_impl (ggml-quants.c:2959)."""
    flat_x, flat_w = _row_weighted(x2d, np.ascontiguousarray(qw, f32), QK)
    d, L = codecs._make_qx_quants(flat_x, 16, flat_w)    # L in [0, 31]
    out = np.zeros(len(flat_x), dtype=codecs.BLOCK_DTYPES[GGMLType.Q5_0])
    out["d"] = codecs._fp16(d)
    qs, qh = codecs._pack_q5(L)
    out["qs"] = qs
    out["qh"] = qh
    return out.view(np.uint8).reshape(-1)


def quantize_q5_1_imatrix(x2d: np.ndarray, qw: np.ndarray) -> np.ndarray:
    """quantize_row_q5_1_impl (ggml-quants.c:3014)."""
    flat_x, flat_w = _row_weighted(x2d, np.ascontiguousarray(qw, f32), QK)
    d, mins, L = codecs._make_qkx2_quants(flat_x, flat_w, 31, -0.9, 0.05, 36, False)
    out = np.zeros(len(flat_x), dtype=codecs.BLOCK_DTYPES[GGMLType.Q5_1])
    out["d"] = codecs._fp16(d)
    out["m"] = codecs._fp16(-mins)       # actual (negative) min, see q4_1
    qs, qh = codecs._pack_q5(L)
    out["qs"] = qs
    out["qh"] = qh
    return out.view(np.uint8).reshape(-1)


def _superblock_weighted(x2d: np.ndarray, qw: np.ndarray, group: int,
                         sigma_mul: float):
    """K-quant imatrix weighting: per-256-super-block sigma2 = sigma_mul *
    mean(x^2), weight = qw * sqrt(sigma2 + x^2), reduced per `group`-sized
    sub-block. Returns (xb (nblk, 256), sub_x, sub_w at (nblk*nsub, group),
    sw (nblk, nsub))."""
    nr, n = x2d.shape
    nblk = nr * (n // QK_K)
    xb = np.ascontiguousarray(x2d, f32).reshape(nblk, QK_K)
    qwb = np.tile(np.ascontiguousarray(qw, f32).reshape(n // QK_K, QK_K), (nr, 1))
    sigma2 = (f32(sigma_mul) * codecs._seqsum(xb * xb) / f32(QK_K)).astype(f32)
    weights = (qwb * np.sqrt(sigma2[:, None] + xb * xb)).astype(f32)
    nsub = QK_K // group
    sub_w = weights.reshape(nblk * nsub, group)
    sw = codecs._seqsum(sub_w).reshape(nblk, nsub)
    return xb, xb.reshape(nblk * nsub, group), sub_w, sw


def quantize_q2_K_imatrix(x2d: np.ndarray, qw: np.ndarray) -> np.ndarray:
    """quantize_row_q2_K_impl (ggml-quants.c:1651): qkx3 per 16-sub-block,
    make_qp_quants super-scales, requantize against stored fp16 scales."""
    xb, sub_x, sub_w, sw = _superblock_weighted(x2d, qw, 16, 1.0)
    nblk = len(xb)
    scales, mins, L = codecs._make_qkx2_quants(sub_x, sub_w, 3, -0.9, 0.05, 36, False)
    scales = scales.reshape(nblk, 16)
    mins = mins.reshape(nblk, 16)
    L = L.reshape(nblk, QK_K)

    dm, Ls = codecs._make_qp_quants(scales, 15, sw)
    mm, Lm = codecs._make_qp_quants(mins, 15, sw)
    packed_scales = (Ls.astype(np.uint8) | (Lm.astype(np.uint8) << 4))

    d16 = codecs._fp16_f32(dm)
    dmin16 = codecs._fp16_f32(mm)
    dl_e = np.repeat(d16[:, None] * Ls.astype(f32), 16, axis=1)
    ml_e = np.repeat(dmin16[:, None] * Lm.astype(f32), 16, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        l_new = np.clip(codecs._nearest_int((xb + ml_e) / dl_e), 0, 3)
    L = np.where(dl_e != 0, l_new, L)

    out = np.zeros(nblk, dtype=codecs.BLOCK_DTYPES[GGMLType.Q2_K])
    out["scales"] = packed_scales
    out["qs"] = codecs._pack_2bit_fast(L)
    out["d"] = codecs._fp16(dm)
    out["dmin"] = codecs._fp16(mm)
    return out.view(np.uint8).reshape(-1)


def quantize_q3_K_imatrix(x2d: np.ndarray, qw: np.ndarray) -> np.ndarray:
    """quantize_row_q3_K_impl (ggml-quants.c:1967): weighted make_qx_quants
    per 16-sub-block AND for the 6-bit super-scales (weights = sub-block
    weight sums)."""
    xb, sub_x, sub_w, sw = _superblock_weighted(x2d, qw, 16, 2.0)
    nblk = len(xb)
    scales, L = codecs._make_qx_quants(sub_x, 4, sub_w)
    scales = scales.reshape(nblk, 16)
    L = L.reshape(nblk, QK_K)                   # [0, 7]

    d, Ls6 = codecs._make_qx_quants(scales, 32, sw)   # L in [0, 63]
    packed_scales = codecs._pack_q3k_scales(Ls6)

    sc = codecs._unpack_q3k_scales(packed_scales).astype(f32)
    d16 = codecs._fp16_f32(d)
    dl_e = np.repeat(d16[:, None] * sc, 16, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        l_new = np.clip(codecs._nearest_int(xb / dl_e), -4, 3) + 4
    L = np.where(dl_e != 0, l_new, L)

    hibit = L > 3
    L2 = np.where(hibit, L - 4, L)
    hmask = np.zeros((nblk, QK_K // 8), dtype=np.uint8)
    for bit in range(8):
        sel = codecs._Q3_HBIT == bit
        hmask[:, codecs._Q3_HBYTE[sel]] |= hibit[:, sel].astype(np.uint8) << bit

    out = np.zeros(nblk, dtype=codecs.BLOCK_DTYPES[GGMLType.Q3_K])
    out["hmask"] = hmask
    out["qs"] = codecs._pack_2bit_fast(L2)
    out["scales"] = packed_scales
    out["d"] = codecs._fp16(d)
    return out.view(np.uint8).reshape(-1)


def _quantize_q45_K_imatrix(x2d: np.ndarray, qw: np.ndarray, nmax: int):
    """Shared q4_K/q5_K imatrix body (quantize_row_q4_K_impl
    ggml-quants.c:2226 / q5_K :2515): qkx3 per 32-sub-block with
    weights = qw*sqrt(sigma2 + x^2), sigma2 = 2*mean(x^2) per super-block;
    super-scales via make_qp_quants weighted by sub-block weight sums."""
    xb, sub_x, sub_w, sw = _superblock_weighted(x2d, qw, 32, 2.0)
    nblk = len(xb)
    scales, mins, L = codecs._make_qkx2_quants(sub_x, sub_w, nmax, -0.9, 0.05,
                                               36, False)
    scales = scales.reshape(nblk, 8)
    mins = mins.reshape(nblk, 8)
    L = L.reshape(nblk, QK_K)

    d, Ls = codecs._make_qp_quants(scales, 63, sw)
    dmin, Lm = codecs._make_qp_quants(mins, 63, sw)
    packed = codecs._pack_scale_min_k4(Ls.astype(np.uint8), Lm.astype(np.uint8))

    d6, m6 = codecs._unpack_scale_min_k4(packed)
    d16 = codecs._fp16_f32(d)[:, None]
    dmin16 = codecs._fp16_f32(dmin)[:, None]
    dl = np.repeat(d16 * d6.astype(f32), 32, axis=1)
    ml = np.repeat(dmin16 * m6.astype(f32), 32, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        l_new = np.clip(codecs._nearest_int((xb + ml) / dl), 0, nmax)
    L = np.where(dl != 0, l_new, L)
    return nblk, d, dmin, packed, L


def quantize_q4_K_imatrix(x2d: np.ndarray, qw: np.ndarray) -> np.ndarray:
    nblk, d, dmin, packed, L = _quantize_q45_K_imatrix(x2d, qw, 15)
    out = np.zeros(nblk, dtype=codecs.BLOCK_DTYPES[GGMLType.Q4_K])
    out["d"] = codecs._fp16(d)
    out["dmin"] = codecs._fp16(dmin)
    out["scales"] = packed
    out["qs"] = codecs._pack_4bit_k(L)
    return out.view(np.uint8).reshape(-1)


def quantize_q5_K_imatrix(x2d: np.ndarray, qw: np.ndarray) -> np.ndarray:
    nblk, d, dmin, packed, L = _quantize_q45_K_imatrix(x2d, qw, 31)
    hibit = L > 15
    L4 = np.where(hibit, L - 16, L)
    qh = np.zeros((nblk, QK_K // 8), dtype=np.uint8)
    E = codecs._E
    for bit in range(8):
        sel = codecs._Q5K_HBIT == bit
        qh[:, (E % 32)[sel]] |= hibit[:, sel].astype(np.uint8) << bit
    out = np.zeros(nblk, dtype=codecs.BLOCK_DTYPES[GGMLType.Q5_K])
    out["d"] = codecs._fp16(d)
    out["dmin"] = codecs._fp16(dmin)
    out["scales"] = packed
    out["qh"] = qh
    out["qs"] = codecs._pack_4bit_k(L4)
    return out.view(np.uint8).reshape(-1)


def quantize_q6_K_imatrix(x2d: np.ndarray, qw: np.ndarray) -> np.ndarray:
    """quantize_row_q6_K_impl (ggml-quants.c:2766): the imatrix entries are
    the make_qx_quants weights directly (no sigma2 mixing)."""
    nr, n = x2d.shape
    qwb = np.tile(np.ascontiguousarray(qw, f32).reshape(1, n), (nr, 1))
    return codecs.quantize_q6_K(np.ascontiguousarray(x2d, f32).reshape(-1),
                                qwb.reshape(-1))


def quantize_iq4_nl_imatrix(x2d: np.ndarray, qw: np.ndarray) -> np.ndarray:
    nr, n = x2d.shape
    qwb = np.tile(np.ascontiguousarray(qw, f32).reshape(1, n), (nr, 1))
    return codecs.quantize_iq4_nl(np.ascontiguousarray(x2d, f32).reshape(-1),
                                  qw=qwb.reshape(-1))


def quantize_iq4_xs_imatrix(x2d: np.ndarray, qw: np.ndarray) -> np.ndarray:
    nr, n = x2d.shape
    qwb = np.tile(np.ascontiguousarray(qw, f32).reshape(1, n), (nr, 1))
    return codecs.quantize_iq4_xs(np.ascontiguousarray(x2d, f32).reshape(-1),
                                  qw=qwb.reshape(-1))


_IMATRIX_QUANTIZERS = {
    GGMLType.Q4_0: quantize_q4_0_imatrix,
    GGMLType.Q4_1: quantize_q4_1_imatrix,
    GGMLType.Q5_0: quantize_q5_0_imatrix,
    GGMLType.Q5_1: quantize_q5_1_imatrix,
    GGMLType.Q2_K: quantize_q2_K_imatrix,
    GGMLType.Q3_K: quantize_q3_K_imatrix,
    GGMLType.Q4_K: quantize_q4_K_imatrix,
    GGMLType.Q5_K: quantize_q5_K_imatrix,
    GGMLType.Q6_K: quantize_q6_K_imatrix,
    GGMLType.IQ4_NL: quantize_iq4_nl_imatrix,
    GGMLType.IQ4_XS: quantize_iq4_xs_imatrix,
}


_IQ_CODEBOOK_TYPES = (GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
                      GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S,
                      GGMLType.IQ1_M)


def quantize_rows(x2d: np.ndarray, t: GGMLType,
                  imatrix: np.ndarray | None = None) -> np.ndarray:
    """ggml_quantize_chunk analog (ggml.c:21594): row-parallel quantization
    with optional importance matrix. Formats without an imatrix-aware path
    (q8_0 and friends) fall back to the plain quantizer, matching the
    reference. The codebook IQ formats route to the native grid-search
    encoders (quant/iq_encode.py, bit-exact vs quantize_iq2_xxs & siblings)."""
    if t in _IQ_CODEBOOK_TYPES:
        from .iq_encode import quantize_iq
        enc = quantize_iq(
            x2d, t,
            None if imatrix is None else np.ascontiguousarray(imatrix, f32))
        return enc.reshape(-1)
    if imatrix is not None:
        fn = _IMATRIX_QUANTIZERS.get(t)
        if fn is not None:
            return fn(x2d, np.ascontiguousarray(imatrix, f32))
    return codecs.quantize(x2d, t)


def quantize_requires_imatrix(t: GGMLType) -> bool:
    """ggml_quantize_requires_imatrix (/root/reference/src/ggml.c:21586):
    true for IQ2_XXS/IQ2_XS/IQ1_S (the formats whose encoders have no
    usable weight heuristic without importance data)."""
    return t in (GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ1_S)
