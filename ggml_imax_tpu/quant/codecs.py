"""Bit-exact numpy codecs for ggml block-quantization formats.

These are brand-new vectorized implementations (blocks processed in parallel
along the leading axis) of the *format semantics* defined by the reference:

- basic formats: /root/reference/src/ggml-quants.c:260-1088
  (quantize_row_{q4_0,q4_1,q5_0,q5_1,q8_0,q8_1}_reference, dequantize_row_*)
- K-quant super-blocks: /root/reference/src/ggml-quants.c:1369-2758
  (make_qkx2_quants, make_qx_quants, make_q3_quants and the per-format rows)
- q8_K: /root/reference/src/ggml-quants.c:3370-3418

The encoded byte layout matches ggml-common.h:144-321 exactly, so blocks
round-trip bit-for-bit with GGUF files produced by the reference.

Rounding-mode notes (required for bit-exactness):
- ggml `nearest_int` (ggml-quants.c:1097) is round-half-to-even -> np.rint.
- C `roundf` (used by q8_0/q8_1) is round-half-away-from-zero.
- `(int8_t)(x + 8.5f)` style casts truncate; operands are non-negative there,
  so truncation == floor.
- scales are stored as IEEE fp16 (round-to-nearest-even) == np.float16 cast.

All computation is float32, matching the scalar C reference.
"""
from __future__ import annotations

import numpy as np

from .formats import FORMATS, QK, QK_K, GGMLType, row_size

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

f32 = np.float32


def _nearest_int(x: np.ndarray) -> np.ndarray:
    """ggml nearest_int: round half to even."""
    return np.rint(x).astype(np.int32)


def _roundf(x: np.ndarray) -> np.ndarray:
    """C roundf: round half away from zero."""
    return np.sign(x) * np.floor(np.abs(x) + f32(0.5))


def _fp16(x: np.ndarray) -> np.ndarray:
    """Round f32 -> fp16 (storage precision of block scales)."""
    return x.astype(np.float16)


def _fp16_f32(x: np.ndarray) -> np.ndarray:
    """fp16 -> f32 (dequantization path reads scales at fp16 precision)."""
    return x.astype(np.float16).astype(np.float32)


def _signed_absmax(x: np.ndarray) -> np.ndarray:
    """Per-row value with the largest magnitude (first occurrence on ties),
    i.e. ggml's `if (amax < fabsf(v)) { amax = |v|; max = v; }` scan."""
    idx = np.argmax(np.abs(x), axis=-1)
    return np.take_along_axis(x, idx[..., None], axis=-1)[..., 0]


def _safe_inv(d: np.ndarray) -> np.ndarray:
    """1/d with id = 0 where d == 0 (ggml's `id = d ? 1/d : 0`)."""
    with np.errstate(divide="ignore"):
        inv = np.where(d != 0, f32(1.0) / d, f32(0.0))
    return inv.astype(f32)


# structured dtypes describing the on-disk block layouts (ggml-common.h)
BLOCK_DTYPES: dict[GGMLType, np.dtype] = {
    GGMLType.Q4_0: np.dtype([("d", "<f2"), ("qs", "u1", (QK // 2,))]),
    GGMLType.Q4_1: np.dtype([("d", "<f2"), ("m", "<f2"), ("qs", "u1", (QK // 2,))]),
    GGMLType.Q5_0: np.dtype([("d", "<f2"), ("qh", "<u4"), ("qs", "u1", (QK // 2,))]),
    GGMLType.Q5_1: np.dtype([("d", "<f2"), ("m", "<f2"), ("qh", "<u4"), ("qs", "u1", (QK // 2,))]),
    GGMLType.Q8_0: np.dtype([("d", "<f2"), ("qs", "i1", (QK,))]),
    GGMLType.Q8_1: np.dtype([("d", "<f2"), ("s", "<f2"), ("qs", "i1", (QK,))]),
    GGMLType.Q2_K: np.dtype([("scales", "u1", (QK_K // 16,)), ("qs", "u1", (QK_K // 4,)),
                             ("d", "<f2"), ("dmin", "<f2")]),
    GGMLType.Q3_K: np.dtype([("hmask", "u1", (QK_K // 8,)), ("qs", "u1", (QK_K // 4,)),
                             ("scales", "u1", (12,)), ("d", "<f2")]),
    GGMLType.Q4_K: np.dtype([("d", "<f2"), ("dmin", "<f2"), ("scales", "u1", (12,)),
                             ("qs", "u1", (QK_K // 2,))]),
    GGMLType.Q5_K: np.dtype([("d", "<f2"), ("dmin", "<f2"), ("scales", "u1", (12,)),
                             ("qh", "u1", (QK_K // 8,)), ("qs", "u1", (QK_K // 2,))]),
    GGMLType.Q6_K: np.dtype([("ql", "u1", (QK_K // 2,)), ("qh", "u1", (QK_K // 4,)),
                             ("scales", "i1", (QK_K // 16,)), ("d", "<f2")]),
    GGMLType.Q8_K: np.dtype([("d", "<f4"), ("qs", "i1", (QK_K,)), ("bsums", "<i2", (QK_K // 16,))]),
}

for _t, _dt in BLOCK_DTYPES.items():
    assert _dt.itemsize == FORMATS[_t].type_size, (_t, _dt.itemsize, FORMATS[_t].type_size)


def _blocks_in(x: np.ndarray, block: int) -> np.ndarray:
    x = np.ascontiguousarray(x, dtype=f32)
    assert x.size % block == 0, (x.shape, block)
    return x.reshape(-1, block)


def _blocks_view(raw: np.ndarray, t: GGMLType) -> np.ndarray:
    raw = np.ascontiguousarray(raw).view(np.uint8).reshape(-1)
    return raw.view(BLOCK_DTYPES[t])


# ---------------------------------------------------------------------------
# basic formats: Q4_0 Q4_1 Q5_0 Q5_1 Q8_0 Q8_1
# ---------------------------------------------------------------------------

def quantize_q4_0(x: np.ndarray) -> np.ndarray:
    xb = _blocks_in(x, QK)
    mx = _signed_absmax(xb)
    d = (mx / f32(-8.0)).astype(f32)
    idv = _safe_inv(d)
    xi = np.minimum(15, np.floor(xb * idv[:, None] + f32(8.5)).astype(np.int32)).astype(np.uint8)
    out = np.zeros(len(xb), dtype=BLOCK_DTYPES[GGMLType.Q4_0])
    out["d"] = _fp16(d)
    out["qs"] = xi[:, : QK // 2] | (xi[:, QK // 2:] << 4)
    return out.view(np.uint8)


def dequantize_q4_0(raw: np.ndarray) -> np.ndarray:
    b = _blocks_view(raw, GGMLType.Q4_0)
    d = b["d"].astype(f32)[:, None]
    lo = (b["qs"] & 0x0F).astype(np.int8) - 8
    hi = (b["qs"] >> 4).astype(np.int8) - 8
    return (np.concatenate([lo, hi], axis=1).astype(f32) * d).reshape(-1)


def quantize_q4_1(x: np.ndarray) -> np.ndarray:
    xb = _blocks_in(x, QK)
    mn = xb.min(axis=1)
    mxv = xb.max(axis=1)
    d = ((mxv - mn) / f32(15.0)).astype(f32)
    idv = _safe_inv(d)
    xi = np.minimum(15, np.floor((xb - mn[:, None]) * idv[:, None] + f32(0.5)).astype(np.int32)).astype(np.uint8)
    out = np.zeros(len(xb), dtype=BLOCK_DTYPES[GGMLType.Q4_1])
    out["d"] = _fp16(d)
    out["m"] = _fp16(mn)
    out["qs"] = xi[:, : QK // 2] | (xi[:, QK // 2:] << 4)
    return out.view(np.uint8)


def dequantize_q4_1(raw: np.ndarray) -> np.ndarray:
    b = _blocks_view(raw, GGMLType.Q4_1)
    d = b["d"].astype(f32)[:, None]
    m = b["m"].astype(f32)[:, None]
    lo = (b["qs"] & 0x0F).astype(f32)
    hi = (b["qs"] >> 4).astype(f32)
    return (np.concatenate([lo, hi], axis=1) * d + m).reshape(-1)


def _pack_q5(xi: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """xi: (nb, 32) values in [0, 31] -> (qs nibbles, qh high-bit word)."""
    lo = xi[:, : QK // 2]
    hi = xi[:, QK // 2:]
    qs = (lo & 0x0F).astype(np.uint8) | ((hi & 0x0F).astype(np.uint8) << 4)
    j = np.arange(QK // 2, dtype=np.uint32)
    qh = (((lo.astype(np.uint32) & 0x10) >> 4) << j).sum(axis=1, dtype=np.uint32) \
       | (((hi.astype(np.uint32) & 0x10) >> 4) << (j + QK // 2)).sum(axis=1, dtype=np.uint32)
    return qs, qh


def _unpack_q5(qs: np.ndarray, qh: np.ndarray) -> np.ndarray:
    """-> (nb, 32) unsigned 5-bit values."""
    j = np.arange(QK // 2, dtype=np.uint32)
    xh0 = (((qh[:, None] >> j) << 4) & 0x10).astype(np.uint8)
    xh1 = ((qh[:, None] >> (j + 12)) & 0x10).astype(np.uint8)
    lo = (qs & 0x0F) | xh0
    hi = (qs >> 4) | xh1
    return np.concatenate([lo, hi], axis=1)


def quantize_q5_0(x: np.ndarray) -> np.ndarray:
    xb = _blocks_in(x, QK)
    mx = _signed_absmax(xb)
    d = (mx / f32(-16.0)).astype(f32)
    idv = _safe_inv(d)
    xi = np.minimum(31, np.floor(xb * idv[:, None] + f32(16.5)).astype(np.int32)).astype(np.uint8)
    qs, qh = _pack_q5(xi)
    out = np.zeros(len(xb), dtype=BLOCK_DTYPES[GGMLType.Q5_0])
    out["d"] = _fp16(d)
    out["qs"] = qs
    out["qh"] = qh
    return out.view(np.uint8)


def dequantize_q5_0(raw: np.ndarray) -> np.ndarray:
    b = _blocks_view(raw, GGMLType.Q5_0)
    d = b["d"].astype(f32)[:, None]
    q = _unpack_q5(b["qs"], b["qh"]).astype(np.int32) - 16
    return (q.astype(f32) * d).reshape(-1)


def quantize_q5_1(x: np.ndarray) -> np.ndarray:
    xb = _blocks_in(x, QK)
    mn = xb.min(axis=1)
    mxv = xb.max(axis=1)
    d = ((mxv - mn) / f32(31.0)).astype(f32)
    idv = _safe_inv(d)
    xi = np.floor((xb - mn[:, None]) * idv[:, None] + f32(0.5)).astype(np.int32).astype(np.uint8)
    qs, qh = _pack_q5(xi)
    out = np.zeros(len(xb), dtype=BLOCK_DTYPES[GGMLType.Q5_1])
    out["d"] = _fp16(d)
    out["m"] = _fp16(mn)
    out["qs"] = qs
    out["qh"] = qh
    return out.view(np.uint8)


def dequantize_q5_1(raw: np.ndarray) -> np.ndarray:
    b = _blocks_view(raw, GGMLType.Q5_1)
    d = b["d"].astype(f32)[:, None]
    m = b["m"].astype(f32)[:, None]
    q = _unpack_q5(b["qs"], b["qh"]).astype(f32)
    return (q * d + m).reshape(-1)


def quantize_q8_0(x: np.ndarray) -> np.ndarray:
    xb = _blocks_in(x, QK)
    amax = np.abs(xb).max(axis=1)
    d = (amax / f32(127.0)).astype(f32)
    idv = _safe_inv(d)
    q = _roundf(xb * idv[:, None]).astype(np.int8)
    out = np.zeros(len(xb), dtype=BLOCK_DTYPES[GGMLType.Q8_0])
    out["d"] = _fp16(d)
    out["qs"] = q
    return out.view(np.uint8)


def dequantize_q8_0(raw: np.ndarray) -> np.ndarray:
    b = _blocks_view(raw, GGMLType.Q8_0)
    return (b["qs"].astype(f32) * b["d"].astype(f32)[:, None]).reshape(-1)


def quantize_q8_1(x: np.ndarray) -> np.ndarray:
    xb = _blocks_in(x, QK)
    amax = np.abs(xb).max(axis=1)
    d = (amax / f32(127.0)).astype(f32)
    idv = _safe_inv(d)
    q = _roundf(xb * idv[:, None]).astype(np.int8)
    out = np.zeros(len(xb), dtype=BLOCK_DTYPES[GGMLType.Q8_1])
    out["d"] = _fp16(d)
    out["s"] = _fp16(d * q.sum(axis=1, dtype=np.int32).astype(f32))
    out["qs"] = q
    return out.view(np.uint8)


def dequantize_q8_1(raw: np.ndarray) -> np.ndarray:
    b = _blocks_view(raw, GGMLType.Q8_1)
    return (b["qs"].astype(f32) * b["d"].astype(f32)[:, None]).reshape(-1)


# ---------------------------------------------------------------------------
# K-quant scale-search helpers (vectorized across sub-blocks)
# ---------------------------------------------------------------------------

def _seqsum(a: np.ndarray) -> np.ndarray:
    """Sum over the last axis in strict element order at float32 precision,
    matching the C reference's sequential accumulation (numpy's pairwise
    summation rounds differently and breaks bit-exactness)."""
    out = np.zeros(a.shape[:-1], dtype=f32)
    for i in range(a.shape[-1]):
        out += a[..., i]
    return out


def _make_qkx2_quants(x: np.ndarray, weights: np.ndarray, nmax: int,
                      rmin: float, rdelta: float, nstep: int, use_mad: bool
                      ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Weighted [0, nmax] affine quantizer search (ggml make_qkx2_quants,
    ggml-quants.c:1275). x, weights: (nb, n). Returns (scale, the_min, L)."""
    nb, n = x.shape
    mn = np.minimum(x.min(axis=1), f32(0.0))
    mx = x.max(axis=1)
    sum_w = _seqsum(weights)
    sum_x = _seqsum(weights * x)

    degenerate = mx == mn
    rng = np.where(degenerate, f32(1.0), mx - mn)  # avoid div-by-0; masked out below

    iscale = (f32(nmax) / rng).astype(f32)
    scale = _safe_inv(iscale)
    L = np.clip(_nearest_int(iscale[:, None] * (x - mn[:, None])), 0, nmax)
    Lf = L.astype(f32)
    diff = scale[:, None] * Lf + mn[:, None] - x
    diff = np.abs(diff) if use_mad else diff * diff
    best_mad = _seqsum(weights * diff)

    cur_min = mn.copy()
    for is_ in range(nstep + 1):
        # NB: the reference re-derives iscale and the candidate levels from the
        # *current* best min, which is updated whenever a candidate wins.
        cur_rng = np.where(degenerate, f32(1.0), mx - cur_min)
        isc = (f32(rmin + rdelta * is_ + nmax) / cur_rng).astype(f32)
        laux = np.clip(_nearest_int(isc[:, None] * (x - cur_min[:, None])), 0, nmax)
        lf = laux.astype(f32)
        wl = weights * lf
        sum_l = _seqsum(wl)
        sum_l2 = _seqsum(wl * lf)
        sum_xl = _seqsum(wl * x)
        D = sum_w * sum_l2 - sum_l * sum_l
        with np.errstate(divide="ignore", invalid="ignore"):
            this_scale = ((sum_w * sum_xl - sum_x * sum_l) / D).astype(f32)
            this_min = ((sum_l2 * sum_x - sum_l * sum_xl) / D).astype(f32)
            alt_scale = (sum_xl / sum_l2).astype(f32)
        pos_min = this_min > 0
        this_min = np.where(pos_min, f32(0.0), this_min)
        this_scale = np.where(pos_min, alt_scale, this_scale)
        diff = this_scale[:, None] * lf + this_min[:, None] - x
        diff = np.abs(diff) if use_mad else diff * diff
        mad = _seqsum(weights * diff)
        better = (D > 0) & (mad < best_mad)
        L = np.where(better[:, None], laux, L)
        best_mad = np.where(better, mad, best_mad)
        scale = np.where(better, this_scale, scale).astype(f32)
        cur_min = np.where(better, this_min, cur_min).astype(f32)

    scale = np.where(degenerate, f32(0.0), scale).astype(f32)
    L = np.where(degenerate[:, None], 0, L)
    the_min = np.where(degenerate, -mn, -cur_min).astype(f32)
    return scale, the_min, L.astype(np.int32)


def _make_qx_quants(x: np.ndarray, nmax: int, qw: np.ndarray | None = None
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric [-nmax, nmax-1] quantizer with scale search (ggml
    make_qx_quants rmse_type=1, ggml-quants.c:1104). Returns (scale, L) with
    L shifted to [0, 2*nmax-1]."""
    nb, n = x.shape
    amax_idx = np.argmax(np.abs(x), axis=1)
    mx = np.take_along_axis(x, amax_idx[:, None], axis=1)[:, 0]
    amax = np.abs(mx)
    dead = amax < f32(1e-30)
    mx_safe = np.where(dead, f32(1.0), mx)

    w = (x * x) if qw is None else qw

    def trial(iscale):
        l = np.clip(_nearest_int(iscale[:, None] * x), -nmax, nmax - 1)
        lf = l.astype(f32)
        sumlx = _seqsum(w * x * lf)
        suml2 = _seqsum(w * lf * lf)
        return l, sumlx, suml2

    iscale0 = (f32(-nmax) / mx_safe).astype(f32)
    L, sumlx, suml2 = trial(iscale0)
    with np.errstate(divide="ignore", invalid="ignore"):
        scale = (sumlx / suml2).astype(f32)  # reference divides unguarded
    best = scale * sumlx
    for is_ in range(-9, 10):
        if is_ == 0:
            continue
        isc = -(f32(nmax) + f32(0.1) * f32(is_)) / mx_safe
        l, slx, sl2 = trial(isc)
        better = (sl2 > 0) & (slx * slx > best * sl2)
        L = np.where(better[:, None], l, L)
        with np.errstate(divide="ignore", invalid="ignore"):
            new_scale = np.where(better, slx / sl2, scale)
        scale = new_scale.astype(f32)
        best = np.where(better, scale * slx, best)

    scale = np.where(dead, f32(0.0), scale).astype(f32)
    L = np.where(dead[:, None], 0, L + nmax)
    return scale, L.astype(np.int32)


def _make_qp_quants(x: np.ndarray, nmax: int, qw: np.ndarray
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Non-negative [0, nmax] quantizer with weighted-MSE scale search and a
    greedy per-element refinement (ggml make_qp_quants, ggml-quants.c:1579).
    Used by the imatrix-aware K-quant super-scale encoders. x, qw: (nb, n),
    x >= 0. Returns (scale, L int32)."""
    nb, n = x.shape
    mx = x.max(axis=1)
    dead = mx == 0
    mx_safe = np.where(dead, f32(1.0), mx)

    iscale = (f32(nmax) / mx_safe).astype(f32)
    L0 = _nearest_int(iscale[:, None] * x)          # first trial: no clip
    diff = x - _safe_inv(iscale)[:, None] * L0.astype(f32)
    best_mse = _seqsum(qw * diff * diff)
    best_iscale = iscale
    for is_ in range(-4, 5):
        if is_ == 0:
            continue
        isc = ((f32(0.1) * f32(is_) + f32(nmax)) / mx_safe).astype(f32)
        l = np.minimum(nmax, _nearest_int(isc[:, None] * x)).astype(f32)
        diff = x - _safe_inv(isc)[:, None] * l
        mse = _seqsum(qw * diff * diff)
        better = mse < best_mse
        best_mse = np.where(better, mse, best_mse)
        best_iscale = np.where(better, isc, best_iscale).astype(f32)

    L = np.minimum(nmax, _nearest_int(best_iscale[:, None] * x)).astype(np.int32)
    Lf = L.astype(f32)
    sumlx = _seqsum(qw * x * Lf)
    suml2 = _seqsum(qw * Lf * Lf)

    stopped = dead.copy()
    for _ in range(5):
        changed = np.zeros(nb, dtype=bool)
        for i in range(n):
            w = qw[:, i]
            xi = x[:, i]
            Li = L[:, i].astype(f32)
            slx = sumlx - w * xi * Li
            sl2 = suml2 - w * Li * Li
            cond = (slx > 0) & (sl2 > 0)
            with np.errstate(divide="ignore", invalid="ignore"):
                new_l = np.minimum(nmax, _nearest_int(
                    np.where(cond, xi * sl2 / np.where(cond, slx, 1), Li)))
            nlf = new_l.astype(f32)
            slx2 = slx + w * xi * nlf
            sl22 = sl2 + w * nlf * nlf
            apply = (~stopped) & cond & (new_l != L[:, i]) \
                & (slx2 * slx2 * suml2 > sumlx * sumlx * sl22)
            L[:, i] = np.where(apply, new_l, L[:, i])
            sumlx = np.where(apply, slx2, sumlx)
            suml2 = np.where(apply, sl22, suml2)
            changed |= apply
        stopped |= ~changed
        if stopped.all():
            break

    with np.errstate(divide="ignore", invalid="ignore"):
        scale = (sumlx / suml2).astype(f32)
    scale = np.where(dead, f32(0.0), scale).astype(f32)
    L = np.where(dead[:, None], 0, L)
    return scale, L


def _make_q3_quants(x: np.ndarray, nmax: int) -> tuple[np.ndarray, np.ndarray]:
    """do_rmse=true variant with the element-sequential refinement loop
    (ggml make_q3_quants, ggml-quants.c:1173). Vectorized across blocks,
    sequential over the n elements like the reference. Returns (scale, L in
    [0, 2*nmax-1])."""
    nb, n = x.shape
    amax_idx = np.argmax(np.abs(x), axis=1)
    mx = np.take_along_axis(x, amax_idx[:, None], axis=1)[:, 0]
    amax = np.abs(mx)
    dead = amax == 0
    mx_safe = np.where(dead, f32(1.0), mx)

    iscale = (f32(-nmax) / mx_safe).astype(f32)
    L = np.clip(_nearest_int(iscale[:, None] * x), -nmax, nmax - 1).astype(np.int32)
    w = x * x
    sumlx = _seqsum(w * x * L.astype(f32))
    suml2 = _seqsum(w * L.astype(f32) * L.astype(f32))

    stopped = np.zeros(nb, dtype=bool)
    for _ in range(5):
        changed = np.zeros(nb, dtype=bool)
        for i in range(n):
            wi = w[:, i]
            xi = x[:, i]
            Li = L[:, i].astype(f32)
            slx = sumlx - wi * xi * Li
            sl2 = suml2 - wi * Li * Li
            with np.errstate(divide="ignore", invalid="ignore"):
                new_l = np.clip(_nearest_int(np.where(slx > 0, xi * sl2 / slx, Li)), -nmax, nmax - 1)
            nlf = new_l.astype(f32)
            slx2 = slx + wi * xi * nlf
            sl22 = sl2 + wi * nlf * nlf
            # the improvement test MUST stay f32: the reference compares
            # C floats, where both sides overflowing to inf compares false
            # — f64 partials would flip some of those outcomes and break
            # the bit-exact golden contract. Overflow-to-inf is deliberate.
            with np.errstate(over="ignore"):
                better = slx2 * slx2 * suml2 > sumlx * sumlx * sl22
            apply = (~stopped) & (slx > 0) & (new_l != L[:, i]) & (sl22 > 0) \
                & better
            L[:, i] = np.where(apply, new_l, L[:, i])
            sumlx = np.where(apply, slx2, sumlx)
            suml2 = np.where(apply, sl22, suml2)
            changed |= apply
        stopped |= ~changed
        if stopped.all():
            break

    with np.errstate(divide="ignore", invalid="ignore"):
        scale = np.where(suml2 > 0, sumlx / suml2, f32(0.0)).astype(f32)
    scale = np.where(dead, f32(0.0), scale).astype(f32)
    L = np.where(dead[:, None], 0, L + nmax)
    return scale, L.astype(np.int32)


# ---------------------------------------------------------------------------
# K-quants: scale (un)packing
# ---------------------------------------------------------------------------

def _pack_scale_min_k4(ls: np.ndarray, lm: np.ndarray) -> np.ndarray:
    """Pack 8 six-bit (scale, min) pairs into 12 bytes (inverse of
    get_scale_min_k4, ggml-quants.c:1357). ls, lm: (nb, 8) uint8."""
    nb = len(ls)
    sc = np.zeros((nb, 12), dtype=np.uint8)
    j = np.arange(4)
    sc[:, 0:4] = ls[:, 0:4]
    sc[:, 4:8] = lm[:, 0:4]
    sc[:, 8:12] = (ls[:, 4:8] & 0xF) | ((lm[:, 4:8] & 0xF) << 4)
    sc[:, 0:4] |= (ls[:, 4:8] >> 4) << 6
    sc[:, 4:8] |= (lm[:, 4:8] >> 4) << 6
    return sc


def _unpack_scale_min_k4(sc: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """-> (d6, m6): (nb, 8) six-bit scales and mins."""
    d6 = np.empty(sc.shape[:-1] + (8,), dtype=np.uint8)
    m6 = np.empty_like(d6)
    d6[..., 0:4] = sc[..., 0:4] & 63
    m6[..., 0:4] = sc[..., 4:8] & 63
    d6[..., 4:8] = (sc[..., 8:12] & 0xF) | ((sc[..., 0:4] >> 6) << 4)
    m6[..., 4:8] = (sc[..., 8:12] >> 4) | ((sc[..., 4:8] >> 6) << 4)
    return d6, m6


def _pack_q3k_scales(l6: np.ndarray) -> np.ndarray:
    """Pack 16 six-bit values into 12 bytes (q3_K layout,
    ggml-quants.c:1786-1799). l6: (nb, 16) in [0, 64)."""
    nb = len(l6)
    sc = np.zeros((nb, 12), dtype=np.uint8)
    lo = (l6 & 0xF).astype(np.uint8)
    hi = (l6 >> 4).astype(np.uint8)
    sc[:, 0:8] = lo[:, 0:8] | (lo[:, 8:16] << 4)
    for j in range(16):
        sc[:, 8 + j % 4] |= hi[:, j] << (2 * (j // 4))
    return sc


def _unpack_q3k_scales(sc: np.ndarray) -> np.ndarray:
    """-> (nb, 16) int32 scales in [-32, 31]."""
    lo = np.concatenate([sc[:, 0:8] & 0xF, sc[:, 0:8] >> 4], axis=1).astype(np.int32)
    j = np.arange(16)
    hi = ((sc[:, 8 + (j % 4)] >> (2 * (j // 4))[None, :]) & 3).astype(np.int32)
    return (lo | (hi << 4)) - 32


# ---------------------------------------------------------------------------
# K-quants: gather index tables (element e of the 256-super-block -> packed pos)
# ---------------------------------------------------------------------------

_E = np.arange(QK_K)
# q2_K / q3_K: 2-bit quants, bytes laid out per 128-half, 32 bytes each
_Q2_BYTE = (_E % 32) + 32 * (_E // 128)
_Q2_SHIFT = 2 * ((_E % 128) // 32)
# q4_K: nibbles per 64-chunk
_Q4K_BYTE = (_E % 32) + 32 * (_E // 64)
_Q4K_SHIFT = 4 * ((_E % 64) // 32)
# q5_K high bits
_Q5K_HBIT = _E // 32  # bit index within qh byte (_E % 32)
# q6_K
_Q6_H = _E // 128
_Q6_L = _E % 128
_Q6_G = _Q6_L // 32
_Q6_QL_BYTE = 64 * _Q6_H + (_Q6_L % 32) + 32 * (_Q6_G % 2)
_Q6_QL_SHIFT = 4 * (_Q6_G // 2)
_Q6_QH_BYTE = 32 * _Q6_H + (_Q6_L % 32)
_Q6_QH_SHIFT = 2 * _Q6_G
# q3_K hmask
_Q3_HBYTE = _E % 32
_Q3_HBIT = _E // 32


def _pack_2bit_fast(L: np.ndarray) -> np.ndarray:
    """Vectorized 2-bit pack: group elements by (byte, shift)."""
    nb = len(L)
    Lu = L.astype(np.uint8)
    qs = np.zeros((nb, QK_K // 4), dtype=np.uint8)
    for shift in (0, 2, 4, 6):
        sel = _Q2_SHIFT == shift
        qs[:, _Q2_BYTE[sel]] |= Lu[:, sel] << shift
    return qs


def _pack_4bit_k(L: np.ndarray) -> np.ndarray:
    """L: (nb, 256) in [0,15] -> (nb, 128) nibbles (q4_K/q5_K layout)."""
    Lu = L.astype(np.uint8)
    qs = np.zeros((len(L), QK_K // 2), dtype=np.uint8)
    for shift in (0, 4):
        sel = _Q4K_SHIFT == shift
        qs[:, _Q4K_BYTE[sel]] |= Lu[:, sel] << shift
    return qs


# ---------------------------------------------------------------------------
# Q2_K
# ---------------------------------------------------------------------------

def quantize_q2_K(x: np.ndarray) -> np.ndarray:
    xb = _blocks_in(x, QK_K)
    nb = len(xb)
    xs = xb.reshape(nb * 16, 16)  # 16 sub-blocks of 16
    scales, mins, L = _make_qkx2_quants(xs, np.abs(xs), 3, -0.5, 0.1, 15, True)
    scales = scales.reshape(nb, 16)
    mins = mins.reshape(nb, 16)
    L = L.reshape(nb, QK_K)

    q4scale = f32(15.0)
    max_scale = scales.max(axis=1)
    max_min = mins.max(axis=1)

    sc4 = np.zeros((nb, 16), dtype=np.uint8)
    pos = max_scale > 0
    with np.errstate(divide="ignore", invalid="ignore"):
        isc = np.where(pos, q4scale / max_scale, f32(0.0)).astype(f32)
    sc4 = np.where(pos[:, None], _nearest_int(isc[:, None] * scales), 0).astype(np.uint8)
    d = np.where(pos, max_scale / q4scale, f32(0.0)).astype(f32)

    posm = max_min > 0
    with np.errstate(divide="ignore", invalid="ignore"):
        iscm = np.where(posm, q4scale / max_min, f32(0.0)).astype(f32)
    mn4 = np.where(posm[:, None], _nearest_int(iscm[:, None] * mins), 0).astype(np.uint8)
    dmin = np.where(posm, max_min / q4scale, f32(0.0)).astype(f32)

    packed_scales = sc4 | (mn4 << 4)

    # re-quantize with the (fp16-rounded) stored scales
    d16 = _fp16_f32(d)
    dmin16 = _fp16_f32(dmin)
    dl = d16[:, None] * sc4.astype(f32)              # (nb, 16)
    ml = dmin16[:, None] * mn4.astype(f32)
    dl_e = np.repeat(dl, 16, axis=1)                 # (nb, 256)
    ml_e = np.repeat(ml, 16, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        l_new = np.clip(_nearest_int((xb + ml_e) / dl_e), 0, 3)
    L = np.where(dl_e != 0, l_new, L)

    out = np.zeros(nb, dtype=BLOCK_DTYPES[GGMLType.Q2_K])
    out["scales"] = packed_scales
    out["qs"] = _pack_2bit_fast(L)
    out["d"] = _fp16(d)
    out["dmin"] = _fp16(dmin)
    return out.view(np.uint8)


def dequantize_q2_K(raw: np.ndarray) -> np.ndarray:
    b = _blocks_view(raw, GGMLType.Q2_K)
    d = b["d"].astype(f32)[:, None]
    dmin = b["dmin"].astype(f32)[:, None]
    sc = b["scales"][:, _E // 16]                     # (nb, 256)
    q = ((b["qs"][:, _Q2_BYTE] >> _Q2_SHIFT) & 3).astype(f32)
    return (d * (sc & 0xF).astype(f32) * q - dmin * (sc >> 4).astype(f32)).reshape(-1)


# ---------------------------------------------------------------------------
# Q3_K
# ---------------------------------------------------------------------------

def quantize_q3_K(x: np.ndarray) -> np.ndarray:
    xb = _blocks_in(x, QK_K)
    nb = len(xb)
    xs = xb.reshape(nb * 16, 16)
    scales, L = _make_q3_quants(xs, 4)
    scales = scales.reshape(nb, 16)
    L = L.reshape(nb, QK_K)  # in [0, 7]

    amax_idx = np.argmax(np.abs(scales), axis=1)
    max_scale = np.take_along_axis(scales, amax_idx[:, None], axis=1)[:, 0]
    nonzero = max_scale != 0
    ms_safe = np.where(nonzero, max_scale, f32(1.0))
    iscale = f32(-32.0) / ms_safe
    l6 = np.clip(_nearest_int(iscale[:, None] * scales), -32, 31) + 32
    l6 = np.where(nonzero[:, None], l6, 0)
    packed_scales = _pack_q3k_scales(l6)
    d = np.where(nonzero, _safe_inv(iscale), f32(0.0)).astype(f32)

    # re-quantize with stored 6-bit scales
    sc = _unpack_q3k_scales(packed_scales).astype(f32)   # (nb, 16) with -32 applied
    d16 = _fp16_f32(d)
    dl = d16[:, None] * sc
    dl_e = np.repeat(dl, 16, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        l_new = np.clip(_nearest_int(xb / dl_e), -4, 3) + 4
    L = np.where(dl_e != 0, l_new, L)

    # split into high-bit mask + 2-bit quants
    hibit = (L > 3)
    L2 = np.where(hibit, L - 4, L)
    hmask = np.zeros((nb, QK_K // 8), dtype=np.uint8)
    for bit in range(8):
        sel = _Q3_HBIT == bit
        hmask[:, _Q3_HBYTE[sel]] |= (hibit[:, sel].astype(np.uint8) << bit)

    out = np.zeros(nb, dtype=BLOCK_DTYPES[GGMLType.Q3_K])
    out["hmask"] = hmask
    out["qs"] = _pack_2bit_fast(L2)
    out["scales"] = packed_scales
    out["d"] = _fp16(d)
    return out.view(np.uint8)


def dequantize_q3_K(raw: np.ndarray) -> np.ndarray:
    b = _blocks_view(raw, GGMLType.Q3_K)
    d = b["d"].astype(f32)[:, None]
    sc = _unpack_q3k_scales(b["scales"]).astype(f32)     # (nb, 16)
    dl = (d * sc)[:, _E // 16]
    q = ((b["qs"][:, _Q2_BYTE] >> _Q2_SHIFT) & 3).astype(np.int32)
    hset = (b["hmask"][:, _Q3_HBYTE] >> _Q3_HBIT) & 1
    q = q - np.where(hset == 1, 0, 4)
    return (dl * q.astype(f32)).reshape(-1)


# ---------------------------------------------------------------------------
# Q4_K / Q5_K (shared affine 6-bit super-scales)
# ---------------------------------------------------------------------------

def _qkx_scales_for_k45(xb: np.ndarray, nmax: int, rmin: float, nstep: int):
    nb = len(xb)
    xs = xb.reshape(nb * 8, 32)
    sum_x2 = (xs * xs).sum(axis=1)
    av_x = np.sqrt(sum_x2 / f32(32.0)).astype(f32)
    weights = av_x[:, None] + np.abs(xs)
    scales, mins, L = _make_qkx2_quants(xs, weights, nmax, rmin, 0.1, nstep, False)
    return (scales.reshape(nb, 8), mins.reshape(nb, 8), L.reshape(nb, QK_K))


def _k45_store_scales(scales, mins):
    """6-bit quantize per-sub-block scales/mins against 63-level super scales.
    The +0.0 normalizes -0.0 maxima to +0.0 — the reference scans with
    `if (v > max)` starting from 0.0f, which never adopts -0.0."""
    max_scale = scales.max(axis=1) + f32(0.0)
    max_min = mins.max(axis=1) + f32(0.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv_scale = np.where(max_scale > 0, f32(63.0) / max_scale, f32(0.0)).astype(f32)
        inv_min = np.where(max_min > 0, f32(63.0) / max_min, f32(0.0)).astype(f32)
    ls = np.minimum(63, _nearest_int(inv_scale[:, None] * scales)).astype(np.uint8)
    lm = np.minimum(63, _nearest_int(inv_min[:, None] * mins)).astype(np.uint8)
    packed = _pack_scale_min_k4(ls, lm)
    d = (max_scale / f32(63.0)).astype(f32)
    dmin = (max_min / f32(63.0)).astype(f32)
    return packed, d, dmin


def quantize_q4_K(x: np.ndarray) -> np.ndarray:
    xb = _blocks_in(x, QK_K)
    nb = len(xb)
    scales, mins, L = _qkx_scales_for_k45(xb, 15, -1.0, 20)
    packed, d, dmin = _k45_store_scales(scales, mins)

    d6, m6 = _unpack_scale_min_k4(packed)
    d16 = _fp16_f32(d)[:, None]
    dmin16 = _fp16_f32(dmin)[:, None]
    dl = np.repeat(d16 * d6.astype(f32), 32, axis=1)
    ml = np.repeat(dmin16 * m6.astype(f32), 32, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        l_new = np.clip(_nearest_int((xb + ml) / dl), 0, 15)
    L = np.where(dl != 0, l_new, L)

    out = np.zeros(nb, dtype=BLOCK_DTYPES[GGMLType.Q4_K])
    out["d"] = _fp16(d)
    out["dmin"] = _fp16(dmin)
    out["scales"] = packed
    out["qs"] = _pack_4bit_k(L)
    return out.view(np.uint8)


def dequantize_q4_K(raw: np.ndarray) -> np.ndarray:
    b = _blocks_view(raw, GGMLType.Q4_K)
    d = b["d"].astype(f32)[:, None]
    dmin = b["dmin"].astype(f32)[:, None]
    d6, m6 = _unpack_scale_min_k4(b["scales"])
    dl = (d * d6.astype(f32))[:, _E // 32]
    ml = (dmin * m6.astype(f32))[:, _E // 32]
    q = ((b["qs"][:, _Q4K_BYTE] >> _Q4K_SHIFT) & 0xF).astype(f32)
    return (dl * q - ml).reshape(-1)


def quantize_q5_K(x: np.ndarray) -> np.ndarray:
    xb = _blocks_in(x, QK_K)
    nb = len(xb)
    scales, mins, L = _qkx_scales_for_k45(xb, 31, -0.5, 15)
    packed, d, dmin = _k45_store_scales(scales, mins)

    d6, m6 = _unpack_scale_min_k4(packed)
    d16 = _fp16_f32(d)[:, None]
    dmin16 = _fp16_f32(dmin)[:, None]
    dl = np.repeat(d16 * d6.astype(f32), 32, axis=1)
    ml = np.repeat(dmin16 * m6.astype(f32), 32, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        l_new = np.clip(_nearest_int((xb + ml) / dl), 0, 31)
    L = np.where(dl != 0, l_new, L)

    hibit = L > 15
    L4 = np.where(hibit, L - 16, L)
    qh = np.zeros((nb, QK_K // 8), dtype=np.uint8)
    for bit in range(8):
        sel = _Q5K_HBIT == bit
        qh[:, (_E % 32)[sel]] |= (hibit[:, sel].astype(np.uint8) << bit)

    out = np.zeros(nb, dtype=BLOCK_DTYPES[GGMLType.Q5_K])
    out["d"] = _fp16(d)
    out["dmin"] = _fp16(dmin)
    out["scales"] = packed
    out["qh"] = qh
    out["qs"] = _pack_4bit_k(L4)
    return out.view(np.uint8)


def dequantize_q5_K(raw: np.ndarray) -> np.ndarray:
    b = _blocks_view(raw, GGMLType.Q5_K)
    d = b["d"].astype(f32)[:, None]
    dmin = b["dmin"].astype(f32)[:, None]
    d6, m6 = _unpack_scale_min_k4(b["scales"])
    dl = (d * d6.astype(f32))[:, _E // 32]
    ml = (dmin * m6.astype(f32))[:, _E // 32]
    ql = ((b["qs"][:, _Q4K_BYTE] >> _Q4K_SHIFT) & 0xF).astype(np.int32)
    hbit = ((b["qh"][:, _E % 32] >> _Q5K_HBIT) & 1).astype(np.int32)
    q = (ql + 16 * hbit).astype(f32)
    return (dl * q - ml).reshape(-1)


# ---------------------------------------------------------------------------
# Q6_K
# ---------------------------------------------------------------------------

def quantize_q6_K(x: np.ndarray, qw: np.ndarray | None = None) -> np.ndarray:
    """qw (matching x's element count) switches to the imatrix-aware search:
    quantize_row_q6_K_impl uses the raw imatrix entries as make_qx_quants
    weights (ggml-quants.c:2766-2800 — no sigma2 mixing for q6_K)."""
    xb = _blocks_in(x, QK_K)
    nb = len(xb)
    xs = xb.reshape(nb * 16, 16)
    scales, L = _make_qx_quants(xs, 32,
                                None if qw is None else
                                np.ascontiguousarray(qw, f32).reshape(nb * 16, 16))
    scales = scales.reshape(nb, 16)
    L = L.reshape(nb, QK_K)  # [0, 63]

    # reference scan (`if fabsf(scale) > max_abs_scale`) skips NaN scales
    # (0/0 from underflowed sub-block sums); all-NaN -> zeroed block
    scan = np.where(np.isnan(scales), f32(0.0), scales)
    amax_idx = np.argmax(np.abs(scan), axis=1)
    max_scale = np.take_along_axis(scan, amax_idx[:, None], axis=1)[:, 0]
    nonzero = np.abs(scan).max(axis=1) != 0
    ms_safe = np.where(nonzero, max_scale, f32(1.0))
    iscale = f32(-128.0) / ms_safe
    d = np.where(nonzero, _safe_inv(iscale), f32(0.0)).astype(f32)
    sc8 = np.minimum(127, _nearest_int(iscale[:, None] * scales)).astype(np.int8)
    sc8 = np.where(nonzero[:, None], sc8, 0)

    d16 = _fp16_f32(d)
    dl = d16[:, None] * sc8.astype(f32)
    dl_e = np.repeat(dl, 16, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        l_new = np.clip(_nearest_int(xb / dl_e), -32, 31) + 32
    L = np.where(dl_e != 0, l_new, L)
    L = np.where(nonzero[:, None], L, 0)

    ql = np.zeros((nb, QK_K // 2), dtype=np.uint8)
    qh = np.zeros((nb, QK_K // 4), dtype=np.uint8)
    Llo = (L & 0xF).astype(np.uint8)
    Lhi = (L >> 4).astype(np.uint8)
    for shift in (0, 4):
        sel = _Q6_QL_SHIFT == shift
        ql[:, _Q6_QL_BYTE[sel]] |= Llo[:, sel] << shift
    for shift in (0, 2, 4, 6):
        sel = _Q6_QH_SHIFT == shift
        qh[:, _Q6_QH_BYTE[sel]] |= Lhi[:, sel] << shift

    out = np.zeros(nb, dtype=BLOCK_DTYPES[GGMLType.Q6_K])
    out["ql"] = ql
    out["qh"] = qh
    out["scales"] = sc8
    out["d"] = _fp16(d)
    return out.view(np.uint8)


def dequantize_q6_K(raw: np.ndarray) -> np.ndarray:
    b = _blocks_view(raw, GGMLType.Q6_K)
    d = b["d"].astype(f32)[:, None]
    sc = b["scales"].astype(f32)[:, _E // 16]
    lo = (b["ql"][:, _Q6_QL_BYTE] >> _Q6_QL_SHIFT) & 0xF
    hi = (b["qh"][:, _Q6_QH_BYTE] >> _Q6_QH_SHIFT) & 3
    q = (lo.astype(np.int32) | (hi.astype(np.int32) << 4)) - 32
    return (d * sc * q.astype(f32)).reshape(-1)


# ---------------------------------------------------------------------------
# Q8_K (activation companion format for K-quants)
# ---------------------------------------------------------------------------

def quantize_q8_K(x: np.ndarray) -> np.ndarray:
    xb = _blocks_in(x, QK_K)
    nb = len(xb)
    mx = _signed_absmax(xb)
    amax = np.abs(mx)
    dead = amax == 0
    mx_safe = np.where(dead, f32(1.0), mx)
    iscale = f32(-127.0) / mx_safe
    q = np.minimum(127, _nearest_int(iscale[:, None] * xb)).astype(np.int8)
    q = np.where(dead[:, None], 0, q)
    out = np.zeros(nb, dtype=BLOCK_DTYPES[GGMLType.Q8_K])
    out["d"] = np.where(dead, f32(0.0), _safe_inv(iscale))
    out["qs"] = q
    out["bsums"] = q.reshape(nb, 16, 16).sum(axis=2, dtype=np.int32).astype(np.int16)
    return out.view(np.uint8)


def dequantize_q8_K(raw: np.ndarray) -> np.ndarray:
    b = _blocks_view(raw, GGMLType.Q8_K)
    return (b["qs"].astype(f32) * b["d"][:, None]).reshape(-1)


# ---------------------------------------------------------------------------
# registry / public API
# ---------------------------------------------------------------------------

_QUANTIZERS = {
    GGMLType.Q4_0: quantize_q4_0,
    GGMLType.Q4_1: quantize_q4_1,
    GGMLType.Q5_0: quantize_q5_0,
    GGMLType.Q5_1: quantize_q5_1,
    GGMLType.Q8_0: quantize_q8_0,
    GGMLType.Q8_1: quantize_q8_1,
    GGMLType.Q2_K: quantize_q2_K,
    GGMLType.Q3_K: quantize_q3_K,
    GGMLType.Q4_K: quantize_q4_K,
    GGMLType.Q5_K: quantize_q5_K,
    GGMLType.Q6_K: quantize_q6_K,
    GGMLType.Q8_K: quantize_q8_K,
}

_DEQUANTIZERS = {
    GGMLType.Q4_0: dequantize_q4_0,
    GGMLType.Q4_1: dequantize_q4_1,
    GGMLType.Q5_0: dequantize_q5_0,
    GGMLType.Q5_1: dequantize_q5_1,
    GGMLType.Q8_0: dequantize_q8_0,
    GGMLType.Q8_1: dequantize_q8_1,
    GGMLType.Q2_K: dequantize_q2_K,
    GGMLType.Q3_K: dequantize_q3_K,
    GGMLType.Q4_K: dequantize_q4_K,
    GGMLType.Q5_K: dequantize_q5_K,
    GGMLType.Q6_K: dequantize_q6_K,
    GGMLType.Q8_K: dequantize_q8_K,
}


# native (C++) fast path: ggml_imax_tpu/native/codecs.cpp implements the same
# loops (bit-exact, differential-tested in tests/test_native_codecs.py)
_NATIVE_QUANT = {GGMLType.Q4_0: "q4_0", GGMLType.Q4_1: "q4_1",
                 GGMLType.Q5_0: "q5_0", GGMLType.Q5_1: "q5_1",
                 GGMLType.Q8_0: "q8_0", GGMLType.Q8_1: "q8_1",
                 GGMLType.Q2_K: "q2_K", GGMLType.Q3_K: "q3_K",
                 GGMLType.Q4_K: "q4_K", GGMLType.Q5_K: "q5_K",
                 GGMLType.Q6_K: "q6_K", GGMLType.Q8_K: "q8_K"}
_NATIVE_DEQUANT = {**_NATIVE_QUANT,
                   GGMLType.Q2_K: "q2_K", GGMLType.Q3_K: "q3_K",
                   GGMLType.Q4_K: "q4_K", GGMLType.Q5_K: "q5_K",
                   GGMLType.Q6_K: "q6_K", GGMLType.Q8_K: "q8_K"}


def _native_quantize(x: np.ndarray, t: GGMLType):
    if t not in _NATIVE_QUANT:
        return None
    from ..native import lib
    cdll = lib()
    if cdll is None:
        return None
    import ctypes
    info = FORMATS[t]
    xc = np.ascontiguousarray(x, dtype=np.float32)
    nb = xc.size // info.block_size
    out = np.empty(nb * info.type_size, np.uint8)
    getattr(cdll, f"{_NATIVE_QUANT[t]}_quantize")(
        xc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(nb))
    return out


def _native_dequantize(raw: np.ndarray, t: GGMLType):
    if t not in _NATIVE_DEQUANT:
        return None
    from ..native import lib
    cdll = lib()
    if cdll is None:
        return None
    import ctypes
    info = FORMATS[t]
    rc = np.ascontiguousarray(raw).view(np.uint8).reshape(-1)
    nb = rc.size // info.type_size
    out = np.empty(nb * info.block_size, np.float32)
    getattr(cdll, f"{_NATIVE_DEQUANT[t]}_dequantize")(
        rc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(nb))
    return out


def supported_types() -> list[GGMLType]:
    return sorted(_QUANTIZERS.keys())


def quantize(x: np.ndarray, t: GGMLType) -> np.ndarray:
    """Quantize float array (row-major; rows along the last axis must be a
    multiple of the block size) -> flat uint8 buffer of encoded blocks."""
    if t == GGMLType.F32:
        return np.ascontiguousarray(x, dtype=np.float32).view(np.uint8).reshape(-1)
    if t == GGMLType.F16:
        return np.ascontiguousarray(x, dtype=np.float32).astype(np.float16).view(np.uint8).reshape(-1)
    if t == GGMLType.BF16:
        u32 = np.ascontiguousarray(x, dtype=np.float32).view(np.uint32)
        # round-to-nearest-even truncation to bf16
        rounded = ((u32 + 0x7FFF + ((u32 >> 16) & 1)) >> 16).astype(np.uint16)
        return rounded.view(np.uint8).reshape(-1)
    nat = _native_quantize(x, t)
    if nat is not None:
        return nat
    return _QUANTIZERS[t](x).reshape(-1)


def dequantize(raw: np.ndarray, t: GGMLType, shape: tuple[int, ...] | None = None) -> np.ndarray:
    """Decode a flat uint8 buffer of blocks -> float32 array (flat or shaped)."""
    if t == GGMLType.F32:
        out = np.ascontiguousarray(raw).view(np.uint8).view(np.float32).copy()
    elif t == GGMLType.F16:
        out = np.ascontiguousarray(raw).view(np.uint8).view(np.float16).astype(np.float32)
    elif t == GGMLType.BF16:
        u16 = np.ascontiguousarray(raw).view(np.uint8).view(np.uint16)
        out = (u16.astype(np.uint32) << 16).view(np.float32).copy()
    else:
        out = _native_dequantize(raw, t)
        if out is None:
            out = _DEQUANTIZERS[t](raw)
    return out.reshape(shape) if shape is not None else out


# ---------------------------------------------------------------------------
# IQ4_NL: non-linear 4-bit (first of the "IQ" family; ggml-common.h:400-407,
# kvalues table ggml-quants.c:3321, quantizer quantize_row_iq4_nl_impl
# ggml-quants.c:14177-14260 with ntry=7, dequant :3323-3339)
# ---------------------------------------------------------------------------

KVALUES_IQ4NL = np.asarray([-127, -104, -83, -65, -49, -35, -22, -10,
                            1, 13, 25, 38, 53, 69, 89, 113], dtype=np.int8)

BLOCK_DTYPES[GGMLType.IQ4_NL] = np.dtype([("d", "<f2"), ("qs", "u1", (QK // 2,))])
assert BLOCK_DTYPES[GGMLType.IQ4_NL].itemsize == FORMATS[GGMLType.IQ4_NL].type_size


def _best_index_iq4nl(x: np.ndarray) -> np.ndarray:
    """Vectorized best_index_int8 (ggml-quants.c:14166): nearest entry of the
    sorted kvalues table, ties resolved toward the lower index."""
    vals = KVALUES_IQ4NL.astype(f32)
    mu = np.searchsorted(vals, x, side="left").astype(np.int32)
    mu = np.clip(mu, 1, 15)
    lo_closer = (x - vals[mu - 1]) < (vals[mu] - x)
    idx = np.where(lo_closer, mu - 1, mu)
    idx = np.where(x <= vals[0], 0, idx)
    idx = np.where(x >= vals[15], 15, idx)
    return idx.astype(np.uint8)


def quantize_iq4_nl(x: np.ndarray, ntry: int = 7,
                    qw: np.ndarray | None = None) -> np.ndarray:
    """ntry=7 matches the ggml_quantize_chunk path (quantize_iq4_nl,
    ggml-quants.c:14260+, what model files contain); ntry=-1 matches
    quantize_row_iq4_nl_reference (:14310-14328, no retry/re-index).
    qw enables the imatrix weighting of quantize_row_iq4_nl_impl
    (ggml-quants.c:14195-14198: weight = qw*sqrt(sigma2 + x^2), sigma2 =
    2*mean(x^2) over the 32-block). Reference quirk reproduced: an all-zero
    block stores d=0 and packs the *previous* block's L scratch buffer (stale
    stack state); we forward-fill the previous block's indices (zeros if the
    first block is dead)."""
    xb = _blocks_in(x, QK)
    nb = len(xb)
    vals = KVALUES_IQ4NL.astype(f32)
    if qw is None:
        w = xb * xb                                   # weight = x^2 (no qw)
    else:
        qwb = np.ascontiguousarray(qw, f32).reshape(nb, QK)
        sigma2 = (f32(2.0) / f32(QK) * _seqsum(xb * xb)).astype(f32)
        w = (qwb * np.sqrt(sigma2[:, None] + xb * xb)).astype(f32)
    mx = _signed_absmax(xb)
    amax = np.abs(mx)
    dead = amax == 0
    mx_safe = np.where(dead, f32(1.0), mx)

    def score(idv):
        L = _best_index_iq4nl(idv[:, None] * xb)
        q = vals[L]
        sumqx = _seqsum(w * q * xb)
        sumq2 = _seqsum(w * q * q)
        return L, sumqx, sumq2

    sign = f32(-1.0) if ntry > 0 else f32(1.0)
    d0 = (sign * mx_safe / vals[0]).astype(f32)
    L, sumqx, sumq2 = score((f32(1.0) / d0).astype(f32))
    with np.errstate(divide="ignore", invalid="ignore"):
        d = np.where(sumq2 > 0, sumqx / sumq2, f32(0.0)).astype(f32)
    best = d * sumqx
    if ntry > 0:
        for itry in range(-ntry, ntry + 1):
            idv = ((f32(itry) + vals[0]) / mx_safe).astype(f32)
            _, sqx, sq2 = score(idv)
            better = (sq2 > 0) & (sqx * sqx > best * sq2)
            with np.errstate(divide="ignore", invalid="ignore"):
                d = np.where(better, sqx / sq2, d).astype(f32)
            best = np.where(better, d * sqx, best)
        d = np.where(dead, f32(0.0), d)
        # final re-index against the chosen f32 scale (:14246-14251)
        L = _best_index_iq4nl(_safe_inv(d)[:, None] * xb)
    else:
        d = np.where(dead, f32(0.0), d)
        # dead blocks keep the previous block's L scratch (stale stack)
        if dead.any():
            Lf = L.copy()
            for i in np.nonzero(dead)[0]:
                Lf[i] = Lf[i - 1] if i > 0 else 0
            L = Lf
    out = np.zeros(nb, dtype=BLOCK_DTYPES[GGMLType.IQ4_NL])
    out["d"] = _fp16(d)
    out["qs"] = L[:, : QK // 2] | (L[:, QK // 2:] << 4)
    return out.view(np.uint8)


def dequantize_iq4_nl(raw: np.ndarray) -> np.ndarray:
    b = _blocks_view(raw, GGMLType.IQ4_NL)
    d = b["d"].astype(f32)[:, None]
    vals = KVALUES_IQ4NL.astype(f32)
    lo = vals[(b["qs"] & 0x0F).astype(np.int32)]
    hi = vals[(b["qs"] >> 4).astype(np.int32)]
    return (np.concatenate([lo, hi], axis=1) * d).reshape(-1)


_QUANTIZERS[GGMLType.IQ4_NL] = quantize_iq4_nl
_DEQUANTIZERS[GGMLType.IQ4_NL] = dequantize_iq4_nl


# ---------------------------------------------------------------------------
# IQ4_XS: IQ4_NL's nonlinear grid in QK_K super-blocks with 6-bit sub-scales
# (ggml-common.h:412-418; quantize via quantize_row_iq4_nl_impl with
# super_block_size=QK_K, ntry=7 — ggml-quants.c:14177-14260, :14330+;
# dequant ggml-quants.c:3341-3364)
# ---------------------------------------------------------------------------

BLOCK_DTYPES[GGMLType.IQ4_XS] = np.dtype(
    [("d", "<f2"), ("scales_h", "<u2"), ("scales_l", "u1", (QK_K // 64,)),
     ("qs", "u1", (QK_K // 2,))])
assert BLOCK_DTYPES[GGMLType.IQ4_XS].itemsize == FORMATS[GGMLType.IQ4_XS].type_size


def _iq4_block_scale(xb32, ntry=7, w=None):
    """Per-32 scale search of quantize_row_iq4_nl_impl (vectorized across
    blocks): xb32 (nb, 32) -> scales (nb,) f32 (0 for dead blocks). w
    overrides the default x^2 weights (imatrix path)."""
    vals = KVALUES_IQ4NL.astype(f32)
    if w is None:
        w = xb32 * xb32
    mx = _signed_absmax(xb32)
    amax = np.abs(mx)
    dead = amax == 0
    mx_safe = np.where(dead, f32(1.0), mx)

    def score(idv):
        L = _best_index_iq4nl(idv[:, None] * xb32)
        q = vals[L]
        return _seqsum(w * q * xb32), _seqsum(w * q * q)

    d0 = (-mx_safe / vals[0]).astype(f32)
    sumqx, sumq2 = score((f32(1.0) / d0).astype(f32))
    with np.errstate(divide="ignore", invalid="ignore"):
        d = np.where(sumq2 > 0, sumqx / sumq2, f32(0.0)).astype(f32)
    best = d * sumqx
    for itry in range(-ntry, ntry + 1):
        idv = ((f32(itry) + vals[0]) / mx_safe).astype(f32)
        sqx, sq2 = score(idv)
        better = (sq2 > 0) & (sqx * sqx > best * sq2)
        with np.errstate(divide="ignore", invalid="ignore"):
            d = np.where(better, sqx / sq2, d).astype(f32)
        best = np.where(better, d * sqx, best)
    return np.where(dead, f32(0.0), d)


def quantize_iq4_xs(x: np.ndarray, qw: np.ndarray | None = None) -> np.ndarray:
    xb = _blocks_in(x, QK_K)
    nb = len(xb)
    if qw is None:
        w = None
    else:
        # imatrix weights: sigma2 is per 256-super-block (ggml-quants.c:14184)
        qwb = np.ascontiguousarray(qw, f32).reshape(nb, QK_K)
        sigma2 = (f32(2.0) / f32(QK_K) * _seqsum(xb * xb)).astype(f32)
        w = (qwb * np.sqrt(sigma2[:, None] + xb * xb)).astype(f32).reshape(nb * 8, 32)
    scales = _iq4_block_scale(xb.reshape(nb * 8, 32), w=w).reshape(nb, 8)

    # 6-bit super-scale (ggml-quants.c:14231-14245)
    amax_idx = np.argmax(np.abs(scales), axis=1)
    max_scale = np.take_along_axis(scales, amax_idx[:, None], axis=1)[:, 0]
    amax_scale = np.abs(max_scale)
    d = (-max_scale / f32(32.0)).astype(f32)
    idv = _safe_inv(d)
    l6 = np.clip(_nearest_int(idv[:, None] * scales), -32, 31)

    dh = _fp16(d)
    # NB: the reference re-indexes with the f32 d (not the fp16-rounded one)
    dl = d[:, None] * l6.astype(f32)
    with np.errstate(divide="ignore", invalid="ignore"):
        idl = np.where(dl != 0, f32(1.0) / dl, f32(0.0)).astype(f32)
    L = _best_index_iq4nl(np.repeat(idl, 32, axis=1) * xb)  # (nb, 256)

    l6s = (l6 + 32).astype(np.uint32)
    lo = (l6s & 0xF).astype(np.uint8)
    hi = (l6s >> 4).astype(np.uint32)
    scales_l = (lo[:, 0::2] | (lo[:, 1::2] << 4)).astype(np.uint8)
    ib = np.arange(8, dtype=np.uint32)
    scales_h = (hi << (2 * ib)[None, :]).sum(axis=1, dtype=np.uint32).astype(np.uint16)

    Lg = L.reshape(nb, 8, 2, 16)
    qs = (Lg[:, :, 0] | (Lg[:, :, 1] << 4)).reshape(nb, QK_K // 2)

    out = np.zeros(nb, dtype=BLOCK_DTYPES[GGMLType.IQ4_XS])
    out["d"] = dh
    out["scales_h"] = scales_h
    out["scales_l"] = scales_l
    out["qs"] = qs
    return out.view(np.uint8)


def dequantize_iq4_xs(raw: np.ndarray) -> np.ndarray:
    b = _blocks_view(raw, GGMLType.IQ4_XS)
    d = b["d"].astype(f32)[:, None]
    vals = KVALUES_IQ4NL.astype(f32)
    lo6 = np.concatenate([b["scales_l"] & 0xF, b["scales_l"] >> 4], axis=1)
    # interleave even/odd back to block order
    lo6 = lo6.reshape(-1, 2, 4).transpose(0, 2, 1).reshape(-1, 8)
    ib = np.arange(8)
    hi6 = ((b["scales_h"][:, None].astype(np.uint32) >> (2 * ib)[None, :]) & 3)
    ls = (lo6.astype(np.int32) | (hi6.astype(np.int32) << 4)) - 32   # (nb, 8)
    dl = d * ls.astype(f32)                                           # (nb, 8)
    g = b["qs"].reshape(-1, 8, 16)
    q = np.concatenate([vals[(g & 0xF).astype(np.int32)],
                        vals[(g >> 4).astype(np.int32)]], axis=2)     # (nb,8,32)
    return (dl[:, :, None] * q).reshape(-1)


_QUANTIZERS[GGMLType.IQ4_XS] = quantize_iq4_xs
_DEQUANTIZERS[GGMLType.IQ4_XS] = dequantize_iq4_xs


# ---------------------------------------------------------------------------
# IQ2_XXS / IQ2_XS / IQ3_XXS — codebook ("grid") formats, DECODE ONLY.
# Grids shipped as package data (iq_grids.npz, the formats' normative
# constants from ggml-common.h); sign table ksigns is computed (7 sign bits
# + odd-parity bit). Quantizers require a k-means-style grid search with an
# importance matrix (ggml_quantize_requires_imatrix) — not implemented.
# Reference dequant loops: ggml-quants.c:3066-3130 (iq2), :3169-3199 (iq3).
# ---------------------------------------------------------------------------

BLOCK_DTYPES[GGMLType.IQ2_XXS] = np.dtype([("d", "<f2"), ("qs", "<u2", (QK_K // 8,))])
BLOCK_DTYPES[GGMLType.IQ2_XS] = np.dtype(
    [("d", "<f2"), ("qs", "<u2", (QK_K // 8,)), ("scales", "u1", (QK_K // 32,))])
BLOCK_DTYPES[GGMLType.IQ3_XXS] = np.dtype([("d", "<f2"), ("qs", "u1", (3 * QK_K // 8,))])
for _t in (GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ3_XXS):
    assert BLOCK_DTYPES[_t].itemsize == FORMATS[_t].type_size, _t


def _iq_grids():
    import pathlib
    z = np.load(pathlib.Path(__file__).parent / "iq_grids.npz")
    return z["iq2xxs_grid"], z["iq2xs_grid"], z["iq3xxs_grid"]


def _ksigns() -> np.ndarray:
    """ksigns_iq2xs: 7 sign bits + odd-parity high bit, expanded to the
    per-element sign table (128, 8) of +-1."""
    i = np.arange(128, dtype=np.uint8)
    par = i.copy()
    par ^= par >> 4
    par ^= par >> 2
    par ^= par >> 1
    ks = i | ((par & 1) << 7).astype(np.uint8)   # bit7 = odd popcount
    bits = (ks[:, None] >> np.arange(8)) & 1
    return np.where(bits == 1, f32(-1.0), f32(1.0))


_KSIGNS8 = _ksigns()


def dequantize_iq2_xxs(raw: np.ndarray) -> np.ndarray:
    g2xxs, _, _ = _iq_grids()
    grid = g2xxs.view(np.uint8).reshape(256, 8).astype(f32)
    b = _blocks_view(raw, GGMLType.IQ2_XXS)
    d = b["d"].astype(f32)
    q = b["qs"].reshape(-1, 8, 4)                    # (nb, ib32, 4 u16)
    aux0 = q[:, :, :2].copy().view(np.uint32)[..., 0]          # grid bytes
    aux1 = q[:, :, 2:].copy().view(np.uint32)[..., 0]          # signs+scale
    db = d[:, None] * (f32(0.5) + (aux1 >> 28).astype(f32)) * f32(0.25)
    idx = np.stack([(aux0 >> (8 * l)) & 0xFF for l in range(4)], axis=-1)
    sidx = np.stack([(aux1 >> (7 * l)) & 127 for l in range(4)], axis=-1)
    vals = grid[idx] * _KSIGNS8[sidx]                # (nb, 8, 4, 8)
    return (db[:, :, None, None] * vals).reshape(-1)


def dequantize_iq2_xs(raw: np.ndarray) -> np.ndarray:
    _, g2xs, _ = _iq_grids()
    grid = g2xs.view(np.uint8).reshape(512, 8).astype(f32)
    b = _blocks_view(raw, GGMLType.IQ2_XS)
    d = b["d"].astype(f32)
    q = b["qs"].reshape(-1, 8, 4).astype(np.uint32)  # (nb, ib32, l)
    sc = b["scales"]                                 # (nb, 8)
    db0 = d[:, None] * (f32(0.5) + (sc & 0xF).astype(f32)) * f32(0.25)
    db1 = d[:, None] * (f32(0.5) + (sc >> 4).astype(f32)) * f32(0.25)
    db = np.stack([db0, db0, db1, db1], axis=-1)     # (nb, 8, 4): l//2 pick
    vals = grid[q & 511] * _KSIGNS8[q >> 9]          # (nb, 8, 4, 8)
    return (db[:, :, :, None] * vals).reshape(-1)


def dequantize_iq3_xxs(raw: np.ndarray) -> np.ndarray:
    _, _, g3 = _iq_grids()
    grid = g3.view(np.uint8).reshape(256, 4).astype(f32)
    b = _blocks_view(raw, GGMLType.IQ3_XXS)
    d = b["d"].astype(f32)
    qs = b["qs"][:, : QK_K // 4].reshape(-1, 8, 8)   # grid bytes (nb, ib32, 8)
    aux = b["qs"][:, QK_K // 4:].copy().view("<u4").reshape(-1, 8)
    db = d[:, None] * (f32(0.5) + (aux >> 28).astype(f32)) * f32(0.5)
    sidx = np.stack([(aux >> (7 * l)) & 127 for l in range(4)], axis=-1)
    signs = _KSIGNS8[sidx]                           # (nb, 8, 4, 8)
    g1 = grid[qs[:, :, 0::2]]                        # (nb, 8, 4, 4)
    g2 = grid[qs[:, :, 1::2]]
    vals = np.concatenate([g1, g2], axis=-1)         # order j:0..3 then 4..7
    return (db[:, :, None, None] * vals * signs).reshape(-1)


_DEQUANTIZERS[GGMLType.IQ2_XXS] = dequantize_iq2_xxs
_DEQUANTIZERS[GGMLType.IQ2_XS] = dequantize_iq2_xs
_DEQUANTIZERS[GGMLType.IQ3_XXS] = dequantize_iq3_xxs


# IQ2_S / IQ3_S / IQ1_S / IQ1_M — decode only (reference loops
# ggml-quants.c:3133-3167 (iq2_s), :3201-3240 (iq3_s), :3235-3258 (iq1_s),
# :3260-3320 (iq1_m)); grids in iq_grids.npz; IQ1*_DELTA = 0.125
# (ggml-common.h:1074-1075).

BLOCK_DTYPES[GGMLType.IQ2_S] = np.dtype(
    [("d", "<f2"), ("qs", "u1", (QK_K // 4,)), ("qh", "u1", (QK_K // 32,)),
     ("scales", "u1", (QK_K // 32,))])
BLOCK_DTYPES[GGMLType.IQ3_S] = np.dtype(
    [("d", "<f2"), ("qs", "u1", (QK_K // 4,)), ("qh", "u1", (QK_K // 32,)),
     ("signs", "u1", (QK_K // 8,)), ("scales", "u1", (QK_K // 64,))])
BLOCK_DTYPES[GGMLType.IQ1_S] = np.dtype(
    [("d", "<f2"), ("qs", "u1", (QK_K // 8,)), ("qh", "<u2", (QK_K // 32,))])
BLOCK_DTYPES[GGMLType.IQ1_M] = np.dtype(
    [("qs", "u1", (QK_K // 8,)), ("qh", "u1", (QK_K // 16,)),
     ("scales", "u1", (QK_K // 32,))])
for _t in (GGMLType.IQ2_S, GGMLType.IQ3_S, GGMLType.IQ1_S, GGMLType.IQ1_M):
    assert BLOCK_DTYPES[_t].itemsize == FORMATS[_t].type_size, _t

IQ1_DELTA = f32(0.125)


def _sign_bits(bytes_):
    """uint8 (..., n) -> +-1 f32 (..., n, 8) from raw sign bytes."""
    bits = (bytes_[..., None] >> np.arange(8)) & 1
    return np.where(bits == 1, f32(-1.0), f32(1.0))


def dequantize_iq2_s(raw: np.ndarray) -> np.ndarray:
    import pathlib
    z = np.load(pathlib.Path(__file__).parent / "iq_grids.npz")
    grid = z["iq2s_grid"].view(np.uint8).reshape(1024, 8).astype(f32)
    b = _blocks_view(raw, GGMLType.IQ2_S)
    d = b["d"].astype(f32)
    qs = b["qs"][:, :QK_K // 8].reshape(-1, 8, 4).astype(np.uint32)
    signs = b["qs"][:, QK_K // 8:].reshape(-1, 8, 4)
    qh = b["qh"].astype(np.uint32)                   # (nb, 8)
    sc = b["scales"]
    db0 = d[:, None] * (f32(0.5) + (sc & 0xF).astype(f32)) * f32(0.25)
    db1 = d[:, None] * (f32(0.5) + (sc >> 4).astype(f32)) * f32(0.25)
    db = np.stack([db0, db0, db1, db1], axis=-1)     # (nb, 8, 4)
    l = np.arange(4)
    idx = qs | ((qh[:, :, None] << (8 - 2 * l)) & 0x300)
    vals = grid[idx] * _sign_bits(signs)             # (nb, 8, 4, 8)
    return (db[:, :, :, None] * vals).reshape(-1)


def dequantize_iq3_s(raw: np.ndarray) -> np.ndarray:
    import pathlib
    z = np.load(pathlib.Path(__file__).parent / "iq_grids.npz")
    grid = z["iq3s_grid"].view(np.uint8).reshape(512, 4).astype(f32)
    b = _blocks_view(raw, GGMLType.IQ3_S)
    d = b["d"].astype(f32)
    qs = b["qs"].reshape(-1, 8, 8).astype(np.uint32)     # per ib32: 8 bytes
    qh = b["qh"].astype(np.uint32)                       # (nb, 8)
    signs = b["signs"].reshape(-1, 8, 4)
    sc = b["scales"]                                     # (nb, 4)
    dbl = d[:, None] * (1 + 2 * (sc & 0xF).astype(f32))  # ib32 even
    dbh = d[:, None] * (1 + 2 * (sc >> 4).astype(f32))   # ib32 odd
    db = np.stack([dbl, dbh], axis=-1).reshape(-1, 8)    # (nb, ib32)
    l = np.arange(4)
    idx1 = qs[:, :, 0::2] | ((qh[:, :, None] << (8 - 2 * l)) & 256)
    idx2 = qs[:, :, 1::2] | ((qh[:, :, None] << (7 - 2 * l)) & 256)
    g = np.concatenate([grid[idx1], grid[idx2]], axis=-1)  # (nb,8,4,8) j0-3|4-7
    vals = g * _sign_bits(signs)
    return (db[:, :, None, None] * vals).reshape(-1)


def dequantize_iq1_s(raw: np.ndarray) -> np.ndarray:
    import pathlib
    z = np.load(pathlib.Path(__file__).parent / "iq_grids.npz")
    grid = z["iq1s_grid"].view(np.int8).reshape(2048, 8).astype(f32)
    b = _blocks_view(raw, GGMLType.IQ1_S)
    d = b["d"].astype(f32)
    qs = b["qs"].reshape(-1, 8, 4).astype(np.uint32)
    qh = b["qh"].astype(np.uint32)                   # (nb, 8)
    dl = d[:, None] * (2 * ((qh >> 12) & 7).astype(f32) + 1)
    delta = np.where((qh & 0x8000) != 0, -IQ1_DELTA, IQ1_DELTA)  # (nb, 8)
    l = np.arange(4)
    idx = qs | (((qh[:, :, None] >> (3 * l)) & 7) << 8)
    vals = grid[idx] + delta[:, :, None, None]
    return (dl[:, :, None, None] * vals).reshape(-1)


def dequantize_iq1_m(raw: np.ndarray) -> np.ndarray:
    import pathlib
    z = np.load(pathlib.Path(__file__).parent / "iq_grids.npz")
    grid = z["iq1s_grid"].view(np.int8).reshape(2048, 8).astype(f32)
    b = _blocks_view(raw, GGMLType.IQ1_M)
    sc = b["scales"].copy().view("<u2")              # (nb, 4)
    du16 = ((sc[:, 0] >> 12) | ((sc[:, 1] >> 8) & 0x00F0)
            | ((sc[:, 2] >> 4) & 0x0F00) | (sc[:, 3] & 0xF000)).astype(np.uint16)
    d = du16.view(np.float16).astype(f32)            # fp16 super scale
    qs = b["qs"].reshape(-1, 8, 4).astype(np.uint32)
    qh = b["qh"].reshape(-1, 8, 2).astype(np.uint32)
    # per ib: dl1 (pairs l=0,1), dl2 (l=2,3) from 3-bit scales
    ib = np.arange(8)
    s3 = (sc[:, ib // 2 % 4] >> (6 * (ib % 2))[None, :])
    dl1 = d[:, None] * (2 * ((s3 >> 0) & 7).astype(f32) + 1)
    dl2 = d[:, None] * (2 * ((s3 >> 3) & 7).astype(f32) + 1)
    dl = np.stack([dl1, dl1, dl2, dl2], axis=-1)     # (nb, 8, 4)
    idx = np.stack([
        qs[:, :, 0] | ((qh[:, :, 0] << 8) & 0x700),
        qs[:, :, 1] | ((qh[:, :, 0] << 4) & 0x700),
        qs[:, :, 2] | ((qh[:, :, 1] << 8) & 0x700),
        qs[:, :, 3] | ((qh[:, :, 1] << 4) & 0x700)], axis=-1)
    delta = np.stack([
        np.where((qh[:, :, 0] & 0x08) != 0, -IQ1_DELTA, IQ1_DELTA),
        np.where((qh[:, :, 0] & 0x80) != 0, -IQ1_DELTA, IQ1_DELTA),
        np.where((qh[:, :, 1] & 0x08) != 0, -IQ1_DELTA, IQ1_DELTA),
        np.where((qh[:, :, 1] & 0x80) != 0, -IQ1_DELTA, IQ1_DELTA)], axis=-1)
    vals = grid[idx] + delta[:, :, :, None]
    return (dl[:, :, :, None] * vals).reshape(-1)


_DEQUANTIZERS[GGMLType.IQ2_S] = dequantize_iq2_s
_DEQUANTIZERS[GGMLType.IQ3_S] = dequantize_iq3_s
_DEQUANTIZERS[GGMLType.IQ1_S] = dequantize_iq1_s
_DEQUANTIZERS[GGMLType.IQ1_M] = dequantize_iq1_m
