"""Device (TPU) representation of quantized weights.

ggml's on-disk block formats are decoded once at load time into a small set of
TPU-friendly layouts (the analog of the reference's per-backend re-encodings,
e.g. CUDA's dequantize_block kernels — src/ggml-cuda/convert.cu):

- ``nib4``: two 4-bit values per byte, shape (K/2, N) uint8, *intra-block
  plane split* (byte row 16b+j holds elements 32b+j in the low nibble and
  32b+16+j in the high nibble — the transpose of ggml's q4 block layout).
  Semantics: w[k, n] = (nib - zero) * scale[g, n] + bias[g, n], g = k//group.
  `zero` is a per-tensor integer zero-point chosen so the affine bias only
  carries a format's true minimum — folding e.g. 8*scale into the bias
  instead would cancel catastrophically at bf16 (observed with q2_K).
- ``int8``: shape (K, N) int8.
  Semantics: w[k, n] = q * scale[g, n] + bias[g, n].
- ``dense``: unquantized bf16/f32 weights, shape (K, N).
- codebook variants for the IQ formats (compressed device residency — the
  analog of the reference streaming these compressed on device,
  src/ggml-cuda/vecdotq.cuh): ``nib4`` with ``lut`` set stores a 4-bit
  sign+magnitude code (w = lut16[nib] * scale; IQ3_S/IQ3_XXS — both grids
  have exactly 8 distinct magnitudes); ``nib2`` stores a 2-bit magnitude
  code (all IQ2 grids share the 3 magnitudes {8, 25, 43}) plus a (K/8, N)
  sign bitplane (w = ±lut4[q2] * scale). Both are exact and run the
  XLA dequant-fused matmul path at their packed width.

K is the contraction dimension (ggml ne[0]); all formats carry one scale (and
optionally one bias) per 32 contraction elements per output column, which
uniformly covers both the basic formats (d/m per 32-block) and the K-quant
super-blocks (d*sub_scale / dmin*sub_min folded at load time, f32).

Note jnp.int4 is deliberately not used: the axon TPU runtime cannot
materialize int4 arrays (see .claude/skills/verify/SKILL.md).
"""
from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial
from typing import Optional

import numpy as np

from . import codecs
from .formats import FORMATS, QK_K, GGMLType

f32 = np.float32


@dataclass
class QTensor:
    """Quantized weight in device layout. Arrays may be numpy (host staging)
    or jax.Array (on device) — the ops only rely on __array_namespace__-level
    semantics and jnp operations."""
    kind: str                 # "nib4" | "int8" | "dense"
    q: object                 # see module docstring
    scale: Optional[object]   # (K/32, N) f32, None for dense
    bias: Optional[object]    # (K/32, N) f32 or None
    k: int
    n: int
    ggml_type: GGMLType
    zero: int = 0             # nib4 zero-point (see module docstring)
    interleaved_bk: int = 0   # 0 = natural layout; else fused-kernel tile
    q4_layout: int = 0        # 0 = plane-split nibbles (ops/pallas_qmm
                              # repack_interleaved); 1 = row-pair int4-bitcast
                              # layout (repack_rowpair_device) — adjacent
                              # contraction rows share a byte, values stored
                              # XOR 8 so a signed-int4 bitcast yields q-zero
    name: str = ""            # stable identity (static pytree aux) — survives
                              # jit tracing; imatrix collection keys on it
                              # (llama.cpp's imatrix is name-keyed too)
    n_stack: int = 0          # 0 = single tensor; L = per-layer stack: every
                              # array child carries a leading L dim and the
                              # fused kernels select a layer by scalar-
                              # prefetched index (stack_layers / ops/
                              # pallas_qmm stacked paths) — the device-side
                              # layout that lets lax.scan-over-layers stream
                              # weights with no per-layer gather/copy
    lut: Optional[object] = None   # codebook value table: nib4 -> 16-entry
                              # signed-magnitude LUT (w = lut[nib] * scale),
                              # nib2 -> 4-entry magnitude LUT. Set for the
                              # compressed IQ residency layouts; None keeps
                              # the affine (q - zero) * scale semantics
    signs: Optional[object] = None  # (K/8, N) uint8 sign bitplane for the
                              # nib2 kind (bit j of byte row r = sign of
                              # element 8r+j; 1 = negative)

    def tree_flatten(self):
        return (self.q, self.scale, self.bias, self.lut, self.signs), (
            self.kind, self.k, self.n, self.ggml_type, self.zero,
            self.interleaved_bk, self.q4_layout, self.name, self.n_stack)

    @classmethod
    def tree_unflatten(cls, aux, children):
        q, scale, bias, lut, signs = children
        kind, k, n, t, z, ibk, q4l, name, ns = aux
        return cls(kind, q, scale, bias, k, n, t, z, ibk, q4l, name, ns,
                   lut, signs)


try:  # register as a pytree so QTensors pass through jit/pjit boundaries
    import jax.tree_util as _jtu
    _jtu.register_pytree_node(QTensor,
                              lambda t: t.tree_flatten(),
                              lambda aux, ch: QTensor.tree_unflatten(aux, ch))
except Exception:  # pragma: no cover
    pass


def _blocks(raw: np.ndarray, t: GGMLType, n_rows: int, row_len: int):
    """View encoded bytes as structured blocks, shaped (n_rows, blocks_per_row)."""
    bv = codecs._blocks_view(raw, t)
    return bv.reshape(n_rows, row_len // FORMATS[t].block_size)


def _nib4_from_u8(vals: np.ndarray) -> np.ndarray:
    """vals: (N, K) unsigned 4-bit values in natural element order ->
    packed (K/2, N) uint8 with intra-block plane split."""
    n, k = vals.shape
    v = vals.reshape(n, k // 32, 2, 16)          # (N, B, half, j)
    lo = v[:, :, 0, :]
    hi = v[:, :, 1, :]
    packed = (lo | (hi << 4)).astype(np.uint8)   # (N, B, 16)
    return np.ascontiguousarray(packed.reshape(n, k // 2).T)


def _per32(arr_nb: np.ndarray) -> np.ndarray:
    """(N, K/32) -> (K/32, N) f32, contiguous."""
    return np.ascontiguousarray(arr_nb.T.astype(f32))


def _k_scale_min(b) -> tuple[np.ndarray, np.ndarray]:
    """Unpack q4_K/q5_K 6-bit sub-scales/mins -> effective f32 (nr, nb*8) each."""
    sc = b["scales"]
    d6, m6 = codecs._unpack_scale_min_k4(sc)
    d = b["d"].astype(f32)[..., None] * d6.astype(f32)
    m = b["dmin"].astype(f32)[..., None] * m6.astype(f32)
    return d, m


def _nib2_from_codes(codes: np.ndarray) -> np.ndarray:
    """codes: (N, K) uint8 values in [0, 3], natural element order ->
    packed (K/4, N) uint8 (element k in byte k//4 at shift 2*(k%4))."""
    nn, k = codes.shape
    v = codes.reshape(nn, k // 4, 4).astype(np.uint16)
    packed = (v[:, :, 0] | (v[:, :, 1] << 2) | (v[:, :, 2] << 4)
              | (v[:, :, 3] << 6)).astype(np.uint8)
    return np.ascontiguousarray(packed.T)


def _bitplane(bits: np.ndarray) -> np.ndarray:
    """bits: (N, K) 0/1, natural order -> (K/8, N) uint8 (element k is bit
    k%8 of byte row k//8)."""
    nn, k = bits.shape
    v = bits.reshape(nn, k // 8, 8).astype(np.uint16)
    packed = (v << np.arange(8, dtype=np.uint16)).sum(-1).astype(np.uint8)
    return np.ascontiguousarray(packed.T)


_IQ_GRIDS = None


def _iq_grids_npz():
    """Cached iq_grids.npz (to_device_format runs once per weight tensor —
    hundreds of times for a real model — and per shard under the sharded
    loader; don't re-inflate the archive each time)."""
    global _IQ_GRIDS
    if _IQ_GRIDS is None:
        import pathlib
        _IQ_GRIDS = dict(np.load(pathlib.Path(__file__).parent
                                 / "iq_grids.npz"))
    return _IQ_GRIDS


def _iq3_decompose(b, t: GGMLType, n: int, k: int):
    """IQ3_S/IQ3_XXS blocks -> (mag (n,k) uint8 grid magnitudes, neg (n,k)
    0/1 signs, db (n, k/32) f32 per-32 scales) in natural element order —
    mirrors codecs.dequantize_iq3_{s,xxs} exactly (same f32 op order)."""
    z = _iq_grids_npz()
    d = b["d"].astype(f32)                              # (n, NB)
    if t == GGMLType.IQ3_S:
        grid = z["iq3s_grid"].view(np.uint8).reshape(512, 4)
        qs = b["qs"].reshape(n, -1, 8, 8).astype(np.uint32)
        qh = b["qh"].astype(np.uint32)                  # (n, NB, 8)
        sgn = b["signs"].reshape(n, -1, 8, 4)
        sc = b["scales"]                                # (n, NB, 4)
        dbl = d[..., None] * (1 + 2 * (sc & 0xF).astype(f32))
        dbh = d[..., None] * (1 + 2 * (sc >> 4).astype(f32))
        db = np.stack([dbl, dbh], axis=-1).reshape(n, -1)   # (n, k/32)
        l = np.arange(4)
        idx1 = qs[..., 0::2] | ((qh[..., None] << (8 - 2 * l)) & 256)
        idx2 = qs[..., 1::2] | ((qh[..., None] << (7 - 2 * l)) & 256)
        mag = np.concatenate([grid[idx1], grid[idx2]], axis=-1)
        neg = (codecs._sign_bits(sgn) < 0).astype(np.uint8)
    else:
        grid = z["iq3xxs_grid"].view(np.uint8).reshape(256, 4)
        qs = b["qs"][:, :, :QK_K // 4].reshape(n, -1, 8, 8)
        aux = np.ascontiguousarray(b["qs"][:, :, QK_K // 4:]) \
            .view("<u4").reshape(n, -1, 8)
        db32 = d[..., None] * (f32(0.5) + (aux >> 28).astype(f32)) * f32(0.5)
        db = db32.reshape(n, -1)
        l = np.arange(4)
        sidx = np.stack([(aux >> (7 * li)) & 127 for li in l], axis=-1)
        neg = (codecs._KSIGNS8[sidx] < 0).astype(np.uint8)
        mag = np.concatenate([grid[qs[..., 0::2]], grid[qs[..., 1::2]]],
                             axis=-1)
    return mag.reshape(n, k), neg.reshape(n, k), db


def _iq2_decompose(b, t: GGMLType, n: int, k: int):
    """IQ2_XXS/XS/S blocks -> (mag, neg, db, scale_group): natural-order
    grid magnitudes/signs plus per-group scales (group 32 for XXS, 16 for
    XS/S) — mirrors codecs.dequantize_iq2_* exactly."""
    import pathlib
    z = np.load(pathlib.Path(__file__).parent / "iq_grids.npz")
    d = b["d"].astype(f32)
    if t == GGMLType.IQ2_XXS:
        grid = z["iq2xxs_grid"].view(np.uint8).reshape(256, 8)
        q = b["qs"].reshape(n, -1, 8, 4)
        aux0 = np.ascontiguousarray(q[..., :2]).view("<u4")[..., 0]
        aux1 = np.ascontiguousarray(q[..., 2:]).view("<u4")[..., 0]
        db = (d[..., None] * (f32(0.5) + (aux1 >> 28).astype(f32))
              * f32(0.25)).reshape(n, -1)               # per-32
        l = np.arange(4)
        idx = np.stack([(aux0 >> (8 * li)) & 0xFF for li in l], axis=-1)
        sidx = np.stack([(aux1 >> (7 * li)) & 127 for li in l], axis=-1)
        mag = grid[idx]
        neg = (codecs._KSIGNS8[sidx] < 0).astype(np.uint8)
        return mag.reshape(n, k), neg.reshape(n, k), db, 32
    if t == GGMLType.IQ2_XS:
        grid = z["iq2xs_grid"].view(np.uint8).reshape(512, 8)
        q = b["qs"].reshape(n, -1, 8, 4).astype(np.uint32)
        sc = b["scales"]
        mag = grid[q & 511]
        neg = (codecs._KSIGNS8[q >> 9] < 0).astype(np.uint8)
    else:                                               # IQ2_S
        grid = z["iq2s_grid"].view(np.uint8).reshape(1024, 8)
        qs = b["qs"][:, :, :QK_K // 8].reshape(n, -1, 8, 4).astype(np.uint32)
        sgn = b["qs"][:, :, QK_K // 8:].reshape(n, -1, 8, 4)
        qh = b["qh"].astype(np.uint32)
        sc = b["scales"]
        l = np.arange(4)
        idx = qs | ((qh[..., None] << (8 - 2 * l)) & 0x300)
        mag = grid[idx]
        neg = (codecs._sign_bits(sgn) < 0).astype(np.uint8)
    db0 = d[..., None] * (f32(0.5) + (sc & 0xF).astype(f32)) * f32(0.25)
    db1 = d[..., None] * (f32(0.5) + (sc >> 4).astype(f32)) * f32(0.25)
    # per (ib32, l-pair): db0 covers elements 0-15, db1 16-31 -> per-16 rows
    db16 = np.stack([db0, db1], axis=-1).reshape(n, -1)
    return mag.reshape(n, k), neg.reshape(n, k), db16, 16


def to_device_format(raw: np.ndarray, t: GGMLType, shape_ne: tuple[int, ...]) -> QTensor:
    """Decode a ggml-encoded weight into device layout.

    shape_ne is the ggml shape (ne[0]=row length=K first). 2-D weights only;
    higher-rank tensors should be reshaped by the caller (e.g. expert stacks).
    """
    k = shape_ne[0]
    n = 1
    for d in shape_ne[1:]:
        n *= d

    if t in (GGMLType.F32, GGMLType.F16, GGMLType.BF16):
        w = codecs.dequantize(raw, t, shape=(n, k)).T  # (K, N)
        return QTensor("dense", np.ascontiguousarray(w), None, None, k, n, t)

    info = FORMATS[t]
    assert k % info.block_size == 0, (t, k)
    b = _blocks(raw, t, n, k)
    nb32 = k // 32  # 32-element groups per row

    if t == GGMLType.Q4_0:
        d = b["d"].astype(f32)                        # (N, K/32)
        qs = b["qs"]                                  # (N, K/32, 16)
        lo = qs & 0x0F
        hi = qs >> 4
        vals = np.concatenate([lo, hi], axis=2).reshape(n, k)
        return QTensor("nib4", _nib4_from_u8(vals), _per32(d), None, k, n, t, zero=8)

    if t == GGMLType.Q4_1:
        d = b["d"].astype(f32)
        m = b["m"].astype(f32)
        qs = b["qs"]
        vals = np.concatenate([qs & 0x0F, qs >> 4], axis=2).reshape(n, k)
        return QTensor("nib4", _nib4_from_u8(vals), _per32(d), _per32(m), k, n, t, zero=0)

    if t in (GGMLType.Q5_0, GGMLType.Q5_1):
        d = b["d"].astype(f32)
        qh = b["qh"][..., None].astype(np.uint32)     # (N, K/32, 1)
        j = np.arange(16, dtype=np.uint32)
        xh0 = (((qh >> j) << 4) & 0x10).astype(np.uint8)
        xh1 = ((qh >> (j + 12)) & 0x10).astype(np.uint8)
        lo = (b["qs"] & 0x0F) | xh0
        hi = (b["qs"] >> 4) | xh1
        q5 = np.concatenate([lo, hi], axis=2).reshape(n, k).astype(np.int16)
        if t == GGMLType.Q5_0:
            qdev = np.ascontiguousarray((q5 - 16).astype(np.int8).T)
            return QTensor("int8", qdev, _per32(d), None, k, n, t)
        qdev = np.ascontiguousarray(q5.astype(np.int8).T)   # raw [0, 31]
        m = b["m"].astype(f32)
        return QTensor("int8", qdev, _per32(d), _per32(m), k, n, t)

    if t in (GGMLType.Q8_0, GGMLType.Q8_1):
        d = b["d"].astype(f32)
        qdev = np.ascontiguousarray(b["qs"].reshape(n, k).T)
        return QTensor("int8", qdev, _per32(d), None, k, n, t)

    if t == GGMLType.Q2_K:
        d = b["d"].astype(f32)[..., None] * (b["scales"] & 0xF).astype(f32)   # (N, SB, 16)
        m = b["dmin"].astype(f32)[..., None] * (b["scales"] >> 4).astype(f32)
        q = ((b["qs"][:, :, codecs._Q2_BYTE] >> codecs._Q2_SHIFT) & 3).astype(np.uint8)
        # q2_K sub-blocks are 16 wide: emit per-16 scale/bias (shape (K/16, N));
        # ops derive the group length from the scale shape.
        scale16 = d.reshape(n, -1)
        bias16 = -m.reshape(n, -1)                    # w = q*s - m
        vals = q.reshape(n, k)
        return QTensor("nib4", _nib4_from_u8(vals),
                       np.ascontiguousarray(scale16.T.astype(f32)),
                       np.ascontiguousarray(bias16.T.astype(f32)),
                       k, n, t, zero=0)

    if t == GGMLType.Q3_K:
        sc6 = codecs._unpack_q3k_scales(b["scales"].reshape(-1, 12)).reshape(n, -1, 16)
        d = b["d"].astype(f32)[..., None] * sc6.astype(f32)                   # (N, SB, 16)
        qlow = ((b["qs"][:, :, codecs._Q2_BYTE] >> codecs._Q2_SHIFT) & 3).astype(np.int16)
        hset = ((b["hmask"][:, :, codecs._Q3_HBYTE] >> codecs._Q3_HBIT) & 1).astype(np.int16)
        q = qlow - np.where(hset == 1, 0, 4) + 4      # store q' = q+4 in [0,7]
        vals = q.reshape(n, k).astype(np.uint8)
        scale = d.reshape(n, -1)                      # per-16
        return QTensor("nib4", _nib4_from_u8(vals),
                       np.ascontiguousarray(scale.T.astype(f32)), None,
                       k, n, t, zero=4)

    if t == GGMLType.Q4_K:
        d, m = _k_scale_min(b)                        # (N, SB, 8) per-32 groups
        q = ((b["qs"][:, :, codecs._Q4K_BYTE] >> codecs._Q4K_SHIFT) & 0xF).astype(np.uint8)
        vals = q.reshape(n, k)
        scale = d.reshape(n, nb32)
        bias = -m.reshape(n, nb32)                    # w = q*s - m
        return QTensor("nib4", _nib4_from_u8(vals), _per32(scale), _per32(bias), k, n, t, zero=0)

    if t == GGMLType.Q5_K:
        d, m = _k_scale_min(b)
        ql = ((b["qs"][:, :, codecs._Q4K_BYTE] >> codecs._Q4K_SHIFT) & 0xF).astype(np.int16)
        hb = ((b["qh"][:, :, codecs._E % 32] >> codecs._Q5K_HBIT) & 1).astype(np.int16)
        q5 = ql + 16 * hb                             # raw [0, 31]
        qdev = np.ascontiguousarray(q5.reshape(n, k).astype(np.int8).T)
        scale = d.reshape(n, nb32)
        bias = -m.reshape(n, nb32)                    # w = q5*s - m
        return QTensor("int8", qdev, _per32(scale), _per32(bias), k, n, t)

    if t == GGMLType.Q6_K:
        lo = (b["ql"][:, :, codecs._Q6_QL_BYTE] >> codecs._Q6_QL_SHIFT) & 0xF
        hi = (b["qh"][:, :, codecs._Q6_QH_BYTE] >> codecs._Q6_QH_SHIFT) & 3
        q = (lo.astype(np.int16) | (hi.astype(np.int16) << 4)) - 32
        qdev = np.ascontiguousarray(q.reshape(n, k).astype(np.int8).T)
        scale = (b["d"].astype(f32)[..., None] * b["scales"].astype(f32)).reshape(n, -1)  # per-16
        return QTensor("int8", qdev, np.ascontiguousarray(scale.T), None, k, n, t)

    if t in (GGMLType.IQ3_S, GGMLType.IQ3_XXS):
        # compressed residency (VERDICT r04 item 7): both IQ3 grids carry
        # only 8 distinct magnitudes, so sign+magnitude is an exact 4-bit
        # code — w = lut16[nib] * scale32, resident at ~1.5x the packed
        # bytes instead of the 4.7x of a dense bf16 image (the reference
        # streams these compressed on device too, ggml-cuda/vecdotq.cuh)
        mag, neg, db = _iq3_decompose(b, t, n, k)
        mags = np.array([1, 3, 5, 7, 9, 11, 13, 15] if t == GGMLType.IQ3_S
                        else [4, 12, 20, 28, 36, 44, 52, 62], np.uint8)
        idx = np.searchsorted(mags, mag).astype(np.uint8)
        assert (mags[idx] == mag).all(), "unexpected IQ3 grid magnitude"
        lut = np.concatenate([mags, -mags.astype(np.int16)]).astype(f32)
        nib = (idx + 8 * neg).astype(np.uint8)
        return QTensor("nib4", _nib4_from_u8(nib.reshape(n, k)),
                       np.ascontiguousarray(db.reshape(n, k // 32).T), None,
                       k, n, t, zero=0, lut=lut)

    if t in (GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S):
        # all IQ2 grids share 3 magnitudes {8, 25, 43}: a 2-bit code plus a
        # sign bitplane is exact — w = ±lut4[q2] * scale, resident at
        # 1.9–2.2x the packed bytes (scales per-16 for XS/S, per-32 for XXS)
        mag, neg, db, sgroup = _iq2_decompose(b, t, n, k)
        mags = np.array([8, 25, 43], np.uint8)
        idx = np.searchsorted(mags, mag).astype(np.uint8)
        assert (mags[idx] == mag).all(), "unexpected IQ2 grid magnitude"
        lut = np.array([8.0, 25.0, 43.0, 0.0], f32)
        return QTensor(
            "nib2", _nib2_from_codes(idx.reshape(n, k)),
            np.ascontiguousarray(db.reshape(n, k // sgroup).T), None,
            k, n, t, zero=0, lut=lut,
            signs=_bitplane(neg.reshape(n, k)))

    if t in (GGMLType.IQ1_S, GGMLType.IQ1_M):
        # documented waiver: the 1.56/1.75-bpw formats carry per-8/16
        # element deltas; the tightest exact factored layout (2-bit code +
        # per-32 f32 scale AND bias rows) is 4 bpw = 2.6x packed — above
        # the 2x residency budget — so these two stay dense at load.
        # They are decode-only curiosity formats here (no encoder ships
        # real checkpoints at 1 bit in the reference CI either).
        w = codecs.dequantize(raw, t, shape=(n, k)).T
        return QTensor("dense", np.ascontiguousarray(w), None, None, k, n, t)

    if t == GGMLType.IQ4_XS:
        d = b["d"].astype(f32)                        # (N, K/256)
        lut = codecs.KVALUES_IQ4NL
        lo6 = np.concatenate([b["scales_l"] & 0xF, b["scales_l"] >> 4], axis=2)
        lo6 = lo6.reshape(n, -1, 2, 4).transpose(0, 1, 3, 2).reshape(n, -1, 8)
        ib = np.arange(8)
        hi6 = ((b["scales_h"][..., None].astype(np.uint32) >> (2 * ib)) & 3)
        ls = (lo6.astype(np.int32) | (hi6.astype(np.int32) << 4)) - 32
        scale = (d[..., None] * ls.astype(f32)).reshape(n, nb32)   # per-32
        g = b["qs"].reshape(n, -1, 8, 16)
        q = np.concatenate([lut[(g & 0xF).astype(np.int32)],
                            lut[(g >> 4).astype(np.int32)]], axis=3)
        qdev = np.ascontiguousarray(q.reshape(n, k).T)
        return QTensor("int8", qdev, _per32(scale), None, k, n, t)

    if t == GGMLType.IQ4_NL:
        d = b["d"].astype(f32)                        # (N, K/32)
        lut = codecs.KVALUES_IQ4NL                    # nonlinear grid -> int8
        lo = lut[(b["qs"] & 0x0F).astype(np.int32)]
        hi = lut[(b["qs"] >> 4).astype(np.int32)]
        q = np.concatenate([lo, hi], axis=2).reshape(n, k)
        return QTensor("int8", np.ascontiguousarray(q.T), _per32(d), None, k, n, t)

    raise NotImplementedError(f"no device layout for {t}")


def quantize_for_device(w: np.ndarray, t: GGMLType) -> QTensor:
    """Quantize a float weight (numpy, shape (K, N) contraction-first) through
    the bit-exact codec, then decode to device layout. Ensures the device path
    sees exactly what a GGUF round trip would produce."""
    k, n = w.shape
    raw = codecs.quantize(np.ascontiguousarray(w.T), t)  # rows along K
    return to_device_format(raw, t, (k, n))


def to_dense_bf16(qt: QTensor) -> QTensor:
    """Dequantize once, on device, into a bf16-resident dense QTensor.

    TPU execution-mode tradeoff (measured on v5e): in-kernel 4-bit expansion
    is VPU-bound (~8 vector ops/element; u8->i32 is the only cast chain the
    compiler accepts), capping fused-GEMV weight bandwidth well below HBM.
    Holding the dequantized bf16 image instead doubles bytes/token but runs
    at full HBM bandwidth with zero per-step unpack cost — the analog of the
    reference's dequant-to-f16 cuBLAS path (ggml-cuda convert.cu). Use
    quantized residency only when HBM cannot hold the bf16 image.
    """
    import jax
    import jax.numpy as jnp
    if qt.kind == "dense":
        return qt
    from ..ops.qmatmul import dequantize_xla
    w = jax.jit(lambda q: dequantize_xla(q, dtype=jnp.bfloat16))(qt)
    return QTensor("dense", w, None, None, qt.k, qt.n, qt.ggml_type)


def params_to_dense_bf16(params):
    """Map to_dense_bf16 over every QTensor leaf of a params pytree,
    releasing each quantized original as it converts."""
    def conv(x):
        return to_dense_bf16(x) if isinstance(x, QTensor) else x

    def walk(d):
        if isinstance(d, dict):
            return {k: walk(v) for k, v in d.items()}
        if isinstance(d, list):
            return [walk(v) for v in d]
        return conv(d)

    return walk(params)


def dequantize_qtensor(qt: QTensor) -> np.ndarray:
    """Host-side reference dequantization of the device layout -> (K, N) f32.
    Used by differential tests."""
    if qt.kind == "dense":
        return np.asarray(qt.q, dtype=f32)
    scale = np.asarray(qt.scale, dtype=f32)
    group = qt.k // scale.shape[0]
    bias = np.asarray(qt.bias, dtype=f32) if qt.bias is not None else None
    if qt.kind == "nib4":
        qs = np.asarray(qt.q)                        # (K/2, N)
        g = qs.reshape(qt.k // 32, 16, qt.n)
        lo = (g & 0x0F).astype(np.int16)
        hi = (g >> 4).astype(np.int16)
        idx = np.concatenate([lo, hi], axis=1).reshape(qt.k, qt.n)
        if qt.lut is not None:                       # codebook: w = lut[nib]
            q = np.asarray(qt.lut, f32)[idx]
        else:
            q = idx.astype(f32) - float(qt.zero)
    elif qt.kind == "nib2":
        qs = np.asarray(qt.q)                        # (K/4, N)
        e = np.stack([(qs >> (2 * j)) & 3 for j in range(4)],
                     axis=1).reshape(qt.k, qt.n)
        mag = np.asarray(qt.lut, f32)[e]
        sb = np.asarray(qt.signs)                    # (K/8, N)
        neg = np.stack([(sb >> j) & 1 for j in range(8)],
                       axis=1).reshape(qt.k, qt.n)
        q = np.where(neg == 1, -mag, mag)
    else:
        q = np.asarray(qt.q, dtype=f32)              # (K, N)
    w = q.reshape(-1, group, qt.n) * scale[:, None, :]
    if bias is not None:
        w = w + bias[:, None, :]
    return w.reshape(qt.k, qt.n)


def concat_qtensors(qts: list, axis_n: bool = True) -> QTensor:
    """Concatenate QTensors along the output (N) dimension — used to fuse
    Q/K/V projections into one GEMV (fewer kernel launches, better N tiling).
    All inputs must share kind/K/type/zero/layout."""
    import jax.numpy as jnp
    a = qts[0]
    assert axis_n
    for b in qts[1:]:
        assert (b.kind, b.k, b.ggml_type, b.zero, b.interleaved_bk,
                b.q4_layout) == (a.kind, a.k, a.ggml_type, a.zero,
                                 a.interleaved_bk, a.q4_layout)
    cat = (jnp.concatenate if any(hasattr(t.q, "devices") for t in qts)
           else np.concatenate)
    q = cat([t.q for t in qts], axis=1)
    scale = None if a.scale is None else cat([t.scale for t in qts], axis=1)
    bias = None if a.bias is None else cat([t.bias for t in qts], axis=1)
    # codebook kinds: same ggml_type (asserted) => same per-format LUT;
    # the nib2 sign bitplane concatenates along N like q
    signs = None if a.signs is None else cat([t.signs for t in qts], axis=1)
    return QTensor(a.kind, q, scale, bias, a.k, sum(t.n for t in qts),
                   a.ggml_type, a.zero, a.interleaved_bk, a.q4_layout,
                   lut=a.lut, signs=signs)


def permute_qtensor_cols(qt: QTensor, perm) -> QTensor:
    """Reorder a natural-layout QTensor's output (N) columns by `perm`
    (out column t = old column perm[t]). EXACT for every format: quant
    blocks run along K, so whole-column permutation never crosses a
    block — q/scale/bias/signs all just gather on their last axis. Used
    by the GPT-J split-half rope layout (models/gptj.split_rope_prep)."""
    import jax.numpy as jnp
    assert qt.interleaved_bk == 0 and qt.n_stack == 0, \
        "permute before repacking/stacking"
    perm = np.asarray(perm)
    assert perm.shape == (qt.n,)
    take = (lambda a: a[..., jnp.asarray(perm)]) \
        if hasattr(qt.q, "devices") else (lambda a: np.asarray(a)[..., perm])
    return replace(
        qt, q=take(qt.q),
        scale=None if qt.scale is None else take(qt.scale),
        bias=None if qt.bias is None else take(qt.bias),
        signs=None if qt.signs is None else take(qt.signs))


def pad_qtensor_cols(qt: QTensor, multiple: int = 128) -> tuple[QTensor, int]:
    """Zero-pad a natural-layout QTensor's output (N) dim up to a multiple.

    The fused Pallas kernels tile N in 128-lane blocks (qmatmul's
    `n % 128 == 0` gate); a vocab like GPT-J's 50400 otherwise silently
    falls to the XLA-dequant path. Zero-padded columns decode to exactly
    0.0 for every supported format (q=0 with zero-point handling is done
    by the scale=0 rows for nib4-with-zero), so padded logits are 0 + any
    bias the caller pads in (-1e30 keeps argmax/top-k away). Call BEFORE
    params_repack_device. Returns (padded_qt, n_pad)."""
    import jax.numpy as jnp
    assert qt.interleaved_bk == 0 and qt.n_stack == 0, \
        "pad before repacking/stacking"
    npad = (-qt.n) % multiple
    if npad == 0:
        return qt, 0
    pad = (jnp.pad if hasattr(qt.q, "devices") else np.pad)
    q = pad(qt.q, ((0, 0), (0, npad)))
    # scale rows 0 make padded columns decode to (q - zero) * 0 = 0 for
    # kinds without bias (incl. the codebook kinds: lut[idx] * 0 = 0);
    # biased kinds also pad bias with 0
    scale = None if qt.scale is None else pad(qt.scale, ((0, 0), (0, npad)))
    bias = None if qt.bias is None else pad(qt.bias, ((0, 0), (0, npad)))
    signs = None if qt.signs is None else pad(qt.signs, ((0, 0), (0, npad)))
    return (QTensor(qt.kind, q, scale, bias, qt.k, qt.n + npad,
                    qt.ggml_type, qt.zero, 0, qt.q4_layout, qt.name,
                    lut=qt.lut, signs=signs), npad)


def pad_qtensor_rows(qt: QTensor, multiple: int = 1024) -> tuple[QTensor, int]:
    """Zero-pad a natural-layout QTensor's contraction (K) dim up to a
    multiple, in whole 32-element quant blocks.

    The W4A8 decode GEMV picks its K-tile as the largest power-of-two
    divisor of K (ops/pallas_qmm qmatmul_natpair_w4a8_stacked): LLaMA's
    down-proj K=11008 (= 2^7·86) caps the tile at 256 and measurably
    halves the weight-stream bandwidth (docs/ROUND4_NOTES.md lead 2 — the
    analog of CUDA's row rounding to tile granularity,
    /root/reference/src/ggml-cuda.cu:580). Padding to 11264 = 2^10·11
    restores 1024-row tiles for +2.3% bytes. Padded rows carry scale 0 so
    they decode to exactly 0.0 whatever the activations; callers that pad
    K must feed activations widened to the padded K (LLaMA's SwiGLU pad
    lanes are already exactly 0: zero-padded gate/up columns give
    silu(0)*0 = 0). Call BEFORE params_repack_device. Returns
    (padded_qt, k_pad)."""
    import jax.numpy as jnp
    assert qt.interleaved_bk == 0 and qt.n_stack == 0, \
        "pad before repacking/stacking"
    assert multiple % 32 == 0, "K pads in whole 32-element quant blocks"
    kpad = (-qt.k) % multiple
    if kpad == 0:
        return qt, 0
    pad = (jnp.pad if hasattr(qt.q, "devices") else np.pad)
    if qt.kind == "nib4":
        q = pad(qt.q, ((0, kpad // 2), (0, 0)))
    elif qt.kind == "nib2":
        q = pad(qt.q, ((0, kpad // 4), (0, 0)))   # 4 elements per byte
    elif qt.kind == "int8":
        q = pad(qt.q, ((0, kpad), (0, 0)))
    else:
        q = pad(qt.q, ((0, kpad), (0, 0)))
        return (QTensor(qt.kind, q, None, None, qt.k + kpad, qt.n,
                        qt.ggml_type, qt.zero, 0, qt.q4_layout, qt.name),
                kpad)
    group = qt.k // qt.scale.shape[0]
    assert kpad % group == 0, (kpad, group)
    scale = pad(qt.scale, ((0, kpad // group), (0, 0)))
    bias = None if qt.bias is None else pad(qt.bias, ((0, kpad // group),
                                                      (0, 0)))
    signs = None if qt.signs is None else pad(qt.signs,
                                              ((0, kpad // 8), (0, 0)))
    return (QTensor(qt.kind, q, scale, bias, qt.k + kpad, qt.n,
                    qt.ggml_type, qt.zero, 0, qt.q4_layout, qt.name,
                    lut=qt.lut, signs=signs), kpad)


def stack_layers(layers: list[dict]) -> dict:
    """Stack per-layer parameter dicts into one dict of stacked leaves:
    QTensor children gain a leading n_layer dim (n_stack tag), plain arrays
    are stacked. All layers must share keys and QTensor aux. The result
    feeds lax.scan-over-layers decode: ONE compiled layer body instead of
    n_layer inlined copies (the warmup/executable-size fix), with the fused
    kernels reading layer slices in place via scalar-prefetch indices.

    DESTRUCTIVE: consumes its argument — per-layer arrays are freed as each
    stacked buffer fills (donated dynamic_update_slice), so peak device
    memory is the params image + ONE layer slice, not 2x the image."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, donate_argnums=(0,))
    def _set(buf, piece, li):
        return jax.lax.dynamic_update_slice(
            buf, piece[None].astype(buf.dtype),
            (li,) + (0,) * piece.ndim)

    def stack_in_place(pieces):
        """Donated in-place stacking: peak extra memory is ONE stacked
        buffer (not 2x the whole image — at 6B geometry a plain jnp.stack
        of every leaf transiently doubles ~3.3 GB of weights past the
        usable HBM residency and silently host-pages the result)."""
        first = jnp.asarray(pieces[0])
        buf = jnp.zeros((len(pieces),) + first.shape, first.dtype)
        for li, p in enumerate(pieces):
            buf = _set(buf, jnp.asarray(p), jnp.int32(li))
            pieces[li] = None           # free the source as we go
        return buf

    keys = list(layers[0].keys())
    assert all(list(lp.keys()) == keys for lp in layers), "non-uniform layers"
    L = len(layers)
    out = {}
    for key in keys:
        a = layers[0][key]
        if isinstance(a, QTensor):
            assert a.signs is None, \
                "stacking nib2 (compressed-IQ2) tensors is unsupported"
            for lp in layers[1:]:
                b = lp[key]
                assert (b.kind, b.k, b.n, b.ggml_type, b.zero,
                        b.interleaved_bk, b.q4_layout) == \
                       (a.kind, a.k, a.n, a.ggml_type, a.zero,
                        a.interleaved_bk, a.q4_layout), key
            qts = [lp.pop(key) for lp in layers]   # remove caller's refs

            def grab(attr):
                arrs = [getattr(t, attr) for t in qts]
                for t in qts:
                    setattr(t, attr, None)         # free as the stack fills
                return arrs

            aux = replace(a, q=None, scale=None, bias=None)
            q = stack_in_place(grab("q"))
            scale = None if a.scale is None else stack_in_place(grab("scale"))
            bias = None if a.bias is None else stack_in_place(grab("bias"))
            del qts
            out[key] = replace(aux, q=q, scale=scale, bias=bias, n_stack=L)
        else:
            out[key] = stack_in_place([lp.pop(key) for lp in layers])
    return out


def index_stacked(qt: QTensor, li) -> QTensor:
    """Select layer `li` (traced or static) from a stacked QTensor by
    dynamic-slice. Materializes a copy — used only by non-kernel fallback
    paths (CPU tests, XLA dequant); the fused kernels index in place."""
    import jax
    import jax.numpy as jnp
    assert qt.n_stack > 0
    take = lambda a: None if a is None else \
        jnp.squeeze(jax.lax.dynamic_slice_in_dim(jnp.asarray(a), li, 1,
                                                 axis=0), axis=0)
    return replace(qt, q=take(qt.q), scale=take(qt.scale),
                   bias=take(qt.bias), n_stack=0)


def concat_qtensors_k(qts: list) -> QTensor:
    """Concatenate QTensors along the contraction (K) dimension — used to
    fuse two projections that share an output space into one GEMV whose
    input is the concatenation of their activations (e.g. GPT-J's
    out_proj + fc_out both map to n_embd and their results are summed into
    the residual, examples/gpt-j/main.cpp:535). Natural layouts only
    (concat BEFORE params_repack_device); every K must be a multiple of the
    scale group so quant blocks never straddle a seam."""
    import jax.numpy as jnp
    a = qts[0]
    for b in qts[1:]:
        assert (b.kind, b.n, b.ggml_type, b.zero, b.interleaved_bk,
                b.q4_layout) == (a.kind, a.n, a.ggml_type, a.zero,
                                 a.interleaved_bk, a.q4_layout)
    assert a.interleaved_bk == 0, "concat_qtensors_k needs natural layout"
    group = a.k // a.scale.shape[0] if a.scale is not None else 32
    assert all(t.k % max(group, 32) == 0 for t in qts)
    cat = (jnp.concatenate if any(hasattr(t.q, "devices") for t in qts)
           else np.concatenate)
    q = cat([t.q for t in qts], axis=0)
    scale = None if a.scale is None else cat([t.scale for t in qts], axis=0)
    bias = None if a.bias is None else cat([t.bias for t in qts], axis=0)
    signs = None if a.signs is None else cat([t.signs for t in qts], axis=0)
    return QTensor(a.kind, q, scale, bias, sum(t.k for t in qts), a.n,
                   a.ggml_type, a.zero, a.interleaved_bk, a.q4_layout,
                   lut=a.lut, signs=signs)
