"""Fused Pallas W4A16 matmul kernel (nib4 weights).

The TPU analog of the reference's quantized GEMM kernels (mmq.cu / mmvq.cu in
src/ggml-cuda/, vec_dot in src/ggml-quants.c): weights stream HBM->VMEM at
4 bits/element and are expanded to bf16 *in VMEM* right before the MXU dot —
no dense weight copy ever exists in HBM.

Layout trick ("block-interleaved"): Mosaic lowers `pltpu.repeat` (tile-repeat:
out[r] = in[r mod n]) efficiently, but element-repeat (out[r] = in[r // g])
forces slow relayouts. So at load time each K-tile of BK rows is re-ordered so
that packed row r corresponds to quant block b = r mod NB (NB = BK/32 blocks
per tile), byte j = r // NB. Then the per-block scale for row r is exactly
scale[r mod NB] — a tile-repeat. The activation K axis is permuted to match by
a cheap XLA gather outside the kernel (activations are tiny next to weights).

The low/high nibble planes of each block get separate scale rows (s_lo, s_hi)
so that formats with per-16 sub-scales (q2_K, q3_K) use the same kernel as
per-32 formats (for which s_lo == s_hi).
"""
from __future__ import annotations

import os
from dataclasses import replace
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.device import QTensor

DEFAULT_BK = 512
DEFAULT_BN = 1024
DEFAULT_BM = 512          # m-tile for prefill/large-batch (VMEM-capped)


def _pick_bn(n: int, bn: int) -> int:
    """Largest 128-multiple n-tile that divides n, capped at the requested
    bn. Exact tiling is required by the kernels' BlockSpecs; preferring the
    largest legal divisor keeps the weight-stream DMAs long (the 50432-col
    padded LM head otherwise fell to bn=256 and halved its bandwidth)."""
    bn = min(bn, n)
    if n % bn == 0:
        return bn
    for cand in range(bn - bn % 128, 127, -128):
        if n % cand == 0:
            return cand
    raise ValueError(f"n={n} is not a multiple of 128")


def _m_tiling(m: int) -> tuple[int, int]:
    """-> (padded_m, bm). Up to DEFAULT_BM rows run as one tile (decode and
    small prefill, no padding); larger m is split into DEFAULT_BM-row tiles
    (the analog of the reference's mmq covering all batch sizes,
    ggml-cuda.cu:1867-1960). Padding rows are zeros and their outputs are
    sliced away by the caller."""
    if m <= DEFAULT_BM:
        return m, m
    pad = (-m) % DEFAULT_BM
    return m + pad, DEFAULT_BM


def _pad_rows(x2: jax.Array, m_pad: int) -> jax.Array:
    m = x2.shape[0]
    if m == m_pad:
        return x2
    return jnp.pad(x2, ((0, m_pad - m), (0, 0)))


def repack_interleaved(qt: QTensor, bk: int = DEFAULT_BK) -> QTensor:
    """Re-order a natural-layout nib4 QTensor into block-interleaved tiles of
    bk contraction rows. Host-side, one-time at load."""
    assert qt.kind == "nib4" and qt.interleaved_bk == 0
    assert qt.k % bk == 0, (qt.k, bk)
    nb = bk // 32
    qs = np.asarray(qt.q)                               # (K/2, N) natural
    qs_t = qs.reshape(qt.k // bk, nb, 16, qt.n)         # (T, block, j, N)
    qs_bi = np.ascontiguousarray(qs_t.transpose(0, 2, 1, 3).reshape(qt.k // 2, qt.n))
    return replace(qt, q=qs_bi, interleaved_bk=bk)


def repack_interleaved_device(qt: QTensor, bk: int = DEFAULT_BK) -> QTensor:
    """Same layout transform as repack_interleaved but on device (jnp) — for
    weights that already live in HBM (no host round trip)."""
    assert qt.kind == "nib4" and qt.interleaved_bk == 0
    assert qt.k % bk == 0, (qt.k, bk)
    nb = bk // 32

    @jax.jit
    def rp(qs):
        qs_t = qs.reshape(qt.k // bk, nb, 16, qt.n)
        return qs_t.transpose(0, 2, 1, 3).reshape(qt.k // 2, qt.n)

    return replace(qt, q=rp(jnp.asarray(qt.q)),
                   scale=jnp.asarray(qt.scale),
                   bias=None if qt.bias is None else jnp.asarray(qt.bias),
                   interleaved_bk=bk)


def repack_rowpair_device(qt: QTensor, bk: int = DEFAULT_BK) -> QTensor:
    """Row-pair int4-bitcast layout (q4_layout=1) — the fastest decode path.

    Mosaic's `pltpu.bitcast(u8, int4)` doubles the SUBLANE axis with the low
    nibble first, and int4->bf16 vector casts are native. So: store adjacent
    (permuted) contraction rows in one byte, XOR 8 (offset-binary -> two's
    complement, making the signed int4 read equal q - 8), and the kernel
    unpack collapses to bitcast + one cast + one multiply (~2 VPU ops/elt vs
    ~5 for the plane-split layout). Measured v5e GEMV (K=4096, N=16384):
    0.097 ms (435 GB/s eff) vs 0.173 ms plane-split vs 0.209 ms dense bf16.

    Row permutation: logical element (block b, intra e) -> bitcast row
    u = e*NB + b, so the per-block scale expansion is a 32x tile-repeat
    (srep[u] = s[u mod NB]). Requires per-32 scales and zero-point 8 folded
    via XOR (per-16 formats keep the plane-split kernel).
    """
    assert qt.kind == "nib4" and qt.interleaved_bk == 0 and qt.zero in (0, 8)
    assert qt.k % bk == 0, (qt.k, bk)
    groups = np.asarray(qt.scale).shape[0] if not hasattr(qt.scale, "shape") \
        else qt.scale.shape[0]
    assert groups == qt.k // 32, "rowpair layout needs per-32 scales"
    nb = bk // 32

    @jax.jit
    def rp(qs):
        # natural plane-split (K/2, N): byte row 16b+j = elements (32b+j) lo,
        # (32b+16+j) hi -> recover natural-order values, then re-pack
        g = qs.reshape(qt.k // 32, 16, qt.n)
        lo = g & 0x0F
        hi = g >> 4
        vals = jnp.concatenate([lo, hi], axis=1).reshape(qt.k, qt.n)
        vals = vals ^ 8                           # signed int4 read = q - 8
        # rows -> u-order: (tile, b, e) -> u = e*nb + b
        vt = vals.reshape(qt.k // bk, nb, 32, qt.n).transpose(0, 2, 1, 3)
        vt = vt.reshape(qt.k // bk, bk, qt.n)
        return (vt[:, 0::2] | (vt[:, 1::2] << 4)).reshape(qt.k // 2, qt.n)

    scale = jnp.asarray(qt.scale)
    bias = None if qt.bias is None else jnp.asarray(qt.bias)
    if qt.zero == 0:
        # stored values shift by -8; compensate in the affine bias
        bias = 8.0 * scale if bias is None else bias + 8.0 * scale
    return replace(qt, q=rp(jnp.asarray(qt.q)), scale=scale, bias=bias,
                   zero=8, interleaved_bk=bk, q4_layout=1)


def params_repack_device(params, bk: int = DEFAULT_BK, scale_dtype=None):
    """Repack every natural-layout nib4 QTensor leaf of a params pytree for
    the fused kernel (one-time at load, the analog of the reference's
    per-backend weight re-encoding, src/ggml-cuda/convert.cu). Per-32-scale
    tensors get the natural-pair layout; per-16 keep plane-split.
    scale_dtype: see repack_natpair_device."""
    def conv(x):
        # Pass-through QTensors get a SHALLOW holder copy (same device
        # buffers): the repacked tree feeds stack_layers, which gut-frees
        # its input QTensor objects as the stacked buffers fill — aliasing
        # the caller's objects here would corrupt the caller's params
        # (observed: a BatchedEngine(stacked=True) sharing f32 leaves with
        # a later engine left q=None behind).
        if not isinstance(x, QTensor):
            return x
        if x.interleaved_bk != 0:
            return replace(x)
        if x.kind == "nib2" or x.lut is not None:
            # compressed-IQ codebook layouts run the XLA dequant-fused
            # path; the affine natpair/nat8 repacks don't apply to them
            return replace(x)
        # natpair/nat8 have no per-tile permutation, so the K-tile tag just
        # has to divide K: shrink per tensor instead of silently skipping
        # (whisper small/medium have K=768/1024 attention weights — a fixed
        # bk=512 gate left every one of them on the slow XLA path)
        bk_t = bk
        while bk_t >= 64 and x.k % bk_t:
            bk_t //= 2
        if x.k % bk_t:
            return replace(x)
        g = x.k // x.scale.shape[0] if x.kind == "int8" else 32
        if (bk_t // g) % 8:
            # a K-tile spanning <8 scale rows is Mosaic-illegal as the
            # scale window's second-to-last block dim (e.g. GPT-2-XL's
            # K=1600 halves to bk=64 -> 2 rows); tag the FULL K instead —
            # full-dim windows are always legal and these odd-K weights
            # are small enough to sit in VMEM whole
            bk_t = x.k
        if x.kind == "nib4":
            groups = x.scale.shape[0]
            if groups == x.k // 32 and x.zero in (0, 8):
                return repack_natpair_device(x, bk_t, scale_dtype=scale_dtype)
            return repack_interleaved_device(x, bk_t)
        if x.kind == "int8" and x.k // x.scale.shape[0] in (16, 32):
            return repack_nat8_device(x, bk_t, scale_dtype=scale_dtype)
        return replace(x)

    def walk(d):
        if isinstance(d, dict):
            return {k: walk(v) for k, v in d.items()}
        if isinstance(d, list):
            return [walk(v) for v in d]
        return conv(d)

    return walk(params)


def _split_scales(qt: QTensor):
    """-> (s_lo, s_hi, b_lo, b_hi), each (K/32, N) f32. For per-32 formats the
    lo/hi views are identical; for per-16 formats they are the even/odd rows."""
    s = np.asarray(qt.scale) if not isinstance(qt.scale, jax.Array) else qt.scale
    groups = s.shape[0]
    b = qt.bias
    if groups == qt.k // 32:
        s_lo = s_hi = s
        b_lo = b_hi = b
    elif groups == qt.k // 16:
        s_lo, s_hi = s[0::2], s[1::2]
        b_lo, b_hi = (b[0::2], b[1::2]) if b is not None else (None, None)
    else:
        raise ValueError(f"unsupported scale group count {groups} for K={qt.k}")
    return s_lo, s_hi, b_lo, b_hi


def _anchor_act(x):
    """Under a GSPMD mesh (abstract mesh active), pin the activation to
    (batch on dp, features replicated): the permutation reshapes below
    otherwise invite GSPMD to push the weight's tp sharding onto the pair
    dims and 'involuntarily fully rematerialize' per layer (VERDICT r03
    weak #7). No-op without a mesh, so single-chip paths are untouched."""
    am = jax.sharding.get_abstract_mesh()
    names = getattr(am, "axis_names", ())
    if "tp" in names and am.shape["tp"] > 1:
        from jax.sharding import PartitionSpec as P
        lead = "dp" if ("dp" in names and am.shape["dp"] > 1
                        and x.shape[0] % am.shape["dp"] == 0) else None
        return jax.lax.with_sharding_constraint(
            x, P(lead, *([None] * (x.ndim - 1))))
    return x


def _permute_activations(x, k, bk):
    """Per-tile activation permutation matching the block-interleaved layout:
    element (tile, block b, half h, intra j) -> row (tile, h, j, b)."""
    nb = bk // 32
    lead = x.shape[:-1]
    xr = _anchor_act(x).reshape(*lead, k // bk, nb, 2, 16)
    out = xr.swapaxes(-3, -2).swapaxes(-2, -1).reshape(*lead, k)  # (..., T, h, j, b)
    return _anchor_act(out)


def _kernel_noround(has_bias, zero, x_ref, qs_ref, slo_ref, shi_ref, *rest):
    if has_bias:
        blo_ref, bhi_ref, o_ref, acc_ref = rest
    else:
        o_ref, acc_ref = rest
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = qs_ref[:].astype(jnp.int32)
    lo = ((g & 15) - zero).astype(jnp.bfloat16)         # (BK/2, BN)
    hi = (((g >> 4) & 15) - zero).astype(jnp.bfloat16)
    srep_lo = pltpu.repeat(slo_ref[:], 16, axis=0).astype(jnp.bfloat16)
    srep_hi = pltpu.repeat(shi_ref[:], 16, axis=0).astype(jnp.bfloat16)
    wlo = lo * srep_lo
    whi = hi * srep_hi
    if has_bias:
        wlo = wlo + pltpu.repeat(blo_ref[:], 16, axis=0).astype(jnp.bfloat16)
        whi = whi + pltpu.repeat(bhi_ref[:], 16, axis=0).astype(jnp.bfloat16)
    w = jnp.concatenate([wlo, whi], axis=0)             # (BK, BN) plane order
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _permute_activations_rowpair(x, k, bk):
    """Activation permutation for the row-pair layout: element
    (tile, block b, intra e) -> row u = e*NB + b."""
    nb = bk // 32
    lead = x.shape[:-1]
    xr = _anchor_act(x).reshape(*lead, k // bk, nb, 32)
    return _anchor_act(xr.swapaxes(-2, -1).reshape(*lead, k))


def _kernel_rowpair(has_bias, interpret, *refs):
    if has_bias:
        x_ref, qs_ref, s_ref, xs_ref, b_ref, o_ref, acc_ref = refs
    else:
        x_ref, qs_ref, s_ref, o_ref, acc_ref = refs
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if interpret:
        # the Pallas interpreter lacks the int4 bitcast; emulate exactly
        g = qs_ref[:].astype(jnp.int32)
        lo = ((g & 15) ^ 8) - 8
        hi = ((g >> 4) ^ 8) - 8
        bk2, bn = lo.shape
        w = jnp.stack([lo, hi], axis=1).reshape(2 * bk2, bn).astype(jnp.bfloat16)
    else:
        # int4 -> int8 -> bf16 lowers ~14% faster than the direct
        # int4 -> bf16 cast on v5e (513 vs 452 GB/s effective)
        w = pltpu.bitcast(qs_ref[:], jnp.int4).astype(jnp.int8).astype(jnp.bfloat16)
    w = w * pltpu.repeat(s_ref[:].astype(jnp.bfloat16), 32, axis=0)
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    if has_bias:
        # exact affine term in f32: sum_b bias[b,n] * (sum_{k in b} x_k).
        # xs arrives transposed (nb, m) — Mosaic requires the lane dim of a
        # block to be 128-divisible or the full array dim, and nb=16 is not.
        acc_ref[:] += jax.lax.dot_general(
            xs_ref[:], b_ref[:].astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def qmatmul_pallas(x: jax.Array, qt: QTensor, *, bn: int = DEFAULT_BN,
                   interpret: bool | None = None) -> jax.Array:
    """Fused quantized matmul on a block-interleaved nib4 QTensor.
    x: (..., K) bf16/f32 -> (..., N) f32."""
    assert qt.interleaved_bk > 0, \
        "qmatmul_pallas requires repacked weights (params_repack_device)"
    if qt.q4_layout == 4:
        return _qmatmul_nat8(x, qt, bn=bn, interpret=interpret)
    if qt.q4_layout == 2:
        return _qmatmul_int8(x, qt, bn=bn, interpret=interpret)
    assert qt.kind == "nib4", qt.kind
    if qt.q4_layout == 3:
        return _qmatmul_natpair(x, qt, bn=bn, interpret=interpret)
    if qt.q4_layout == 1:
        return _qmatmul_rowpair(x, qt, bn=bn, interpret=interpret)
    bk = qt.interleaved_bk
    assert qt.k % bk == 0, (qt.k, bk)   # stale tag after reshard?
    nb = bk // 32
    k, n = qt.k, qt.n
    bn = _pick_bn(n, bn)
    assert n % bn == 0, (n, bn)
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    m_pad, bm = _m_tiling(m)
    x2 = _pad_rows(x.reshape(m, k).astype(jnp.bfloat16), m_pad)
    xp = _permute_activations(x2, k, bk)

    s_lo, s_hi, b_lo, b_hi = _split_scales(qt)
    has_bias = b_lo is not None
    args = [xp, jnp.asarray(qt.q), jnp.asarray(s_lo), jnp.asarray(s_hi)]
    in_specs = [
        pl.BlockSpec((bm, bk), lambda mm, nn, kk: (mm, kk), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // 2, bn), lambda mm, nn, kk: (kk, nn), memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, bn), lambda mm, nn, kk: (kk, nn), memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, bn), lambda mm, nn, kk: (kk, nn), memory_space=pltpu.VMEM),
    ]
    if has_bias:
        args += [jnp.asarray(b_lo), jnp.asarray(b_hi)]
        in_specs += [
            pl.BlockSpec((nb, bn), lambda mm, nn, kk: (kk, nn), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, bn), lambda mm, nn, kk: (kk, nn), memory_space=pltpu.VMEM),
        ]

    out = pl.pallas_call(
        partial(_kernel_noround, has_bias, qt.zero),
        grid=(m_pad // bm, n // bn, k // bk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda mm, nn, kk: (mm, nn),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n,
            bytes_accessed=(m_pad // bm) * (k * n // 2 + k // 32 * n * 4)
            + m_pad * k * 2 + m_pad * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out[:m].reshape(*lead, n)


def _qmatmul_rowpair(x: jax.Array, qt: QTensor, *, bn: int = DEFAULT_BN,
                     interpret: bool | None = None) -> jax.Array:
    """Row-pair int4-bitcast path (see repack_rowpair_device)."""
    bk = qt.interleaved_bk
    assert qt.k % bk == 0, (qt.k, bk)   # stale tag after reshard?
    nb = bk // 32
    k, n = qt.k, qt.n
    bn = _pick_bn(n, bn)
    assert n % bn == 0, (n, bn)
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    m_pad, bm = _m_tiling(m)
    x2 = _pad_rows(x.reshape(m, k).astype(jnp.bfloat16), m_pad)
    xp = _permute_activations_rowpair(x2, k, bk)

    has_bias = qt.bias is not None
    args = [xp, jnp.asarray(qt.q), jnp.asarray(qt.scale)]
    in_specs = [
        pl.BlockSpec((bm, bk), lambda mm, nn, kk: (mm, kk),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // 2, bn), lambda mm, nn, kk: (kk, nn),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, bn), lambda mm, nn, kk: (kk, nn),
                     memory_space=pltpu.VMEM),
    ]
    if has_bias:
        # per-quant-block activation sums (natural block order) for the
        # exact f32 affine term, transposed to (k/32, m) for lane legality
        xs = x2.astype(jnp.float32).reshape(m_pad, k // 32, 32).sum(axis=-1).T
        args += [xs, jnp.asarray(qt.bias)]
        in_specs += [
            pl.BlockSpec((nb, bm), lambda mm, nn, kk: (kk, mm),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, bn), lambda mm, nn, kk: (kk, nn),
                         memory_space=pltpu.VMEM),
        ]

    out = pl.pallas_call(
        partial(_kernel_rowpair, has_bias, interpret),
        grid=(m_pad // bm, n // bn, k // bk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda mm, nn, kk: (mm, nn),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n,
            bytes_accessed=(m_pad // bm)
            * (k * n // 2 + k // 32 * n * 4 * (2 if has_bias else 1))
            + m_pad * k * 2 + m_pad * n * 4,
            transcendentals=0),
        interpret=interpret,
    )(*args)
    return out[:m].reshape(*lead, n)


# ---- natural-pair (natpair, q4_layout=3) production layout ----
#
# Byte row i packs natural elements (2i, 2i+1), low nibble first, XOR 8 —
# NO row permutation. `pltpu.bitcast(u8, int4)` recovers the natural element
# order directly, so:
#   - decode (m <= _W4A8_MAX_M): each quant block is a contiguous 32-row
#     slab -> per-block int8 MXU dots with f32 scale-product epilogue (the
#     vec_dot_q4_0_q8_0 math, ggml-quants.c:3855-3870) at HBM-bound
#     bandwidth;
#   - prefill (larger m): one full-tile bf16 dot; the per-block scale
#     expansion is an element-repeat (jnp.repeat), whose relayout cost
#     amortizes over the m rows (it runs once per weight tile).
# This replaces the rowpair u-order layout as the production default: the
# u-order trick made scale expansion free but makes the per-block slabs
# nb-strided, which costs ~10x in the W4A8 kernel (bench_qmm_variants).


def repack_natpair_device(qt: QTensor, bk: int = DEFAULT_BK,
                          scale_dtype=None) -> QTensor:
    """Natural-pair packing on device (one-time at load).

    scale_dtype=jnp.bfloat16 stores scales half-width (10% less decode
    weight-stream traffic) at ~0.2% relative scale error vs ggml's f16 d —
    opt-in; the default keeps f32 for exact ggml weight parity."""
    assert qt.kind == "nib4" and qt.interleaved_bk == 0 and qt.zero in (0, 8)
    assert qt.k % bk == 0, (qt.k, bk)
    groups = qt.scale.shape[0] if hasattr(qt.scale, "shape") \
        else np.asarray(qt.scale).shape[0]
    assert groups == qt.k // 32, "natpair layout needs per-32 scales"

    @jax.jit
    def rp(qs):
        # natural plane-split (K/2, N): byte row 16b+j = elements (32b+j) lo,
        # (32b+16+j) hi -> recover natural-order values, then pair-pack
        g = qs.reshape(qt.k // 32, 16, qt.n)
        vals = jnp.concatenate([g & 0x0F, g >> 4], axis=1).reshape(qt.k, qt.n)
        vals = vals ^ 8                           # signed int4 read = q - 8
        return vals[0::2] | (vals[1::2] << 4)

    scale = jnp.asarray(qt.scale)
    bias = None if qt.bias is None else jnp.asarray(qt.bias)
    if qt.zero == 0:
        bias = 8.0 * scale if bias is None else bias + 8.0 * scale
    if scale_dtype is not None:
        scale = scale.astype(scale_dtype)
        # half-width affine terms too (the wire format stores K-quant
        # d/dmin as fp16, ggml-common.h:261-273, so half-precision affine
        # storage matches the format's own precision class); this is what
        # brings the Q4_K_M 7B image from ~5.3 GB (host-paged) to ~4.3 GB
        # (resident) on the 5-6 GB usable-HBM chip
        bias = None if bias is None else bias.astype(scale_dtype)
    return replace(qt, q=rp(jnp.asarray(qt.q)), scale=scale, bias=bias,
                   zero=8, interleaved_bk=bk, q4_layout=3)


def _kernel_natpair_w4a16(has_bias, interpret, *refs):
    if has_bias:
        x_ref, qs_ref, s_ref, xs_ref, b_ref, o_ref, acc_ref = refs
    else:
        x_ref, qs_ref, s_ref, o_ref, acc_ref = refs
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _natpair_unpack(qs_ref, interpret).astype(jnp.bfloat16)
    # element-repeat expansion (srep[r] = s[r // 32]); amortized over m rows
    w = w * jnp.repeat(s_ref[:].astype(jnp.bfloat16), 32, axis=0)
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    if has_bias:
        acc_ref[:] += jax.lax.dot_general(
            xs_ref[:], b_ref[:].astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _qmatmul_natpair(x: jax.Array, qt: QTensor, *, bn: int = DEFAULT_BN,
                     interpret: bool | None = None) -> jax.Array:
    """Natpair dispatch: W4A8 per-block int8 dots at decode shapes, W4A16
    full-tile bf16 dots at prefill shapes. Activations stay in natural
    order — no permutation gather on either path."""
    k, n = qt.k, qt.n
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    if _w4a8_enabled and m <= _W4A8_MAX_M:
        return _qmatmul_natpair_w4a8(x, qt, bn=2048, interpret=interpret)

    bk = qt.interleaved_bk
    assert qt.k % bk == 0, (qt.k, bk)   # stale tag after reshard?
    nb = bk // 32
    bn = _pick_bn(n, bn)
    assert n % bn == 0, (n, bn)
    m_pad, bm = _m_tiling(m)
    x2 = _pad_rows(x.reshape(m, k).astype(jnp.bfloat16), m_pad)

    has_bias = qt.bias is not None
    args = [x2, jnp.asarray(qt.q), jnp.asarray(qt.scale)]
    in_specs = [
        pl.BlockSpec((bm, bk), lambda mm, nn, kk: (mm, kk),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // 2, bn), lambda mm, nn, kk: (kk, nn),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, bn), lambda mm, nn, kk: (kk, nn),
                     memory_space=pltpu.VMEM),
    ]
    if has_bias:
        xs = x2.astype(jnp.float32).reshape(m_pad, k // 32, 32).sum(axis=-1).T
        args += [xs, jnp.asarray(qt.bias)]
        in_specs += [
            pl.BlockSpec((nb, bm), lambda mm, nn, kk: (kk, mm),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, bn), lambda mm, nn, kk: (kk, nn),
                         memory_space=pltpu.VMEM),
        ]

    out = pl.pallas_call(
        partial(_kernel_natpair_w4a16, has_bias, interpret),
        grid=(m_pad // bm, n // bn, k // bk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda mm, nn, kk: (mm, nn),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n,
            bytes_accessed=(m_pad // bm)
            * (k * n // 2 + k // 32 * n * 4 * (2 if has_bias else 1))
            + m_pad * k * 2 + m_pad * n * 4,
            transcendentals=0),
        interpret=interpret,
    )(*args)
    return out[:m].reshape(*lead, n)


# ---- W4A8 decode kernel: ggml's actual vec_dot math on the int8 MXU ----
#
# The reference's hot GEMV (ggml_vec_dot_q4_0_q8_0, ggml-quants.c:3469 with
# the int8 dot at :3855-3870) quantizes activations to Q8_0 per 32-block and
# does integer dots with an f32 scale-product epilogue. On TPU that removes
# the int8->bf16 cast AND the per-element scale multiply from the weight
# stream — the int4 weights go bitcast-only into the MXU. Measured at the
# GPT-J decode GEMV (m=1, K=4096, N=16384): 819-1349 GB/s effective vs
# 513 GB/s for the W4A16 rowpair kernel (tools/bench_qmm_variants.py).
# Activation quantization noise is bounded by ggml's own contract (the
# quality gate in docs/QUALITY.md shows equal whole-model PPL damage), and
# applies only at m <= _W4A8_MAX_M where the weight stream dominates.

# W4A8 engages only at true GEMV (m=1): its per-block (m, 32) x8 slices
# relayout badly for m > 1 (measured 724 ms/step at batch=8 vs 9.4 at
# batch=1), and batched decode amortizes the weight stream over the rows
# anyway, which is exactly what the W4A16 full-tile path is good at.
_W4A8_MAX_M = 1
_w4a8_enabled = True
# Kernel tiles: r04 end-to-end sweep on the v5e chip (GGML_TILE_SWEEP via
# tools/diag_stacked_combo.py 28 512, fused qkvf/of/lm-head GEMVs in the
# production decode scan): 1024x4096 = 6.369 ms/step vs 6.420 (2048x2048),
# 6.406 (1024x8192), 6.53 (2048x4096, 4096x2048), 6.77 (512x4096).
_W4A8_BKK = 1024       # kernel K-tile (spans bkk/32 blocks)
_W4A8_BN = 4096        # kernel N-tile
if os.environ.get("GGML_W4A8_TILES"):       # "BKKxBN" — chip-sweep override
    _W4A8_BKK, _W4A8_BN = (
        int(v) for v in os.environ["GGML_W4A8_TILES"].split("x"))


def set_w4a8_tiles(bkk: int, bn: int):
    """Tune the W4A8 kernel tiling (tools/bench_hbm.py sweep)."""
    global _W4A8_BKK, _W4A8_BN
    _W4A8_BKK, _W4A8_BN = bkk, bn


def set_w4a8(enable: bool):
    """Production default ON; off = always W4A16 (higher activation
    precision than the reference at the same weights)."""
    global _w4a8_enabled
    _w4a8_enabled = bool(enable)


def _quantize_activations_q8(x2: jax.Array, k: int, g: int = 32):
    """quantize_row_q8_0 value semantics (ggml-quants.c:440) on device:
    per-g symmetric int8, d = amax/127 (g=32 for per-32-scale formats; g=16
    aligns activation blocks with per-16 sub-scale formats). Returns x8
    (K/g, m, g) int8 and d (K/g, m) f32. jnp.round is round-half-even vs the
    reference's roundf; half-integer quotients are measure-zero on real
    activations."""
    m = x2.shape[0]
    xr = x2.astype(jnp.float32).reshape(m, k // g, g)
    amax = jnp.max(jnp.abs(xr), axis=-1)
    d = amax / 127.0
    inv = jnp.where(d > 0, 1.0 / jnp.where(d > 0, d, 1.0), 0.0)
    x8 = jnp.round(xr * inv[..., None]).astype(jnp.int8)
    return x8.transpose(1, 0, 2), d.T


def _natpair_unpack(qs_ref, interpret):
    """(bk/2, bn) packed natpair bytes (ref) -> (bk, bn) int8 (q - 8)."""
    return _natpair_unpack_2d(qs_ref[:], interpret)


def _kernel_natpair_w4a8(has_bias, nb, interpret, *refs):
    """Natural-pair layout: bitcast rows are natural element order, so each
    32-row block is a contiguous slab — the per-block int8 dots need no
    relayout (the rowpair u-order layout measured 46-159 GB/s here because
    its block rows are nb-strided; natpair measured 819-1349 GB/s)."""
    if has_bias:
        x8_ref, qs_ref, s_ref, dx_ref, xs_ref, b_ref, o_ref, acc_ref = refs
    else:
        x8_ref, qs_ref, s_ref, dx_ref, o_ref, acc_ref = refs
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w8 = _natpair_unpack(qs_ref, interpret)
    s_f32 = s_ref[:].astype(jnp.float32)     # scales may be stored f16
    acc = acc_ref[:]
    for b in range(nb):
        z = jax.lax.dot_general(
            x8_ref[b], w8[32 * b:32 * (b + 1), :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc = acc + z.astype(jnp.float32) * \
            (dx_ref[b][:, None] * s_f32[b][None, :])
    if has_bias:
        # exact affine term at q8_1 precision: sum_b bias[b,n] * d_b*sum(q8)
        acc = acc + jax.lax.dot_general(
            xs_ref[:], b_ref[:].astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc_ref[:] = acc

    @pl.when(kk == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _qmatmul_natpair_w4a8(x: jax.Array, qt: QTensor, *, bn: int,
                          interpret: bool) -> jax.Array:
    k, n = qt.k, qt.n
    # natpair has no per-tile permutation, so the kernel K-tile is free:
    # 2048 was the bandwidth winner in the variant sweep
    bkk = _W4A8_BKK
    while k % bkk:
        bkk //= 2
    if (bkk // 32) % 8 and bkk != k:
        # Mosaic needs the scale window's row count to be a multiple of 8
        # or the full array dim; odd Ks (e.g. GPT-2-XL's 1600 = 2^6*25)
        # halve down to tiny tiles, so run the whole K as one always-legal
        # full-dim window instead
        bkk = k
    nbk = bkk // 32
    bn = _pick_bn(n, _W4A8_BN)
    assert n % bn == 0, (n, bn)

    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(m, k)
    x8t, dx = _quantize_activations_q8(x2, k)

    has_bias = qt.bias is not None
    args = [x8t, jnp.asarray(qt.q), jnp.asarray(qt.scale), dx]
    in_specs = [
        pl.BlockSpec((nbk, m, 32), lambda nn, kk: (kk, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bkk // 2, bn), lambda nn, kk: (kk, nn),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nbk, bn), lambda nn, kk: (kk, nn),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nbk, m), lambda nn, kk: (kk, 0),
                     memory_space=pltpu.VMEM),
    ]
    if has_bias:
        xs = dx * jnp.sum(x8t.astype(jnp.float32), axis=-1)   # (K/32, m)
        args += [xs, jnp.asarray(qt.bias)]
        in_specs += [
            pl.BlockSpec((nbk, m), lambda nn, kk: (kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbk, bn), lambda nn, kk: (kk, nn),
                         memory_space=pltpu.VMEM),
        ]

    out = pl.pallas_call(
        partial(_kernel_natpair_w4a8, has_bias, nbk, interpret),
        grid=(n // bn, k // bkk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m, bn), lambda nn, kk: (0, nn),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=k * n // 2
            + k // 32 * n * 4 * (2 if has_bias else 1) + m * k + m * n * 4,
            transcendentals=0),
        interpret=interpret,
    )(*args)
    return out.reshape(*lead, n)


# ---- nat8 (q4_layout=4): natural-order int8 layout for the 8-bit-ish
# formats (Q5_0/Q5_1/Q8_0/Q5_K/Q6_K/IQ4_*), mirroring natpair: decode runs
# W8A8 per-block int8 MXU dots (the vec_dot_q8_0_q8_0 math,
# ggml-quants.c:4334) with no cast and no scale expansion in the weight
# stream; prefill expands scales with jnp.repeat amortized over m ----


def repack_nat8_device(qt: QTensor, bk: int = DEFAULT_BK,
                       scale_dtype=None) -> QTensor:
    """int8 rows stay in natural order — the 'repack' only moves the arrays
    to device and tags the layout. scale_dtype: see repack_natpair_device
    (applies to the affine bias too)."""
    assert qt.kind == "int8" and qt.interleaved_bk == 0
    assert qt.k % bk == 0, (qt.k, bk)
    g = qt.k // qt.scale.shape[0]
    assert g in (16, 32), g
    scale = jnp.asarray(qt.scale)
    bias = None if qt.bias is None else jnp.asarray(qt.bias)
    if scale_dtype is not None:
        scale = scale.astype(scale_dtype)
        bias = None if bias is None else bias.astype(scale_dtype)
    return replace(qt, q=jnp.asarray(qt.q), scale=scale, bias=bias,
                   interleaved_bk=bk, q4_layout=4)


def _kernel_nat8_w8a8(has_bias, nb, g, *refs):
    if has_bias:
        x8_ref, q_ref, s_ref, dx_ref, xs_ref, b_ref, o_ref, acc_ref = refs
    else:
        x8_ref, q_ref, s_ref, dx_ref, o_ref, acc_ref = refs
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w8 = q_ref[:]
    acc = acc_ref[:]
    for b in range(nb):
        z = jax.lax.dot_general(
            x8_ref[b], w8[g * b:g * (b + 1), :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc = acc + z.astype(jnp.float32) * \
            (dx_ref[b][:, None] * s_ref[b][None, :])
    if has_bias:
        acc = acc + jax.lax.dot_general(
            xs_ref[:], b_ref[:].astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc_ref[:] = acc

    @pl.when(kk == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _kernel_nat8_w8a16(has_bias, g, *refs):
    if has_bias:
        x_ref, q_ref, s_ref, xs_ref, b_ref, o_ref, acc_ref = refs
    else:
        x_ref, q_ref, s_ref, o_ref, acc_ref = refs
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = q_ref[:].astype(jnp.bfloat16) \
        * jnp.repeat(s_ref[:].astype(jnp.bfloat16), g, axis=0)
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    if has_bias:
        acc_ref[:] += jax.lax.dot_general(
            xs_ref[:], b_ref[:].astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _qmatmul_nat8(x: jax.Array, qt: QTensor, *, bn: int = DEFAULT_BN,
                  interpret: bool | None = None) -> jax.Array:
    k, n = qt.k, qt.n
    g = k // qt.scale.shape[0]
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    has_bias = qt.bias is not None

    if _w4a8_enabled and m <= _W4A8_MAX_M:
        bkk = _W4A8_BKK
        while k % bkk:
            bkk //= 2
        if (bkk // g) % 8 and bkk != k:
            bkk = k          # full-dim window is always Mosaic-legal
        nbk = bkk // g
        bn8 = _pick_bn(n, _W4A8_BN)
        assert n % bn8 == 0, (n, bn8)
        x2 = x.reshape(m, k)
        x8t, dx = _quantize_activations_q8(x2, k, g)
        args = [x8t, qt.q, jnp.asarray(qt.scale), dx]
        in_specs = [
            pl.BlockSpec((nbk, m, g), lambda nn, kk: (kk, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bkk, bn8), lambda nn, kk: (kk, nn),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbk, bn8), lambda nn, kk: (kk, nn),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbk, m), lambda nn, kk: (kk, 0),
                         memory_space=pltpu.VMEM),
        ]
        if has_bias:
            xs = dx * jnp.sum(x8t.astype(jnp.float32), axis=-1)
            args += [xs, jnp.asarray(qt.bias)]
            in_specs += [
                pl.BlockSpec((nbk, m), lambda nn, kk: (kk, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nbk, bn8), lambda nn, kk: (kk, nn),
                             memory_space=pltpu.VMEM),
            ]
        out = pl.pallas_call(
            partial(_kernel_nat8_w8a8, has_bias, nbk, g),
            grid=(n // bn8, k // bkk),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((m, bn8), lambda nn, kk: (0, nn),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            scratch_shapes=[pltpu.VMEM((m, bn8), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=2 * m * k * n,
                bytes_accessed=k * n + k // g * n * 4 *
                (2 if has_bias else 1) + m * k + m * n * 4,
                transcendentals=0),
            interpret=interpret,
        )(*args)
        return out.reshape(*lead, n)

    bk = qt.interleaved_bk
    assert qt.k % bk == 0, (qt.k, bk)   # stale tag after reshard?
    nb = bk // g
    bn = _pick_bn(n, bn)
    assert n % bn == 0, (n, bn)
    m_pad, bm = _m_tiling(m)
    x2 = _pad_rows(x.reshape(m, k).astype(jnp.bfloat16), m_pad)
    args = [x2, qt.q, jnp.asarray(qt.scale)]
    in_specs = [
        pl.BlockSpec((bm, bk), lambda mm, nn, kk: (mm, kk),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, bn), lambda mm, nn, kk: (kk, nn),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, bn), lambda mm, nn, kk: (kk, nn),
                     memory_space=pltpu.VMEM),
    ]
    if has_bias:
        xs = x2.astype(jnp.float32).reshape(m_pad, k // g, g).sum(axis=-1).T
        args += [xs, jnp.asarray(qt.bias)]
        in_specs += [
            pl.BlockSpec((nb, bm), lambda mm, nn, kk: (kk, mm),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, bn), lambda mm, nn, kk: (kk, nn),
                         memory_space=pltpu.VMEM),
        ]
    out = pl.pallas_call(
        partial(_kernel_nat8_w8a16, has_bias, g),
        grid=(m_pad // bm, n // bn, k // bk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda mm, nn, kk: (mm, nn),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n,
            bytes_accessed=(m_pad // bm)
            * (k * n + k // g * n * 4 * (2 if has_bias else 1))
            + m_pad * k * 2 + m_pad * n * 4,
            transcendentals=0),
        interpret=interpret,
    )(*args)
    return out[:m].reshape(*lead, n)


# ---- stacked-layer kernels: the same natpair/nat8 math over weights with a
# leading n_layer axis, selected by a scalar-prefetched layer index. This is
# what lets the model run lax.scan over layers (ONE compiled layer body, the
# warmup/executable-size fix) while each kernel still streams its layer's
# tiles straight from the stacked HBM buffer — no per-layer gather/copy, no
# XLA dynamic-slice materialization. The analog of the reference looping
# layer graphs over one set of kernels (gpt-j/main.cpp:421-589). ----


def stack_natpair(qts):
    """Deprecated helper — use quant.device.stack_layers on whole dicts."""
    from ..quant.device import stack_layers
    return stack_layers([{"w": t} for t in qts])["w"]


def _kernel_natpair_w4a8_stk(has_bias, nb, interpret, *refs):
    if has_bias:
        s_ref, x8_ref, qs_ref, sc_ref, dx_ref, xs_ref, b_ref, o_ref, acc_ref = refs
    else:
        s_ref, x8_ref, qs_ref, sc_ref, dx_ref, o_ref, acc_ref = refs
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w8 = _natpair_unpack_2d(qs_ref[0], interpret)
    s_f32 = sc_ref[0].astype(jnp.float32)
    acc = acc_ref[:]
    for b in range(nb):
        z = jax.lax.dot_general(
            x8_ref[b], w8[32 * b:32 * (b + 1), :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc = acc + z.astype(jnp.float32) * \
            (dx_ref[b][:, None] * s_f32[b][None, :])
    if has_bias:
        acc = acc + jax.lax.dot_general(
            xs_ref[:], b_ref[0].astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc_ref[:] = acc

    @pl.when(kk == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _natpair_unpack_2d(qs, interpret):
    """(bk/2, bn) packed natpair bytes (loaded array) -> (bk, bn) int8
    values (q - 8) — the ONE copy of the nibble math (both the stacked and
    unstacked kernels route here)."""
    if interpret:
        g = qs.astype(jnp.int32)
        lo = ((g & 15) ^ 8) - 8
        hi = ((g >> 4) ^ 8) - 8
        bk2, bn = lo.shape
        return jnp.stack([lo, hi], axis=1).reshape(2 * bk2, bn) \
            .astype(jnp.int8)
    return pltpu.bitcast(qs, jnp.int4).astype(jnp.int8)


def qmatmul_natpair_w4a8_stacked(x: jax.Array, qt: QTensor, li,
                                 *, interpret: bool | None = None) -> jax.Array:
    """W4A8 decode GEMV over ONE layer of a stacked natpair QTensor.
    x: (..., K) for the selected layer; li: () int32 layer index."""
    assert qt.n_stack > 0 and qt.q4_layout == 3
    k, n = qt.k, qt.n
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    bkk = _W4A8_BKK
    while k % bkk:
        bkk //= 2
    if (bkk // 32) % 8 and bkk != k:
        # Mosaic needs the scale window's row count to be a multiple of 8
        # or the full array dim; odd Ks (e.g. GPT-2-XL's 1600 = 2^6*25)
        # halve down to tiny tiles, so run the whole K as one always-legal
        # full-dim window instead
        bkk = k
    nbk = bkk // 32
    bn = _pick_bn(n, _W4A8_BN)
    assert n % bn == 0, (n, bn)

    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(m, k)
    x8t, dx = _quantize_activations_q8(x2, k)

    has_bias = qt.bias is not None
    args = [x8t, qt.q, qt.scale, dx]
    in_specs = [
        pl.BlockSpec((nbk, m, 32), lambda nn, kk, s: (kk, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bkk // 2, bn), lambda nn, kk, s: (s[0], kk, nn),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nbk, bn), lambda nn, kk, s: (s[0], kk, nn),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nbk, m), lambda nn, kk, s: (kk, 0),
                     memory_space=pltpu.VMEM),
    ]
    if has_bias:
        xs = dx * jnp.sum(x8t.astype(jnp.float32), axis=-1)
        args += [xs, qt.bias]
        in_specs += [
            pl.BlockSpec((nbk, m), lambda nn, kk, s: (kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nbk, bn), lambda nn, kk, s: (s[0], kk, nn),
                         memory_space=pltpu.VMEM),
        ]

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // bn, k // bkk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m, bn), lambda nn, kk, s: (0, nn),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        partial(_kernel_natpair_w4a8_stk, has_bias, nbk, interpret),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=k * n // 2
            + k // 32 * n * 4 * (2 if has_bias else 1) + m * k + m * n * 4,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(li, jnp.int32).reshape(1), *args)
    return out.reshape(*lead, n)


def _kernel_natpair_w4a16_stk(has_bias, interpret, *refs):
    if has_bias:
        s_ref, x_ref, qs_ref, sc_ref, xs_ref, b_ref, o_ref, acc_ref = refs
    else:
        s_ref, x_ref, qs_ref, sc_ref, o_ref, acc_ref = refs
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _natpair_unpack_2d(qs_ref[0], interpret).astype(jnp.bfloat16)
    w = w * jnp.repeat(sc_ref[0].astype(jnp.bfloat16), 32, axis=0)
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    if has_bias:
        acc_ref[:] += jax.lax.dot_general(
            xs_ref[:], b_ref[0].astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def qmatmul_natpair_w4a16_stacked(x: jax.Array, qt: QTensor, li,
                                  *, bn: int = DEFAULT_BN,
                                  interpret: bool | None = None) -> jax.Array:
    """W4A16 (prefill) matmul over one layer of a stacked natpair QTensor."""
    assert qt.n_stack > 0 and qt.q4_layout == 3
    k, n = qt.k, qt.n
    bk = qt.interleaved_bk
    assert qt.k % bk == 0, (qt.k, bk)   # stale tag after reshard?
    nb = bk // 32
    bn = _pick_bn(n, bn)
    assert n % bn == 0, (n, bn)
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    m_pad, bm = _m_tiling(m)
    x2 = _pad_rows(x.reshape(m, k).astype(jnp.bfloat16), m_pad)

    has_bias = qt.bias is not None
    args = [x2, qt.q, qt.scale]
    in_specs = [
        pl.BlockSpec((bm, bk), lambda mm, nn, kk, s: (mm, kk),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk // 2, bn), lambda mm, nn, kk, s: (s[0], kk, nn),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nb, bn), lambda mm, nn, kk, s: (s[0], kk, nn),
                     memory_space=pltpu.VMEM),
    ]
    if has_bias:
        xs = x2.astype(jnp.float32).reshape(m_pad, k // 32, 32).sum(axis=-1).T
        args += [xs, qt.bias]
        in_specs += [
            pl.BlockSpec((nb, bm), lambda mm, nn, kk, s: (kk, mm),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, bn), lambda mm, nn, kk, s: (s[0], kk, nn),
                         memory_space=pltpu.VMEM),
        ]

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m_pad // bm, n // bn, k // bk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda mm, nn, kk, s: (mm, nn),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        partial(_kernel_natpair_w4a16_stk, has_bias, interpret),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n,
            bytes_accessed=(m_pad // bm)
            * (k * n // 2 + k // 32 * n * 4 * (2 if has_bias else 1))
            + m_pad * k * 2 + m_pad * n * 4,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(li, jnp.int32).reshape(1), *args)
    return out[:m].reshape(*lead, n)


def qmatmul_stacked(x: jax.Array, qt: QTensor, li, *,
                    interpret: bool | None = None) -> jax.Array:
    """Layer-indexed matmul over a stacked QTensor: W4A8 at decode shapes,
    W4A16 at prefill shapes (same dispatch rule as qmatmul_pallas)."""
    assert qt.n_stack > 0
    if qt.q4_layout == 3:
        lead = x.shape[:-1]
        m = int(np.prod(lead)) if lead else 1
        if _w4a8_enabled and m <= _W4A8_MAX_M:
            return qmatmul_natpair_w4a8_stacked(x, qt, li,
                                                interpret=interpret)
        return qmatmul_natpair_w4a16_stacked(x, qt, li, interpret=interpret)
    if qt.q4_layout == 4:
        return qmatmul_nat8_stacked(x, qt, li, interpret=interpret)
    raise ValueError(f"unsupported stacked layout {qt.q4_layout}")


def _kernel_nat8_w8a8_stk(has_bias, nb, g, *refs):
    if has_bias:
        s_ref, x8_ref, q_ref, sc_ref, dx_ref, xs_ref, b_ref, o_ref, acc_ref = refs
    else:
        s_ref, x8_ref, q_ref, sc_ref, dx_ref, o_ref, acc_ref = refs
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w8 = q_ref[0]
    sc = sc_ref[0].astype(jnp.float32)
    acc = acc_ref[:]
    for b in range(nb):
        z = jax.lax.dot_general(
            x8_ref[b], w8[g * b:g * (b + 1), :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc = acc + z.astype(jnp.float32) * \
            (dx_ref[b][:, None] * sc[b][None, :])
    if has_bias:
        acc = acc + jax.lax.dot_general(
            xs_ref[:], b_ref[0].astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc_ref[:] = acc

    @pl.when(kk == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _kernel_nat8_w8a16_stk(has_bias, g, *refs):
    if has_bias:
        s_ref, x_ref, q_ref, sc_ref, xs_ref, b_ref, o_ref, acc_ref = refs
    else:
        s_ref, x_ref, q_ref, sc_ref, o_ref, acc_ref = refs
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = q_ref[0].astype(jnp.bfloat16) \
        * jnp.repeat(sc_ref[0].astype(jnp.bfloat16), g, axis=0)
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    if has_bias:
        acc_ref[:] += jax.lax.dot_general(
            xs_ref[:], b_ref[0].astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def qmatmul_nat8_stacked(x: jax.Array, qt: QTensor, li, *,
                         bn: int = DEFAULT_BN,
                         interpret: bool | None = None) -> jax.Array:
    """Layer-indexed W8A8/W8A16 matmul over a stacked nat8 QTensor."""
    assert qt.n_stack > 0 and qt.q4_layout == 4
    k, n = qt.k, qt.n
    g = k // qt.scale.shape[1]
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    has_bias = qt.bias is not None
    li = jnp.asarray(li, jnp.int32).reshape(1)

    if _w4a8_enabled and m <= _W4A8_MAX_M:
        bkk = _W4A8_BKK
        while k % bkk:
            bkk //= 2
        if (bkk // g) % 8 and bkk != k:
            bkk = k          # full-dim window is always Mosaic-legal
        nbk = bkk // g
        bn8 = _pick_bn(n, _W4A8_BN)
        assert n % bn8 == 0, (n, bn8)
        x2 = x.reshape(m, k)
        x8t, dx = _quantize_activations_q8(x2, k, g)
        args = [x8t, qt.q, qt.scale, dx]
        in_specs = [
            pl.BlockSpec((nbk, m, g), lambda nn, kk, s: (kk, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkk, bn8), lambda nn, kk, s: (s[0], kk, nn),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nbk, bn8), lambda nn, kk, s: (s[0], kk, nn),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbk, m), lambda nn, kk, s: (kk, 0),
                         memory_space=pltpu.VMEM),
        ]
        if has_bias:
            xs = dx * jnp.sum(x8t.astype(jnp.float32), axis=-1)
            args += [xs, qt.bias]
            in_specs += [
                pl.BlockSpec((nbk, m), lambda nn, kk, s: (kk, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nbk, bn8), lambda nn, kk, s: (s[0], kk, nn),
                             memory_space=pltpu.VMEM),
            ]
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // bn8, k // bkk),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((m, bn8), lambda nn, kk, s: (0, nn),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((m, bn8), jnp.float32)],
        )
        out = pl.pallas_call(
            partial(_kernel_nat8_w8a8_stk, has_bias, nbk, g),
            grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=2 * m * k * n,
                bytes_accessed=k * n + k // g * n * 4 *
                (2 if has_bias else 1) + m * k + m * n * 4,
                transcendentals=0),
            interpret=interpret,
        )(li, *args)
        return out.reshape(*lead, n)

    bk = qt.interleaved_bk
    assert qt.k % bk == 0, (qt.k, bk)   # stale tag after reshard?
    nb = bk // g
    bn = _pick_bn(n, bn)
    assert n % bn == 0, (n, bn)
    m_pad, bm = _m_tiling(m)
    x2 = _pad_rows(x.reshape(m, k).astype(jnp.bfloat16), m_pad)
    args = [x2, qt.q, qt.scale]
    in_specs = [
        pl.BlockSpec((bm, bk), lambda mm, nn, kk, s: (mm, kk),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, bn), lambda mm, nn, kk, s: (s[0], kk, nn),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nb, bn), lambda mm, nn, kk, s: (s[0], kk, nn),
                     memory_space=pltpu.VMEM),
    ]
    if has_bias:
        xs = x2.astype(jnp.float32).reshape(m_pad, k // g, g).sum(axis=-1).T
        args += [xs, qt.bias]
        in_specs += [
            pl.BlockSpec((nb, bm), lambda mm, nn, kk, s: (kk, mm),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, bn), lambda mm, nn, kk, s: (s[0], kk, nn),
                         memory_space=pltpu.VMEM),
        ]
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m_pad // bm, n // bn, k // bk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda mm, nn, kk, s: (mm, nn),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        partial(_kernel_nat8_w8a16_stk, has_bias, g),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n,
            bytes_accessed=(m_pad // bm)
            * (k * n + k // g * n * 4 * (2 if has_bias else 1))
            + m_pad * k * 2 + m_pad * n * 4,
            transcendentals=0),
        interpret=interpret,
    )(li, *args)
    return out[:m].reshape(*lead, n)


# ---- int8-kind fused kernel (Q5_0/Q5_1/Q8_0/Q5_K/Q6_K/IQ4_*: weights are
# already int8 in HBM; the kernel streams them at 1 byte/elt and expands to
# bf16 in VMEM — the dmmv.cu analog for 8-bit-ish formats) ----

def repack_int8_rows_device(qt: QTensor, bk: int = DEFAULT_BK) -> QTensor:
    """Reorder int8 rows into u-order (element (block b, intra e) -> row
    u = e*NB + b, NB = bk/group) so per-group scale expansion is a
    tile-repeat, exactly like the row-pair layout. Group is 16 or 32
    depending on the format's scale granularity."""
    assert qt.kind == "int8" and qt.interleaved_bk == 0
    assert qt.k % bk == 0, (qt.k, bk)
    groups = qt.scale.shape[0]
    g = qt.k // groups
    assert g in (16, 32), g
    nb = bk // g

    @jax.jit
    def rp(q):
        vt = q.reshape(qt.k // bk, nb, g, qt.n).transpose(0, 2, 1, 3)
        return vt.reshape(qt.k, qt.n)

    return replace(qt, q=rp(jnp.asarray(qt.q)),
                   scale=jnp.asarray(qt.scale),
                   bias=None if qt.bias is None else jnp.asarray(qt.bias),
                   interleaved_bk=bk, q4_layout=2)


def _permute_activations_int8(x, k, bk, g):
    nb = bk // g
    lead = x.shape[:-1]
    xr = x.reshape(*lead, k // bk, nb, g)
    return xr.swapaxes(-2, -1).reshape(*lead, k)


def _kernel_int8(has_bias, g, *refs):
    if has_bias:
        x_ref, q_ref, s_ref, xs_ref, b_ref, o_ref, acc_ref = refs
    else:
        x_ref, q_ref, s_ref, o_ref, acc_ref = refs
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = q_ref[:].astype(jnp.bfloat16) \
        * pltpu.repeat(s_ref[:].astype(jnp.bfloat16), g, axis=0)
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    if has_bias:
        acc_ref[:] += jax.lax.dot_general(
            xs_ref[:], b_ref[:].astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _qmatmul_int8(x: jax.Array, qt: QTensor, *, bn: int = DEFAULT_BN,
                  interpret: bool | None = None) -> jax.Array:
    bk = qt.interleaved_bk
    assert qt.k % bk == 0, (qt.k, bk)   # stale tag after reshard?
    groups = qt.scale.shape[0]
    g = qt.k // groups
    nb = bk // g
    k, n = qt.k, qt.n
    bn = _pick_bn(n, bn)
    assert n % bn == 0, (n, bn)
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    m_pad, bm = _m_tiling(m)
    x2 = _pad_rows(x.reshape(m, k).astype(jnp.bfloat16), m_pad)
    xp = _permute_activations_int8(x2, k, bk, g)

    has_bias = qt.bias is not None
    args = [xp, jnp.asarray(qt.q), jnp.asarray(qt.scale)]
    in_specs = [
        pl.BlockSpec((bm, bk), lambda mm, nn, kk: (mm, kk),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, bn), lambda mm, nn, kk: (kk, nn),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, bn), lambda mm, nn, kk: (kk, nn),
                     memory_space=pltpu.VMEM),
    ]
    if has_bias:
        xs = x2.astype(jnp.float32).reshape(m_pad, groups, g).sum(axis=-1).T
        args += [xs, jnp.asarray(qt.bias)]
        in_specs += [
            pl.BlockSpec((nb, bm), lambda mm, nn, kk: (kk, mm),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, bn), lambda mm, nn, kk: (kk, nn),
                         memory_space=pltpu.VMEM),
        ]

    out = pl.pallas_call(
        partial(_kernel_int8, has_bias, g),
        grid=(m_pad // bm, n // bn, k // bk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda mm, nn, kk: (mm, nn),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n,
            bytes_accessed=(m_pad // bm) * (k * n + k // g * n * 4)
            + m_pad * k * 2 + m_pad * n * 4,
            transcendentals=0),
        interpret=interpret,
    )(*args)
    return out[:m].reshape(*lead, n)
