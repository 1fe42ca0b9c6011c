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


def params_repack_device(params, bk: int = DEFAULT_BK):
    """Repack every natural-layout nib4 QTensor leaf of a params pytree for
    the fused kernel (one-time at load, the analog of the reference's
    per-backend weight re-encoding, src/ggml-cuda/convert.cu)."""
    def conv(x):
        if isinstance(x, QTensor) and x.kind == "nib4" \
                and x.interleaved_bk == 0 and x.k % bk == 0:
            return repack_interleaved_device(x, bk)
        return x

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


def _permute_activations(x, k, bk):
    """Per-tile activation permutation matching the block-interleaved layout:
    element (tile, block b, half h, intra j) -> row (tile, h, j, b)."""
    nb = bk // 32
    lead = x.shape[:-1]
    xr = x.reshape(*lead, k // bk, nb, 2, 16)
    return xr.swapaxes(-3, -2).swapaxes(-2, -1).reshape(*lead, k)  # (..., T, h, j, b)


def _kernel_noround(has_bias, zero, x_ref, qs_ref, slo_ref, shi_ref, *rest):
    if has_bias:
        blo_ref, bhi_ref, o_ref, acc_ref = rest
    else:
        o_ref, acc_ref = rest
    kk = pl.program_id(1)

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

    @pl.when(kk == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def qmatmul_pallas(x: jax.Array, qt: QTensor, *, bn: int = DEFAULT_BN,
                   interpret: bool | None = None) -> jax.Array:
    """Fused quantized matmul on a block-interleaved nib4 QTensor.
    x: (..., K) bf16/f32 -> (..., N) f32."""
    assert qt.kind == "nib4" and qt.interleaved_bk > 0, \
        "qmatmul_pallas requires repack_interleaved() weights"
    bk = qt.interleaved_bk
    nb = bk // 32
    k, n = qt.k, qt.n
    bn = min(bn, n)
    if n % bn:
        # largest 128-multiple tile dividing n (kernel needs exact tiling)
        for cand in (512, 256, 128):
            if n % cand == 0:
                bn = cand
                break
    assert n % bn == 0, (n, bn)
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(m, k).astype(jnp.bfloat16)
    xp = _permute_activations(x2, k, bk)

    s_lo, s_hi, b_lo, b_hi = _split_scales(qt)
    has_bias = b_lo is not None
    args = [xp, jnp.asarray(qt.q), jnp.asarray(s_lo), jnp.asarray(s_hi)]
    in_specs = [
        pl.BlockSpec((m, bk), lambda nn, kk: (0, kk), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // 2, bn), lambda nn, kk: (kk, nn), memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, bn), lambda nn, kk: (kk, nn), memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, bn), lambda nn, kk: (kk, nn), memory_space=pltpu.VMEM),
    ]
    if has_bias:
        args += [jnp.asarray(b_lo), jnp.asarray(b_hi)]
        in_specs += [
            pl.BlockSpec((nb, bn), lambda nn, kk: (kk, nn), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, bn), lambda nn, kk: (kk, nn), memory_space=pltpu.VMEM),
        ]

    out = pl.pallas_call(
        partial(_kernel_noround, has_bias, qt.zero),
        grid=(n // bn, k // bk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m, bn), lambda nn, kk: (0, nn), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=k * n // 2 + k // 32 * n * 4 + m * k * 2 + m * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out.reshape(*lead, n)
