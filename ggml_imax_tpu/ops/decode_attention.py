"""Fused single-token (decode) attention over the stacked KV cache.

The TPU analog of the reference's decode attention path (fattn-vec-f16/f32.cu
vector kernels, dispatched for small batch at src/ggml-cuda/fattn.cu:500-514):
one kernel per layer reads K/V straight from the (n_layer, B, n_ctx, H, D)
cache arena — bf16 or q8_0-quantized (int8 + per-32 scales) — applies the
additive mask, runs an online softmax over KV blocks, and writes (B, Hq, D).

Why a kernel: inside the lax.scan-over-layers decode step the XLA path would
dynamic-slice the layer's K/V out of the stacked cache (a materialized
8.4 MB copy per layer at 6B geometry) and dequantize the q8_0 residency into
a second copy. Here the layer is selected by a scalar-prefetched index, so
the cache is read exactly once per step at its stored width, and the whole
per-layer attention is ONE dispatch instead of ~6 XLA fusions.

Layout note: the cache keeps its natural (..., n_ctx, H, D) layout and the
kernel views it as (..., n_ctx, H*D); per-head tiles are 128-aligned lane
slices (D is a multiple of 128 for the real models), so no transpose or
relayout of cache memory ever happens — unlike the prefill flash kernel,
which pre-transposes to head-major in XLA (fine there: the cost amortizes
over Tq, see ops/flash_attention.py).

q8_0 dequantization in-kernel: the per-32 scale expansion along lanes is an
element-repeat, which Mosaic lowers poorly as a vector op; instead
srep = scales @ E where E[j, d] = (d//32 == j) is a tiny (nb, D) 0/1 matrix
— an MXU matmul, effectively free next to the KV stream.
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -0.7 * float(np.finfo(np.float32).max)


def _pick_bk(t: int, row_bytes: int = 0) -> int:
    """KV-block length: largest power-of-two divisor of t (≤512), shrunk
    until one K+V window fits an ~8 MB VMEM budget (Mosaic double-buffers
    every window; the kernels raise the scoped-vmem limit to _VMEM_LIMIT,
    and the budget keeps long-context windows well under it).

    Every value returned is Mosaic-legal as the window's second-to-last /
    last block dim: either the FULL t (a full-dim window is always legal)
    or a multiple of 256 halved down to 128 — the shrink loop only runs
    while bk % 256 == 0 so a halving can never produce a non-128-multiple
    (e.g. t=1000 stays 1000; it never becomes 500/250/125)."""
    env = os.environ.get("GGML_DECODE_BK")
    if env and t % int(env) == 0:        # chip-sweep override
        return int(env)
    bk = t
    for cand in (512, 256, 128):
        if t % cand == 0:
            bk = min(cand, t)
            break
    while bk > 128 and bk % 256 == 0 and bk * row_bytes > 8 * 1024 * 1024:
        bk //= 2
    return bk


# Scoped-VMEM ceiling for the decode kernels: the default 16 MB rejects the
# 6B-geometry fused kernel (double-buffered 512×4096 bf16 K+V windows are
# 20.3 MB by Mosaic's accounting); total VMEM is 128 MB, so 64 MB is safe
# headroom for one kernel on the core.
_VMEM_LIMIT = 64 * 1024 * 1024


def _kernel(scale, g_rep, hkv, d, nb, quantized, *refs):
    if quantized:
        (s_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, m_ref,
         o_ref, acc, m_s, l_s) = refs
    else:
        s_ref, q_ref, k_ref, v_ref, m_ref, o_ref, acc, m_s, l_s = refs
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_s[:] = jnp.full_like(m_s, NEG)
        l_s[:] = jnp.zeros_like(l_s)

    mask = m_ref[0].astype(jnp.float32)                     # (1, BK)
    if quantized:
        bkl = k_ref.shape[2]
        # E[j, d] = 1 iff d // 32 == j: scale expansion as a tiny matmul
        ed = jax.lax.broadcasted_iota(jnp.int32, (nb, d), 1) // 32
        ej = jax.lax.broadcasted_iota(jnp.int32, (nb, d), 0)
        expand = (ed == ej).astype(jnp.float32)

    for h in range(hkv):
        if quantized:
            ksb = ks_ref[0, 0, :, h * nb:(h + 1) * nb]      # (BK, nb) f32
            vsb = vs_ref[0, 0, :, h * nb:(h + 1) * nb]
            kb = (k_ref[0, 0, :, h * d:(h + 1) * d].astype(jnp.float32)
                  * jnp.dot(ksb, expand)).astype(jnp.bfloat16)
            vb = (v_ref[0, 0, :, h * d:(h + 1) * d].astype(jnp.float32)
                  * jnp.dot(vsb, expand)).astype(jnp.bfloat16)
        else:
            kb = k_ref[0, 0, :, h * d:(h + 1) * d]          # (BK, D) bf16
            vb = v_ref[0, 0, :, h * d:(h + 1) * d]
        qh = q_ref[0, h * g_rep:(h + 1) * g_rep, :].astype(jnp.bfloat16)
        s = jax.lax.dot_general(qh, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.maximum(s + mask, NEG)                      # (G, BK)

        r = slice(h * g_rep, (h + 1) * g_rep)
        m_prev = m_s[r, :1]                                 # (G, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_s[r, :1] = l_s[r, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_s[r, :1] = m_new
        pv = jax.lax.dot_general(p.astype(jnp.bfloat16), vb,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc[r, :] = acc[r, :] * alpha + pv

    @pl.when(kk == pl.num_programs(1) - 1)
    def _():
        o_ref[0] = acc[:] / jnp.maximum(l_s[:, :1], 1e-30)


def _kernel_cellsb(scale, g_rep, hkv, d, nb, quantized, n_rows, *refs):
    """Cells (continuous-batching) kernel: grid (T//bk,) — ONE pass over
    the shared arena per layer processing ALL NB query rows against each
    resident block. The original (NB, T//bk) grid re-ran the block work
    (q8 dequant + stream) once PER ROW: measured 10.5 ms/step at batch 8 /
    n_ctx 2048 — the entire celled-vs-flat serving gap. Here the block
    dequantizes once and the per-head score dot batches all rows on the
    MXU; per-(head, row) online-softmax state lives in head-indexed
    scratch (static indices only)."""
    if quantized:
        (s_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, m_ref,
         o_ref, acc, m_s, l_s) = refs
    else:
        s_ref, q_ref, k_ref, v_ref, m_ref, o_ref, acc, m_s, l_s = refs
    kk = pl.program_id(0)
    R = n_rows * g_rep                       # score rows per kv head

    @pl.when(kk == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_s[:] = jnp.full_like(m_s, NEG)
        l_s[:] = jnp.zeros_like(l_s)

    bkl = k_ref.shape[2]
    mask = m_ref[:, 0].astype(jnp.float32)                  # (NB, BK)
    if g_rep > 1:
        mask = jnp.broadcast_to(mask[:, None], (n_rows, g_rep, bkl)) \
            .reshape(R, bkl)
    if quantized:
        ed = jax.lax.broadcasted_iota(jnp.int32, (nb, d), 1) // 32
        ej = jax.lax.broadcasted_iota(jnp.int32, (nb, d), 0)
        expand = (ed == ej).astype(jnp.float32)

    outs = []
    for h in range(hkv):
        if quantized:
            ksb = ks_ref[0, 0, :, h * nb:(h + 1) * nb]      # (BK, nb) f32
            vsb = vs_ref[0, 0, :, h * nb:(h + 1) * nb]
            kb = (k_ref[0, 0, :, h * d:(h + 1) * d].astype(jnp.float32)
                  * jnp.dot(ksb, expand)).astype(jnp.bfloat16)
            vb = (v_ref[0, 0, :, h * d:(h + 1) * d].astype(jnp.float32)
                  * jnp.dot(vsb, expand)).astype(jnp.bfloat16)
        else:
            kb = k_ref[0, 0, :, h * d:(h + 1) * d]          # (BK, D) bf16
            vb = v_ref[0, 0, :, h * d:(h + 1) * d]
        # ALL rows' queries for this kv head: (NB, g, D) -> (R, D)
        qh = q_ref[:, h * g_rep:(h + 1) * g_rep, :] \
            .reshape(R, d).astype(jnp.bfloat16)
        s = jax.lax.dot_general(qh, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.maximum(s + mask, NEG)                      # (R, BK)

        rh = slice(h * R, (h + 1) * R)
        m_prev = m_s[rh, :1]                                # (R, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_s[rh, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        l_s[rh, :1] = l_new
        m_s[rh, :1] = m_new
        pv = jax.lax.dot_general(p.astype(jnp.bfloat16), vb,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_new = acc[rh, :] * alpha + pv
        acc[rh, :] = acc_new
        outs.append((acc_new / jnp.maximum(l_new, 1e-30))
                    .reshape(n_rows, g_rep, d))

    @pl.when(kk == pl.num_programs(0) - 1)
    def _():
        # one contiguous write: rows of head h sit at q columns
        # [h*g_rep, (h+1)*g_rep) — concatenation restores (NB, Hq, D)
        o_ref[:] = jnp.concatenate(outs, axis=1)


@functools.partial(jax.jit,
                   static_argnames=("hkv", "scale", "interpret", "cells"))
def _decode_attn(li, q, k, v, ks, vs, mask, *, hkv, scale, interpret,
                 cells=False):
    """k/v: (L, B, T, Hkv*D) flat arena (rank-5 (L, B, T, Hkv, D) accepted
    but costs a full-arena relayout copy on TPU — always pass flat caches
    on the hot path; see models.common.KVCache).

    cells=True: continuous-batching read-only mode — the arena batch dim
    is 1 (shared cell pool), q carries NB query rows of distinct
    sequences, and mask is (NB, T) per-cell visibility
    (models.common.cells_attention_mask). The rows' fresh K/V must
    already be scattered into the arena (update_kv_cells) — this is the
    two-step celled path, the serving analog of "kernel"."""
    if k.ndim == 5:
        L, B, T = k.shape[:3]
        k = k.reshape(L, B, T, -1)
        v = v.reshape(L, B, T, -1)
        if ks is not None:
            ks = ks.reshape(L, B, T, -1)
            vs = vs.reshape(L, B, T, -1)
    L, B, T, HD = k.shape
    NB = q.shape[0]
    if cells:
        assert B == 1, "cells mode shares one arena across query rows"
    Hkv = hkv
    D = HD // Hkv
    _, Hq, _ = q.shape
    g_rep = Hq // Hkv
    nb = D // 32 if ks is not None else 0
    quantized = ks is not None
    bk = _pick_bk(T, 2 * HD * k.dtype.itemsize
                  + (2 * Hkv * nb * 4 if quantized else 0))

    k2, v2 = k, v
    m2 = jnp.maximum(jnp.asarray(mask, jnp.float32), NEG).reshape(NB, 1, T)

    if cells:
        # grid (T//bk,): ONE arena pass per layer, every query row handled
        # against the resident block (dequant once, rows batched on the
        # MXU). The (NB, kk) grid re-ran the block work per row: measured
        # 10.5 ms/step at batch 8 / n_ctx 2048 — the celled-vs-flat gap.
        ab = lambda kk, s: (s[0], 0, kk, 0)
        qo = lambda kk, s: (0, 0, 0)
        mb = lambda kk, s: (0, 0, kk)
        grid = (T // bk,)
        kern = functools.partial(_kernel_cellsb, scale, g_rep, Hkv, D, nb,
                                 quantized, NB)
        qspec = pl.BlockSpec((NB, Hq, D), qo, memory_space=pltpu.VMEM)
        mspec = pl.BlockSpec((NB, 1, bk), mb, memory_space=pltpu.VMEM)
        scratch = [
            pltpu.VMEM((Hkv * NB * g_rep, D), jnp.float32),
            pltpu.VMEM((Hkv * NB * g_rep, 128), jnp.float32),
            pltpu.VMEM((Hkv * NB * g_rep, 128), jnp.float32),
        ]
        kv_reads = 1
        semantics = ("arbitrary",)
    else:
        ab = lambda b, kk, s: (s[0], b, kk, 0)
        qo = lambda b, kk, s: (b, 0, 0)
        mb = lambda b, kk, s: (b, 0, kk)
        grid = (NB, T // bk)
        kern = functools.partial(_kernel, scale, g_rep, Hkv, D, nb,
                                 quantized)
        qspec = pl.BlockSpec((1, Hq, D), qo, memory_space=pltpu.VMEM)
        mspec = pl.BlockSpec((1, 1, bk), mb, memory_space=pltpu.VMEM)
        scratch = [
            pltpu.VMEM((Hq, D), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
        ]
        kv_reads = NB
        semantics = ("arbitrary", "arbitrary")
    args = [q, k2, v2]
    in_specs = [
        qspec,
        pl.BlockSpec((1, 1, bk, Hkv * D), ab, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, Hkv * D), ab, memory_space=pltpu.VMEM),
    ]
    if quantized:
        args += [ks, vs]
        in_specs += [
            pl.BlockSpec((1, 1, bk, Hkv * nb), ab,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, Hkv * nb), ab,
                         memory_space=pltpu.VMEM),
        ]
    args.append(m2)
    in_specs.append(mspec)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(qspec.block_shape, qo,
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    kv_bytes = 2 * T * Hkv * D * (1 if quantized else 2) \
        + (2 * T * Hkv * nb * 4 if quantized else 0)
    out = pl.pallas_call(
        kern,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((NB, Hq, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=4 * NB * Hq * T * D,
            bytes_accessed=kv_reads * kv_bytes + NB * (Hq * D * 8 + T * 4),
            transcendentals=NB * Hq * T),
        interpret=interpret,
    )(jnp.asarray(li, jnp.int32).reshape(1), *args)
    return out


def decode_attention_stacked(cache, li, q, mask, *, scale=None,
                             interpret: bool | None = None):
    """q: (B, 1, Hq, D) single-token queries; cache: models.common.KVCache
    (stacked, layer selected by li); mask: additive, broadcastable to
    (B, 1, 1, n_ctx). Returns (B, 1, Hq, D) f32."""
    B, Tq, Hq, D = q.shape
    assert Tq == 1, "decode kernel is single-token only"
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    scale = scale if scale is not None else 1.0 / math.sqrt(D)
    T = cache.k.shape[2]
    hkv = cache.heads if cache.flat else cache.k.shape[3]
    m2 = jnp.broadcast_to(mask.reshape(B, -1)[:, -T:], (B, T)) \
        if mask is not None else jnp.zeros((B, T), jnp.float32)
    out = _decode_attn(li, q.reshape(B, Hq, D), cache.k, cache.v,
                       cache.ks, cache.vs, m2, hkv=hkv, scale=float(scale),
                       interpret=interpret)
    return out.reshape(B, 1, Hq, D)


def decode_attention_cells(cache, li, q, mask, *, scale=None,
                           interpret: bool | None = None):
    """Read-only celled decode attention over the SHARED flat arena (cache
    batch must be 1): q (NB, 1, Hq, D) rows of distinct sequences whose
    fresh K/V are ALREADY scattered into the arena (update_kv_cells);
    mask (NB, n_ctx) per-cell visibility. Returns (NB, 1, Hq, D) f32.
    The two-step serving path: XLA scatter + this kernel — vs the
    in-scan XLA attention it replaces (152.8 ms/step measured r04)."""
    NB, Tq, Hq, D = q.shape
    assert Tq == 1, "decode kernel is single-token only"
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    scale = scale if scale is not None else 1.0 / math.sqrt(D)
    T = cache.k.shape[2]
    hkv = cache.heads if cache.flat else cache.k.shape[3]
    m2 = jnp.asarray(mask, jnp.float32).reshape(NB, T)
    out = _decode_attn(li, q.reshape(NB, Hq, D), cache.k, cache.v,
                       cache.ks, cache.vs, m2, hkv=hkv, scale=float(scale),
                       interpret=interpret, cells=True)
    return out.reshape(NB, 1, Hq, D)


# ---- fused KV-update + decode attention (single dispatch per layer) ----
#
# Replaces update_kv (XLA dynamic-update-slice on the carried arena) +
# decode_attention_stacked with ONE kernel: the arena is passed through via
# input_output_aliasing (explicit in-place contract — no XLA aliasing
# heuristics on the scan carry), the new token's K/V row is written back
# through a one-row output window, and its attention contribution is added
# analytically from registers, so the arena itself is read once at its
# stored width and only 2 rows (+ scales) are ever written.
# The reference's decode path writes KV via ggml_cpy into cache views and
# runs fattn-vec kernels over the cache (gpt-2 main-backend.cpp:529-535,
# src/ggml-cuda/fattn.cu:500-514); this fuses both into one dispatch.


def _kernel_upd(scale, g_rep, hkv, d, nb, quantized, cells, *refs):
    if quantized:
        (s_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, kn_ref, vn_ref,
         kns_ref, vns_ref, m_ref,
         o_ref, ko_ref, vo_ref, kso_ref, vso_ref, acc, m_s, l_s) = refs
    else:
        (s_ref, q_ref, k_ref, v_ref, kn_ref, vn_ref, m_ref,
         o_ref, ko_ref, vo_ref, acc, m_s, l_s) = refs
    kk = pl.program_id(1)
    # excluded (stale) arena row: shared n_past, or this query row's cell
    n_past = s_ref[1 + pl.program_id(0)] if cells else s_ref[1]

    @pl.when(kk == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_s[:] = jnp.full_like(m_s, NEG)
        l_s[:] = jnp.zeros_like(l_s)
        # one-row arena write-back (the out windows are constant across kk).
        # The arenas are viewed rank-5 (L, B, T, 1, HD) so this window's
        # last-two block dims (1, HD) EQUAL the array dims — Mosaic rejects
        # a (…, 1, HD) window over a rank-4 (L, B, T, HD) arena because the
        # second-to-last block dim (1) is neither ÷8 nor the full T.
        ko_ref[0, 0, 0] = kn_ref[0]
        vo_ref[0, 0, 0] = vn_ref[0]
        if quantized:
            kso_ref[0, 0, 0] = kns_ref[0]
            vso_ref[0, 0, 0] = vns_ref[0]

    bkl = k_ref.shape[2]
    mask = m_ref[0].astype(jnp.float32)                     # (1, BK)
    # hard-exclude the n_past row from the arena pass: its stored contents
    # are stale (this kernel carries the fresh row in kn/vn registers)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, bkl), 1) + kk * bkl
    mask = jnp.where(row == n_past, NEG, mask)
    if quantized:
        ed = jax.lax.broadcasted_iota(jnp.int32, (nb, d), 1) // 32
        ej = jax.lax.broadcasted_iota(jnp.int32, (nb, d), 0)
        expand = (ed == ej).astype(jnp.float32)
    last = kk == pl.num_programs(1) - 1

    for h in range(hkv):
        if quantized:
            ksb = ks_ref[0, 0, :, 0, h * nb:(h + 1) * nb]   # (BK, nb) f32
            vsb = vs_ref[0, 0, :, 0, h * nb:(h + 1) * nb]
            kb = (k_ref[0, 0, :, 0, h * d:(h + 1) * d].astype(jnp.float32)
                  * jnp.dot(ksb, expand)).astype(jnp.bfloat16)
            vb = (v_ref[0, 0, :, 0, h * d:(h + 1) * d].astype(jnp.float32)
                  * jnp.dot(vsb, expand)).astype(jnp.bfloat16)
            knh = (kn_ref[0, :, h * d:(h + 1) * d].astype(jnp.float32)
                   * jnp.dot(kns_ref[0, :, h * nb:(h + 1) * nb], expand)
                   ).astype(jnp.bfloat16)                   # (1, D)
            vnh = (vn_ref[0, :, h * d:(h + 1) * d].astype(jnp.float32)
                   * jnp.dot(vns_ref[0, :, h * nb:(h + 1) * nb], expand)
                   ).astype(jnp.bfloat16)
        else:
            kb = k_ref[0, 0, :, 0, h * d:(h + 1) * d]       # (BK, D) bf16
            vb = v_ref[0, 0, :, 0, h * d:(h + 1) * d]
            knh = kn_ref[0, :, h * d:(h + 1) * d].astype(jnp.bfloat16)
            vnh = vn_ref[0, :, h * d:(h + 1) * d].astype(jnp.bfloat16)
        qh = q_ref[0, h * g_rep:(h + 1) * g_rep, :].astype(jnp.bfloat16)
        s = jax.lax.dot_general(qh, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.maximum(s + mask, NEG)                      # (G, BK)

        r = slice(h * g_rep, (h + 1) * g_rep)
        m_prev = m_s[r, :1]                                 # (G, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_s[r, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(p.astype(jnp.bfloat16), vb,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_new = acc[r, :] * alpha + pv

        def with_new(m_new=m_new, l_new=l_new, acc_new=acc_new, qh=qh,
                     knh=knh, vnh=vnh, r=r):
            # fold in the fresh token's contribution (always visible)
            s_n = jax.lax.dot_general(qh, knh, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32
                                      ) * scale              # (G, 1)
            m2 = jnp.maximum(m_new, s_n)
            a2 = jnp.exp(m_new - m2)
            p_n = jnp.exp(s_n - m2)
            acc2 = acc_new * a2 + p_n * vnh.astype(jnp.float32)
            l2 = l_new * a2 + p_n
            m_s[r, :1] = m2
            l_s[r, :1] = l2
            acc[r, :] = acc2

        def without_new(m_new=m_new, l_new=l_new, acc_new=acc_new, r=r):
            m_s[r, :1] = m_new
            l_s[r, :1] = l_new
            acc[r, :] = acc_new

        # Python-level branch is not possible (last is traced); use when()
        @pl.when(last)
        def _():
            with_new()

        @pl.when(jnp.logical_not(last))
        def _():
            without_new()

    @pl.when(last)
    def _():
        o_ref[0] = acc[:] / jnp.maximum(l_s[:, :1], 1e-30)


@functools.partial(jax.jit,
                   static_argnames=("hkv", "scale", "interpret", "cells"))
def _decode_attn_upd(li, n_past, q, k, v, ks, vs, kn, vn, kns, vns, mask, *,
                     hkv, scale, interpret, cells=False):
    """Fused update+attention over the flat (L, B, T, Hkv*D) arena.
    kn/vn: (B, 1, Hkv*D) new rows (same storage dtype as the arena);
    kns/vns: (B, 1, Hkv*nb) f32 scales for the q8_0 residency (None dense).
    Returns (attn (B, Hq, D) f32, k', v'[, ks', vs']) with the arenas
    aliased in place (only the n_past row is written).

    cells=True: continuous-batching mode — the arena batch dim is 1
    (shared cell pool), q carries NB query rows of DISTINCT sequences,
    and n_past is an (NB,) array of per-row destination cells (pad rows
    point at the reserved trash cell). Visibility comes entirely from
    the per-row mask; each row's own (stale) cell is excluded in-kernel
    and its fresh K/V folded in from registers, so rows of one ubatch
    never read each other's just-written cells (decode-only ubatches
    have at most one row per sequence, and cross-sequence cells are
    masked)."""
    L, B, T, HD = k.shape
    NB = q.shape[0]
    if cells:
        assert B == 1, "cells mode shares one arena across query rows"
    Hkv = hkv
    D = HD // Hkv
    _, Hq, _ = q.shape
    g_rep = Hq // Hkv
    nb = D // 32 if ks is not None else 0
    quantized = ks is not None
    bk = _pick_bk(T, 2 * HD * k.dtype.itemsize
                  + (2 * Hkv * nb * 4 if quantized else 0))

    m2 = jnp.maximum(jnp.asarray(mask, jnp.float32), NEG).reshape(NB, 1, T)

    # Rank-5 (L, B, T, 1, HD) view of the arenas: Mosaic requires the
    # last-two dims of every block window to be (÷8, ÷128) or equal to the
    # array dims — the one-row write-back window (…, 1, HD) only satisfies
    # that against a rank-5 view where the array's own second-to-last dim
    # IS 1. The reshape is a bitcast (no data movement, aliasing preserved).
    k = k.reshape(L, B, T, 1, HD)
    v = v.reshape(L, B, T, 1, HD)
    if quantized:
        ks = ks.reshape(L, B, T, 1, Hkv * nb)
        vs = vs.reshape(L, B, T, 1, Hkv * nb)

    # cells mode reads the single shared arena for every query row
    ab = (lambda b, kk, s: (s[0], 0, kk, 0, 0)) if cells else \
        (lambda b, kk, s: (s[0], b, kk, 0, 0))
    args = [q, k, v]
    in_specs = [
        pl.BlockSpec((1, Hq, D), lambda b, kk, s: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, 1, HD), ab, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, 1, HD), ab, memory_space=pltpu.VMEM),
    ]
    if quantized:
        args += [ks, vs]
        in_specs += [
            pl.BlockSpec((1, 1, bk, 1, Hkv * nb), ab,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, 1, Hkv * nb), ab,
                         memory_space=pltpu.VMEM),
        ]
    args += [kn, vn]
    in_specs += [
        pl.BlockSpec((1, 1, HD), lambda b, kk, s: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, HD), lambda b, kk, s: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if quantized:
        args += [kns, vns]
        in_specs += [
            pl.BlockSpec((1, 1, Hkv * nb), lambda b, kk, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv * nb), lambda b, kk, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    args.append(m2)
    in_specs.append(pl.BlockSpec((1, 1, bk), lambda b, kk, s: (b, 0, kk),
                                 memory_space=pltpu.VMEM))

    # outputs: attn + aliased arenas written through ONE-ROW windows at
    # (li, b, n_past, :) — constant across kk, flushed once per b
    # (cells mode: (li, 0, s[1+b], :) — per-row destination cell)
    rowmap = (lambda b, kk, s: (s[0], 0, s[1 + b], 0, 0)) if cells else \
        (lambda b, kk, s: (s[0], b, s[1], 0, 0))
    row_spec = pl.BlockSpec((1, 1, 1, 1, HD), rowmap,
                            memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((1, Hq, D), lambda b, kk, s: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        row_spec, row_spec,
    ]
    out_shape = [
        jax.ShapeDtypeStruct((NB, Hq, D), jnp.float32),
        jax.ShapeDtypeStruct(k.shape, k.dtype),
        jax.ShapeDtypeStruct(v.shape, v.dtype),
    ]
    # aliased inputs: q is arg 1 in pallas_call (after the prefetch scalar);
    # input_output_aliases indices COUNT the scalar-prefetch operand 0
    aliases = {2: 1, 3: 2}
    if quantized:
        srow_spec = pl.BlockSpec((1, 1, 1, 1, Hkv * nb), rowmap,
                                 memory_space=pltpu.VMEM)
        out_specs += [srow_spec, srow_spec]
        out_shape += [jax.ShapeDtypeStruct(ks.shape, ks.dtype),
                      jax.ShapeDtypeStruct(vs.shape, vs.dtype)]
        aliases.update({4: 3, 5: 4})

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NB, T // bk),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((Hq, D), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
        ],
    )
    kv_bytes = 2 * T * HD * (1 if quantized else 2) \
        + (2 * T * Hkv * nb * 4 if quantized else 0)
    sp = jnp.concatenate([jnp.asarray(li, jnp.int32).reshape(1),
                          jnp.asarray(n_past, jnp.int32).reshape(-1)])
    outs = pl.pallas_call(
        functools.partial(_kernel_upd, scale, g_rep, Hkv, D, nb, quantized,
                          cells),
        grid_spec=gs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=4 * NB * Hq * T * D,
            bytes_accessed=NB * (kv_bytes + Hq * D * 8 + T * 4),
            transcendentals=NB * Hq * T),
        interpret=interpret,
    )(sp, *args)
    # collapse the rank-5 view back to the flat (L, B, T, HD) arena layout
    outs = list(outs)
    outs[1] = outs[1].reshape(L, B, T, HD)
    outs[2] = outs[2].reshape(L, B, T, HD)
    if quantized:
        outs[3] = outs[3].reshape(L, B, T, Hkv * nb)
        outs[4] = outs[4].reshape(L, B, T, Hkv * nb)
    return tuple(outs)


def decode_attention_update_stacked(cache, li, q, k_new, v_new, n_past,
                                    mask, *, scale=None,
                                    interpret: bool | None = None):
    """Fused single-token KV write + attention over the stacked flat arena.
    q/k_new/v_new: (B, 1, Hkv_or_Hq, D); mask: additive, broadcastable to
    (B, 1, 1, n_ctx), already INCLUDING visibility of position n_past.
    Returns (attn (B, 1, Hq, D) f32, updated KVCache) — the arena buffers
    are aliased in place (pass a cache you own, e.g. a donated scan carry)."""
    from ..models.common import KVCache, _q8_rows
    assert cache.flat, "fused update kernel requires the flat arena layout"
    B, Tq, Hq, D = q.shape
    assert Tq == 1, "decode kernel is single-token only"
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    scale = scale if scale is not None else 1.0 / math.sqrt(D)
    T = cache.k.shape[2]
    hkv = cache.heads
    m2 = jnp.broadcast_to(mask.reshape(B, -1)[:, -T:], (B, T)) \
        if mask is not None else jnp.zeros((B, T), jnp.float32)
    if cache.quantized:
        k8, kd = _q8_rows(k_new)                  # (B,1,H,D) int8 / (B,1,H,nb)
        v8, vd = _q8_rows(v_new)
        kn = k8.reshape(B, 1, -1)
        vn = v8.reshape(B, 1, -1)
        kns = kd.reshape(B, 1, -1).astype(jnp.float32)
        vns = vd.reshape(B, 1, -1).astype(jnp.float32)
        attn, k2, v2, ks2, vs2 = _decode_attn_upd(
            li, n_past, q.reshape(B, Hq, D), cache.k, cache.v, cache.ks,
            cache.vs, kn, vn, kns, vns, m2, hkv=hkv, scale=float(scale),
            interpret=interpret)
        return (attn.reshape(B, 1, Hq, D),
                KVCache(k2, v2, ks2, vs2, heads=cache.heads))
    kn = k_new.reshape(B, 1, -1).astype(cache.k.dtype)
    vn = v_new.reshape(B, 1, -1).astype(cache.v.dtype)
    attn, k2, v2 = _decode_attn_upd(
        li, n_past, q.reshape(B, Hq, D), cache.k, cache.v, None, None,
        kn, vn, None, None, m2, hkv=hkv, scale=float(scale),
        interpret=interpret)
    return attn.reshape(B, 1, Hq, D), KVCache(k2, v2, heads=cache.heads)


def decode_attention_update_cells(cache, li, q, k_new, v_new, rows, mask, *,
                                  scale=None, interpret: bool | None = None):
    """Continuous-batching fused KV-write + attention over the SHARED flat
    arena (cache batch must be 1): q/k_new/v_new carry NB query rows of
    distinct sequences, rows (NB,) their destination cells (pad rows ->
    the reserved trash cell), mask (NB, n_ctx) the per-cell additive mask
    (models.common.cells_attention_mask). Decode-only ubatches ONLY: rows
    of one ubatch must belong to distinct sequences (each row sees its own
    fresh K/V from registers and other rows' cells only through the seq
    mask, never through the arena). The TPU analog of paged decode
    attention over llama.cpp-style KV cells (main-batched.cpp:889-931).
    Returns (attn (NB, Hq, D) f32, updated KVCache)."""
    from ..models.common import KVCache, _q8_rows
    assert cache.flat, "cells kernel requires the flat arena layout"
    NB, Hq, D = q.shape[0], q.shape[-2], q.shape[-1]
    q = q.reshape(NB, Hq, D)
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    scale = scale if scale is not None else 1.0 / math.sqrt(D)
    T = cache.k.shape[2]
    m2 = jnp.asarray(mask, jnp.float32).reshape(NB, T)
    rows = jnp.asarray(rows, jnp.int32).reshape(NB)
    if cache.quantized:
        k8, kd = _q8_rows(k_new)
        v8, vd = _q8_rows(v_new)
        kn = k8.reshape(NB, 1, -1)
        vn = v8.reshape(NB, 1, -1)
        kns = kd.reshape(NB, 1, -1).astype(jnp.float32)
        vns = vd.reshape(NB, 1, -1).astype(jnp.float32)
        attn, k2, v2, ks2, vs2 = _decode_attn_upd(
            li, rows, q, cache.k, cache.v, cache.ks, cache.vs,
            kn, vn, kns, vns, m2, hkv=cache.heads, scale=float(scale),
            interpret=interpret, cells=True)
        return attn, KVCache(k2, v2, ks2, vs2, heads=cache.heads)
    kn = k_new.reshape(NB, 1, -1).astype(cache.k.dtype)
    vn = v_new.reshape(NB, 1, -1).astype(cache.v.dtype)
    attn, k2, v2 = _decode_attn_upd(
        li, rows, q, cache.k, cache.v, None, None, kn, vn, None, None, m2,
        hkv=cache.heads, scale=float(scale), interpret=interpret, cells=True)
    return attn, KVCache(k2, v2, heads=cache.heads)


def select_decode_path(*, T, B, D, cells, cache, cells_kernel=False,
                       mask=None):
    """THE one copy of the stacked-decode attention dispatch gate (the
    models' scan bodies and the TP forwards all route through it):

      "cells"  - fused cells kernel (decode-only celled ubatch, shared flat
                 arena, per-row writes)
      "cells2" - XLA scatter + read-only cells attention kernel (decode-only
                 celled ubatch; the serving default)
      "fused"  - fused KV-write + attention kernel (single-stream decode,
                 flat arena aliased in place)
      "kernel" - XLA dynamic-update-slice + read-only attention kernel
      "xla"    - XLA update (contiguous or celled) + XLA attention

    Gates: single-token (or celled single-row) queries only, 128-lane head
    alignment, real TPU (or the force_fused test hook), and the
    GGML_FUSED_KV_UPDATE env toggle.

    Default is "kernel" (two-step): the r04 on-chip 4-way ablation
    (tools/diag_stacked_combo.py, 28 layers / 512 ctx) measured the fused
    update kernel at 71.3 ms/step with a 615 s compile vs 6.51 ms for the
    two-step path — the rank-5 one-row-window aliasing makes XLA copy the
    carried arena every layer. The fused kernels stay available behind
    GGML_FUSED_KV_UPDATE=1 for re-measurement after a fix."""
    import os
    from .qmatmul import _force_fused
    on_tpu = jax.devices()[0].platform == "tpu"
    fused_env = os.environ.get("GGML_FUSED_KV_UPDATE", "0") == "1"
    hw = (D % 128 == 0) and (on_tpu or _force_fused)
    if (cells_kernel and cells is not None and B == 1 and cache.flat
            and mask is not None and hw):
        return "cells" if fused_env else "cells2"
    use_kernel = T == 1 and cells is None and hw
    if use_kernel and cache.flat and fused_env:
        return "fused"
    if use_kernel:
        return "kernel"
    return "xla"
