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

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -0.7 * float(np.finfo(np.float32).max)


def _pick_bk(t: int) -> int:
    for cand in (512, 256, 128):
        if t % cand == 0:
            return min(cand, t)
    return t


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


@functools.partial(jax.jit, static_argnames=("hkv", "scale", "interpret"))
def _decode_attn(li, q, k, v, ks, vs, mask, *, hkv, scale, interpret):
    """k/v: (L, B, T, Hkv*D) flat arena (rank-5 (L, B, T, Hkv, D) accepted
    but costs a full-arena relayout copy on TPU — always pass flat caches
    on the hot path; see models.common.KVCache)."""
    if k.ndim == 5:
        L, B, T = k.shape[:3]
        k = k.reshape(L, B, T, -1)
        v = v.reshape(L, B, T, -1)
        if ks is not None:
            ks = ks.reshape(L, B, T, -1)
            vs = vs.reshape(L, B, T, -1)
    L, B, T, HD = k.shape
    Hkv = hkv
    D = HD // Hkv
    _, Hq, _ = q.shape
    g_rep = Hq // Hkv
    bk = _pick_bk(T)
    nb = D // 32 if ks is not None else 0
    quantized = ks is not None

    k2, v2 = k, v
    m2 = jnp.maximum(jnp.asarray(mask, jnp.float32), NEG).reshape(B, 1, T)

    args = [q, k2, v2]
    in_specs = [
        pl.BlockSpec((1, Hq, D), lambda b, kk, s: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, Hkv * D), lambda b, kk, s: (s[0], b, kk, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, Hkv * D), lambda b, kk, s: (s[0], b, kk, 0),
                     memory_space=pltpu.VMEM),
    ]
    if quantized:
        args += [ks, vs]
        in_specs += [
            pl.BlockSpec((1, 1, bk, Hkv * nb),
                         lambda b, kk, s: (s[0], b, kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, Hkv * nb),
                         lambda b, kk, s: (s[0], b, kk, 0),
                         memory_space=pltpu.VMEM),
        ]
    args.append(m2)
    in_specs.append(pl.BlockSpec((1, 1, bk), lambda b, kk, s: (b, 0, kk),
                                 memory_space=pltpu.VMEM))

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, T // bk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Hq, D), lambda b, kk, s: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Hq, D), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
        ],
    )
    kv_bytes = 2 * T * Hkv * D * (1 if quantized else 2) \
        + (2 * T * Hkv * nb * 4 if quantized else 0)
    out = pl.pallas_call(
        functools.partial(_kernel, scale, g_rep, Hkv, D, nb, quantized),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * T * D,
            bytes_accessed=B * (kv_bytes + Hq * D * 8 + T * 4),
            transcendentals=B * Hq * T),
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
