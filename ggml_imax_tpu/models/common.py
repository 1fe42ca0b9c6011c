"""Shared model infrastructure: KV cache and parameter containers.

Design: a model is a pure function over a params pytree (QTensor leaves for
quantized weights, jax arrays for the rest). The KV cache is a preallocated,
donated, in-place-updated pytree — the TPU-native analog of ggml's fixed
memory_k/memory_v arenas (gpt-2 loader main-backend.cpp:309-346): same
"allocate once, overwrite forever" contract, but expressed as functional
updates that XLA aliases in place via buffer donation.

The cache supports two residencies:
- dense (bf16/f32): k/v hold values directly;
- q8_0 (`init_kv_cache(..., dtype="q8_0")`): k/v are int8 with per-32
  (along head_dim) f32 scales in ks/vs — quantize_row_q8_0 value semantics
  (/root/reference/src/ggml-quants.c:440). 1.125 B/element instead of 2,
  the INT8 KV arena SURVEY §7 prescribes; rows are quantized at write time
  and expanded at read time (read_kv), so models stay agnostic.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

KV_GROUP = 32            # preferred q8_0 block length along head_dim


def _kv_group(head_dim: int) -> int:
    """Largest block length <= 32 dividing head_dim (tiny test models have
    head_dim 16/8; real models are multiples of 32)."""
    g = min(KV_GROUP, head_dim)
    while head_dim % g:
        g //= 2
    return g


@dataclass
class KVCache:
    """k, v: (n_layer, B, n_ctx, n_kv_head, head_dim). For the q8_0
    residency k/v are int8 and ks/vs hold (..., head_dim // 32) f32 scales;
    dense caches have ks = vs = None.

    Flat layout (heads != None): k/v are (n_layer, B, n_ctx, H * D) with the
    head count kept as static metadata. This is the layout the stacked
    decode path requires: on TPU a (..., H, D) -> (..., H*D) reshape changes
    the physical (8, 128) tiling of the last two dims, so XLA materializes a
    full relayout copy of the multi-hundred-MB arena — measured 16.7 ms/step
    at GPT-J-6B geometry when it happened inside the scan-over-layers body.
    Storing the arena flat makes the decode-attention kernel's view the
    storage; per-head structure is recovered logically (read_kv) at a
    per-layer cost that only prefill pays."""
    k: jax.Array
    v: jax.Array
    ks: Any = None
    vs: Any = None
    heads: Any = None     # static: n_kv_head when flat, else None

    def tree_flatten(self):
        return (self.k, self.v, self.ks, self.vs), self.heads

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, heads=aux)

    @property
    def n_ctx(self):
        return self.k.shape[2]

    @property
    def quantized(self):
        return self.ks is not None

    @property
    def flat(self):
        return self.heads is not None

    @property
    def head_dim(self):
        return self.k.shape[-1] // self.heads if self.flat \
            else self.k.shape[-1]

    def select_batch(self, idx):
        """Reorder/duplicate batch rows (beam reorder, whisper_pipeline)."""
        return KVCache(self.k[:, idx], self.v[:, idx],
                       None if self.ks is None else self.ks[:, idx],
                       None if self.vs is None else self.vs[:, idx],
                       heads=self.heads)


jax.tree_util.register_pytree_node(
    KVCache, lambda c: c.tree_flatten(), KVCache.tree_unflatten)


def init_kv_cache(n_layer: int, batch: int, n_ctx: int, n_kv_head: int,
                  head_dim: int, dtype=jnp.bfloat16,
                  flat: bool = False) -> KVCache:
    heads = n_kv_head if flat else None
    shape = (n_layer, batch, n_ctx, n_kv_head * head_dim) if flat \
        else (n_layer, batch, n_ctx, n_kv_head, head_dim)
    if isinstance(dtype, str):
        assert dtype == "q8_0", dtype
        nsc = n_kv_head * (head_dim // _kv_group(head_dim)) if flat \
            else head_dim // _kv_group(head_dim)
        sshape = shape[:-1] + (nsc,)
        return KVCache(jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                       jnp.zeros(sshape, jnp.float32),
                       jnp.zeros(sshape, jnp.float32), heads=heads)
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                   heads=heads)


def _q8_rows(x):
    """(..., D) f32/bf16 -> (int8 (..., D), f32 scales (..., D//g));
    quantize_row_q8_0 value semantics."""
    xr = x.astype(jnp.float32).reshape(*x.shape[:-1], -1,
                                       _kv_group(x.shape[-1]))
    amax = jnp.max(jnp.abs(xr), axis=-1)
    d = amax / 127.0
    inv = jnp.where(d > 0, 1.0 / jnp.where(d > 0, d, 1.0), 0.0)
    q = jnp.round(xr * inv[..., None]).astype(jnp.int8)
    return q.reshape(x.shape), d


def _deq8(q, s, dtype):
    """int8 (..., D) + f32 (..., D//g) -> dense (..., D) dtype."""
    qr = q.reshape(*q.shape[:-1], -1,
                   q.shape[-1] // s.shape[-1]).astype(dtype)
    return (qr * s[..., None].astype(dtype)).reshape(q.shape)


def read_kv(cache: KVCache, layer: int, dtype=jnp.bfloat16):
    """-> (k, v) dense (B, n_ctx, H, D) for attention. Dense caches return
    their arrays as-is (no copy); q8_0 caches expand in XLA, which fuses
    the dequant into the attention reads. Flat caches unflatten per layer
    (a relayout copy on TPU — decode avoids it via the fused kernel in
    ops/decode_attention.py; prefill amortizes it over T)."""
    if not cache.quantized:
        k, v = cache.k[layer], cache.v[layer]
    else:
        # flat q8 grouping equals per-head grouping (D % group == 0), so
        # dequantizing before or after unflattening is identical
        k = _deq8(cache.k[layer], cache.ks[layer], dtype)
        v = _deq8(cache.v[layer], cache.vs[layer], dtype)
    if cache.flat:
        b, t, hd = k.shape
        h = cache.heads
        k = k.reshape(b, t, h, hd // h)
        v = v.reshape(b, t, h, hd // h)
    return k, v


def _flatten_new(cache: KVCache, x):
    """(B, T, H, D) or (B, T, H, D//g) -> (B, T, H*last) when flat."""
    if not cache.flat:
        return x
    b, t = x.shape[:2]
    return x.reshape(b, t, -1)


def update_kv(cache: KVCache, layer: int, k_new, v_new, n_past) -> KVCache:
    """Write k_new/v_new (B, T, H, D) at positions [n_past, n_past+T) of the
    given layer. n_past may be a traced scalar."""
    zeros = (0, jnp.asarray(n_past, jnp.int32), 0, 0)[:cache.k.ndim - 1]
    if cache.quantized:
        k8, kd = _q8_rows(k_new)
        v8, vd = _q8_rows(v_new)
        k8, kd = _flatten_new(cache, k8), _flatten_new(cache, kd)
        v8, vd = _flatten_new(cache, v8), _flatten_new(cache, vd)
        return KVCache(
            jax.lax.dynamic_update_slice(cache.k, k8[None], (layer,) + zeros),
            jax.lax.dynamic_update_slice(cache.v, v8[None], (layer,) + zeros),
            jax.lax.dynamic_update_slice(cache.ks, kd[None], (layer,) + zeros),
            jax.lax.dynamic_update_slice(cache.vs, vd[None], (layer,) + zeros),
            heads=cache.heads)
    k8 = _flatten_new(cache, k_new).astype(cache.k.dtype)
    v8 = _flatten_new(cache, v_new).astype(cache.v.dtype)
    k = jax.lax.dynamic_update_slice(cache.k, k8[None], (layer,) + zeros)
    v = jax.lax.dynamic_update_slice(cache.v, v8[None], (layer,) + zeros)
    return KVCache(k, v, heads=cache.heads)


def update_kv_cells(cache: KVCache, layer: int, k_new, v_new, cells) -> KVCache:
    """Scatter k_new/v_new (B, T, H, D) into arbitrary cache cells
    (B, T) int32 — the TPU analog of the reference's batched KV writes at
    cells[head+i] (gpt-2/main-batched.cpp:889-893). Unlike update_kv the
    destination rows need not be contiguous, enabling continuous batching."""
    b = jnp.arange(k_new.shape[0])[:, None]
    if cache.quantized:
        k8, kd = _q8_rows(k_new)
        v8, vd = _q8_rows(v_new)
        k8, kd = _flatten_new(cache, k8), _flatten_new(cache, kd)
        v8, vd = _flatten_new(cache, v8), _flatten_new(cache, vd)
        return KVCache(cache.k.at[layer, b, cells].set(k8),
                       cache.v.at[layer, b, cells].set(v8),
                       cache.ks.at[layer, b, cells].set(kd),
                       cache.vs.at[layer, b, cells].set(vd),
                       heads=cache.heads)
    k8 = _flatten_new(cache, k_new).astype(cache.k.dtype)
    v8 = _flatten_new(cache, v_new).astype(cache.v.dtype)
    k = cache.k.at[layer, b, cells].set(k8)
    v = cache.v.at[layer, b, cells].set(v8)
    return KVCache(k, v, heads=cache.heads)


def cells_attention_mask(tok_pos, tok_seq, cell_pos, cell_seq_mask):
    """Per-(token, cell) additive mask for celled KV (main-batched.cpp:931):
    visible iff the cell belongs to the token's sequence AND cell.pos <=
    token.pos. tok_pos/tok_seq: (B, T); cell_pos: (B, n_ctx) int32 (-1 =
    empty); cell_seq_mask: (B, n_ctx) uint32 bitmask over seq ids.
    Returns (B, 1, T, n_ctx) f32."""
    same_seq = (cell_seq_mask[:, None, :] >> tok_seq[:, :, None].astype(jnp.uint32)) & 1
    visible = (same_seq == 1) & (cell_pos[:, None, :] >= 0) \
        & (cell_pos[:, None, :] <= tok_pos[:, :, None])
    return jnp.where(visible, 0.0, -jnp.inf).astype(jnp.float32)[:, None]


def attention_mask(positions, n_ctx: int, n_past):
    """(B, T) query positions -> (B, 1, T, n_ctx) additive causal mask over
    the cache: visible iff k_pos <= q_pos AND k_pos < n_past + T."""
    b, t = positions.shape
    k_pos = jnp.arange(n_ctx)[None, None, :]                # (1, 1, n_ctx)
    q_pos = positions[:, :, None]                           # (B, T, 1)
    visible = k_pos <= q_pos
    written = k_pos < (jnp.asarray(n_past, jnp.int32) + t)
    mask = jnp.where(visible & written, 0.0, -jnp.inf).astype(jnp.float32)
    return mask[:, None, :, :]                              # (B, 1, T, n_ctx)


def scan_layers(body, carry, lis, small, unroll: int | None = None):
    """lax.scan over transformer layers with a measured unroll.

    Running 2 layers per scan iteration halves the scan's per-iteration
    dispatch bookkeeping — measured on the v5e chip at GPT-J-6B decode:
    28x1 = 5.67 ms/step, 14x2 = 5.54 ms/step (+4.8 tok/s), 7x4 = 5.61
    (executable growth starts losing). Default unroll=2 whenever the layer
    count divides; GGML_SCAN_UNROLL overrides for A/B sweeps. The analog
    of the reference evaluating its per-layer graph in one prebuilt loop
    (gpt-j/main.cpp:421-589) — here the loop is the compiled artifact."""
    import os
    if unroll is None:
        unroll = int(os.environ.get("GGML_SCAN_UNROLL", "2"))
    n = int(lis.shape[0])
    if unroll > 1 and n % unroll == 0 and n > unroll:
        u = unroll

        def body_u(c, xs):
            lis_u, sm_u = xs
            for j in range(u):
                smj = jax.tree.map(lambda a: a[j], sm_u)
                c, _ = body(c, (lis_u[j], smj))
            return c, None

        small_u = jax.tree.map(lambda a: a.reshape(-1, u, *a.shape[1:]),
                               small)
        return jax.lax.scan(body_u, carry, (lis.reshape(-1, u), small_u))
    return jax.lax.scan(body, carry, (lis, small))
