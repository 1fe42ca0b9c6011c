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
    dense caches have ks = vs = None."""
    k: jax.Array
    v: jax.Array
    ks: Any = None
    vs: Any = None

    def tree_flatten(self):
        return (self.k, self.v, self.ks, self.vs), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def n_ctx(self):
        return self.k.shape[2]

    @property
    def quantized(self):
        return self.ks is not None

    def select_batch(self, idx):
        """Reorder/duplicate batch rows (beam reorder, whisper_pipeline)."""
        return KVCache(self.k[:, idx], self.v[:, idx],
                       None if self.ks is None else self.ks[:, idx],
                       None if self.vs is None else self.vs[:, idx])


jax.tree_util.register_pytree_node(
    KVCache, lambda c: c.tree_flatten(), KVCache.tree_unflatten)


def init_kv_cache(n_layer: int, batch: int, n_ctx: int, n_kv_head: int,
                  head_dim: int, dtype=jnp.bfloat16) -> KVCache:
    shape = (n_layer, batch, n_ctx, n_kv_head, head_dim)
    if isinstance(dtype, str):
        assert dtype == "q8_0", dtype
        sshape = shape[:-1] + (head_dim // _kv_group(head_dim),)
        return KVCache(jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                       jnp.zeros(sshape, jnp.float32),
                       jnp.zeros(sshape, jnp.float32))
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


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
    the dequant into the attention reads."""
    if not cache.quantized:
        return cache.k[layer], cache.v[layer]
    return (_deq8(cache.k[layer], cache.ks[layer], dtype),
            _deq8(cache.v[layer], cache.vs[layer], dtype))


def update_kv(cache: KVCache, layer: int, k_new, v_new, n_past) -> KVCache:
    """Write k_new/v_new (B, T, H, D) at positions [n_past, n_past+T) of the
    given layer. n_past may be a traced scalar."""
    zeros = (0, jnp.asarray(n_past, jnp.int32), 0, 0)
    if cache.quantized:
        k8, kd = _q8_rows(k_new)
        v8, vd = _q8_rows(v_new)
        return KVCache(
            jax.lax.dynamic_update_slice(cache.k, k8[None], (layer,) + zeros),
            jax.lax.dynamic_update_slice(cache.v, v8[None], (layer,) + zeros),
            jax.lax.dynamic_update_slice(cache.ks, kd[None], (layer,) + zeros),
            jax.lax.dynamic_update_slice(cache.vs, vd[None], (layer,) + zeros))
    k = jax.lax.dynamic_update_slice(
        cache.k, k_new.astype(cache.k.dtype)[None], (layer,) + zeros)
    v = jax.lax.dynamic_update_slice(
        cache.v, v_new.astype(cache.v.dtype)[None], (layer,) + zeros)
    return KVCache(k, v)


def update_kv_cells(cache: KVCache, layer: int, k_new, v_new, cells) -> KVCache:
    """Scatter k_new/v_new (B, T, H, D) into arbitrary cache cells
    (B, T) int32 — the TPU analog of the reference's batched KV writes at
    cells[head+i] (gpt-2/main-batched.cpp:889-893). Unlike update_kv the
    destination rows need not be contiguous, enabling continuous batching."""
    b = jnp.arange(k_new.shape[0])[:, None]
    if cache.quantized:
        k8, kd = _q8_rows(k_new)
        v8, vd = _q8_rows(v_new)
        return KVCache(cache.k.at[layer, b, cells].set(k8),
                       cache.v.at[layer, b, cells].set(v8),
                       cache.ks.at[layer, b, cells].set(kd),
                       cache.vs.at[layer, b, cells].set(vd))
    k = cache.k.at[layer, b, cells].set(k_new.astype(cache.k.dtype))
    v = cache.v.at[layer, b, cells].set(v_new.astype(cache.v.dtype))
    return KVCache(k, v)


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
