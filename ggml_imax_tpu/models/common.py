"""Shared model infrastructure: KV cache and parameter containers.

Design: a model is a pure function over a params pytree (QTensor leaves for
quantized weights, jax arrays for the rest). The KV cache is a preallocated,
donated, in-place-updated pytree — the TPU-native analog of ggml's fixed
memory_k/memory_v arenas (gpt-2 loader main-backend.cpp:309-346): same
"allocate once, overwrite forever" contract, but expressed as functional
updates that XLA aliases in place via buffer donation.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp


@dataclass
class KVCache:
    """k, v: (n_layer, B, n_ctx, n_kv_head, head_dim)."""
    k: jax.Array
    v: jax.Array

    def tree_flatten(self):
        return (self.k, self.v), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def n_ctx(self):
        return self.k.shape[2]


jax.tree_util.register_pytree_node(
    KVCache, lambda c: c.tree_flatten(), KVCache.tree_unflatten)


def init_kv_cache(n_layer: int, batch: int, n_ctx: int, n_kv_head: int,
                  head_dim: int, dtype=jnp.bfloat16) -> KVCache:
    shape = (n_layer, batch, n_ctx, n_kv_head, head_dim)
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def update_kv(cache: KVCache, layer: int, k_new, v_new, n_past) -> KVCache:
    """Write k_new/v_new (B, T, H, D) at positions [n_past, n_past+T) of the
    given layer. n_past may be a traced scalar."""
    zeros = (0, jnp.asarray(n_past, jnp.int32), 0, 0)
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
