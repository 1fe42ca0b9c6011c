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
