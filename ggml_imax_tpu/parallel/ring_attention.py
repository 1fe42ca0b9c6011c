"""Ring attention — sequence-parallel attention over a sharded KV cache.

The reference has NO long-context strategy (SURVEY §5): context is bounded
by one device's preallocated KV (n_ctx). This module is the TPU-native
extension: shard the KV sequence axis across the "sp" mesh axis and rotate
KV shards around the ICI ring (`ppermute`) while each device accumulates
its queries' attention online — exact attention over a context N_devices
times larger than one chip's KV memory, with communication overlapped
against compute by XLA's latency-hiding scheduler.

Merging uses the log-sum-exp decomposition of softmax: for each KV chunk i
compute (o_i, lse_i); then o = Σ_i o_i · exp(lse_i - lse) with
lse = logaddexp_i(lse_i) — the same online-softmax algebra as flash
attention, applied across ring steps.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

NEG = -0.7 * float(np.finfo(np.float32).max)


def _chunk_attention(q, k, v, mask, scale):
    """Unnormalized attention over one KV chunk: returns (o, lse) with
    o = softmax-numerator @ v / exp(lse), lse per (B, H, Tq)."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    if mask is not None:
        s = s + mask
    s = jnp.maximum(s, NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhqk,bkhd->bqhd", p / jnp.maximum(l, 1e-30),
                   v.astype(jnp.float32))
    lse = (m + jnp.log(jnp.maximum(l, 1e-30)))[..., 0]      # (B, H, Tq)
    return o, lse


def ring_attention_local(q, k, v, qpos, kpos, *, axis: str, n_dev: int,
                         scale: float | None = None, causal: bool = False):
    """The ring body, callable INSIDE an existing shard_map (e.g. the
    tp×sp ring-prefill forward, parallel/tp.py): q/k/v are this device's
    LOCAL sequence chunks (B, T_loc, H_loc, D); qpos/kpos (B, T_loc) carry
    the chunks' ABSOLUTE positions so the causal mask stays exact while KV
    shards rotate around the `axis` ring. Returns f32 (B, T_loc, H_loc, D)
    — each device's queries attended over the GLOBAL sequence."""
    b, tq, h, d = q.shape
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def step(carry, _):
        k, v, kpos, acc, lse = carry
        if causal:
            m = jnp.where(kpos[:, None, None, :] <= qpos[:, None, :, None],
                          0.0, -jnp.inf)
        else:
            m = None
        o_i, lse_i = _chunk_attention(q, k, v, m, scale)
        # online merge across ring steps
        new_lse = jnp.logaddexp(lse, lse_i)
        w_old = jnp.exp(lse - new_lse)[..., None].transpose(0, 2, 1, 3)
        w_new = jnp.exp(lse_i - new_lse)[..., None].transpose(0, 2, 1, 3)
        acc = acc * w_old + o_i * w_new
        k = jax.lax.ppermute(k, axis, perm)
        v = jax.lax.ppermute(v, axis, perm)
        kpos = jax.lax.ppermute(kpos, axis, perm)
        return (k, v, kpos, acc, new_lse), None

    acc0 = jnp.zeros((b, tq, h, d), jnp.float32)
    lse0 = jnp.full((b, h, tq), NEG, jnp.float32)
    (k, v, kpos, acc, lse), _ = jax.lax.scan(
        step, (k, v, kpos, acc0, lse0), None, length=n_dev)
    return acc


def ring_attention(q, k, v, mesh: Mesh, *, axis: str = "sp",
                   scale: float | None = None, causal: bool = False,
                   q_positions=None, kv_positions=None):
    """Exact attention with KV sharded on the sequence axis.

    q: (B, Tq, H, D) replicated across `axis`; k/v: (B, Tk_global, H, D)
    sharded on dim 1. With causal=True, q_positions (B, Tq) and
    kv_positions (B, Tk_global) give absolute positions (defaults: arange).
    Returns (B, Tq, H, D) replicated.
    """
    n_dev = mesh.shape[axis]
    b, tq, h, d = q.shape
    tk = k.shape[1]
    if q_positions is None:
        q_positions = jnp.broadcast_to(jnp.arange(tq)[None], (b, tq))
    if kv_positions is None:
        kv_positions = jnp.broadcast_to(jnp.arange(tk)[None], (b, tk))

    def body(q, k, v, qpos, kpos):
        return ring_attention_local(q, k, v, qpos, kpos, axis=axis,
                                    n_dev=n_dev, scale=scale, causal=causal)

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(), P(None, axis), P(None, axis), P(),
                             P(None, axis)),
                   out_specs=P(), check_vma=False)
    return fn(q, k, v, q_positions, kv_positions).astype(q.dtype)
