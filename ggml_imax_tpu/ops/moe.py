"""MoE ops — ggml_mul_mat_id and the routed-FFN layer built on it.

Reference: ggml_mul_mat_id (/root/reference/include/ggml/ggml.h:1184, CPU
kernel ggml.c:12101): `as` is a stack of expert matrices, `ids` holds
n_expert_used expert indices per token, output is per-(token, slot) the
selected expert's matmul. The CPU kernel groups rows by expert
(mmid_row_mapping) and runs one vec_dot pass per expert.

TPU-native: two strategies, both static-shape (XLA requirement):
- `mul_mat_id` (dense-dispatch): compute every expert for every token and
  gather the selected slots. One big batched GEMM on the MXU — optimal for
  decode-sized T where grouping overhead dominates, and the direct analog
  of the reference's "all rows through vec_dot" inner loop.
- `mul_mat_id_grouped` (sort-dispatch): sort tokens by expert with a static
  per-expert capacity, run one GEMM per expert on gathered rows, scatter
  back. Wins when T >> n_expert (prefill) since compute is O(T*U) instead
  of O(T*E). Capacity overflow drops tokens (standard MoE capacity-factor
  semantics; the reference never drops because it is fully dynamic on CPU).

Expert parallelism: shard `as` on its leading axis over the mesh ("ep");
with dense-dispatch each chip computes its local experts for all tokens and
the gather turns into a masked psum — GSPMD inserts the collective.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def mul_mat_id(as_, x, ids, *, precision=None):
    """as_: (E, K, N); x: (T, K); ids: (T, U) int32 -> (T, U, N).
    Dense dispatch: all experts computed, selected slots gathered."""
    t, u = ids.shape
    y = jnp.einsum("tk,ekn->etn", x.astype(jnp.float32),
                   as_.astype(jnp.float32), precision=precision)  # (E, T, N)
    # gather y[ids[t,u], t, :]
    return jnp.take_along_axis(
        y.transpose(1, 0, 2),                       # (T, E, N)
        ids[:, :, None].astype(jnp.int32), axis=1)  # (T, U, N)


def mul_mat_id_grouped(as_, x, ids, *, capacity: int | None = None,
                       precision=None):
    """Sort-dispatch variant: O(T*U) GEMM work with static per-expert
    capacity. Returns (T, U, N); tokens over capacity get zeros."""
    e, k, n = as_.shape
    t, u = ids.shape
    cap = capacity or max(1, (t * u * 2 + e - 1) // e)     # capacity factor 2

    flat_ids = ids.reshape(-1)                             # (T*U,)
    # stable position of each (token,slot) within its expert's queue
    onehot = jax.nn.one_hot(flat_ids, e, dtype=jnp.int32)  # (TU, E)
    pos_in_e = jnp.cumsum(onehot, axis=0) - onehot         # rank within expert
    rank = jnp.sum(pos_in_e * onehot, axis=1)              # (TU,)
    keep = rank < cap
    slot = jnp.where(keep, flat_ids * cap + rank, e * cap) # overflow -> sink

    gathered = jnp.zeros((e * cap + 1, k), x.dtype)
    src = jnp.repeat(x, u, axis=0)                         # (TU, K)
    gathered = gathered.at[slot].set(src)                  # scatter rows
    ge = gathered[:e * cap].reshape(e, cap, k)
    ye = jnp.einsum("eck,ekn->ecn", ge.astype(jnp.float32),
                    as_.astype(jnp.float32), precision=precision)
    ye = jnp.concatenate([ye.reshape(e * cap, n),
                          jnp.zeros((1, n), ye.dtype)], axis=0)
    out = ye[slot]                                         # (TU, N)
    return jnp.where(keep[:, None], out, 0.0).reshape(t, u, n)


def moe_ffn(x, router_w, w_up, w_gate, w_down, *, n_used: int,
            activation=jax.nn.silu, precision=None):
    """Mixtral-style routed FFN (the graph llama.cpp builds from
    mul_mat_id): top-k routing with softmax-renormalized weights.
    x: (T, E,) embed; router_w: (E_embd, n_expert); w_up/w_gate:
    (n_expert, E_embd, F); w_down: (n_expert, F, E_embd)."""
    logits = x.astype(jnp.float32) @ router_w.astype(jnp.float32)  # (T, E)
    top_w, top_ids = jax.lax.top_k(logits, n_used)
    top_w = jax.nn.softmax(top_w, axis=-1)                 # renormalize top-k

    up = mul_mat_id(w_up, x, top_ids, precision=precision)      # (T, U, F)
    gate = mul_mat_id(w_gate, x, top_ids, precision=precision)
    h = activation(gate) * up
    down = _mul_mat_id_h(w_down, h, top_ids, precision)
    return jnp.sum(down * top_w[:, :, None], axis=1)       # (T, E_embd)


def _mul_mat_id_h(as_, h, ids, precision):
    """mul_mat_id where the activation differs per slot: h (T, U, K) ->
    (T, U, N), slot u through expert ids[t, u]."""
    y = jnp.einsum("tuk,ekn->etun", h.astype(jnp.float32),
                   as_.astype(jnp.float32), precision=precision)
    sel = jax.nn.one_hot(ids, as_.shape[0], dtype=jnp.float32)  # (T, U, E)
    return jnp.einsum("etun,tue->tun", y, sel)
