"""Mamba selective-state-space ops.

Reference semantics: ggml_ssm_conv (/root/reference/src/ggml.c:16311) and
ggml_ssm_scan (ggml.c:16437; API ggml.h:1779-1794). The reference runs a
sequential per-token loop on CPU threads; the TPU-native design expresses the
same linear recurrence h_t = dA_t * h_{t-1} + dBx_t as a parallel
`lax.associative_scan` (Blelloch scan) over the token axis, which XLA
vectorizes across (d_inner, d_state) lanes — O(log T) depth instead of O(T).

Layouts are numpy-order (reference's ne reversed):
  ssm_conv:  state (d_inner, d_conv-1), x (T, d_inner), c (d_inner, d_conv)
  ssm_scan:  state (d_inner, d_state),  x/dt (T, d_inner),
             A (d_inner, d_state), B/C (T, d_state)
Both return (y, new_state) — the reference packs these into one dst blob;
functional outputs are the JAX idiom (the caller donates the state buffer).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _softplus20(dt):
    # selective_state_update.py:L78 semantics mirrored by ggml.c:16515
    return jnp.where(dt <= 20.0, jnp.log1p(jnp.exp(dt)), dt)


def ssm_conv(state, x, c):
    """Causal depthwise conv over time with carried state (ggml.c:16311).
    state: (d_inner, d_conv-1) last columns of previous window,
    x: (T, d_inner), c: (d_inner, d_conv).
    Returns y (T, d_inner), new_state (d_inner, d_conv-1)."""
    d_inner, d_conv = c.shape
    t = x.shape[0]
    seq = jnp.concatenate([state.T.astype(jnp.float32),
                           x.astype(jnp.float32)], axis=0)  # (dc-1+T, d_inner)
    # windows[j] = seq[j : j+T] — d_conv is tiny (4), unrolled shifts beat
    # a gather and fuse into one multiply-add chain
    y = jnp.zeros((t, d_inner), jnp.float32)
    for j in range(d_conv):
        y = y + seq[j:j + t] * c.astype(jnp.float32)[:, j][None, :]
    new_state = seq[t:].T if d_conv > 1 else state
    return y, new_state


def ssm_scan(state, x, dt, a, b, c):
    """Selective scan (ggml.c:16437): per token t and channel i,
      dtsp = softplus(dt[t,i]);  h = h * exp(dtsp*A[i]) + B[t]*(x[t,i]*dtsp)
      y[t,i] = h . C[t]
    state: (d_inner, d_state). Returns y (T, d_inner), final state."""
    xf = x.astype(jnp.float32)
    dtsp = _softplus20(dt.astype(jnp.float32))              # (T, d_inner)
    da = jnp.exp(dtsp[:, :, None] * a.astype(jnp.float32)[None])  # (T,di,ds)
    dbx = b.astype(jnp.float32)[:, None, :] * (xf * dtsp)[:, :, None]

    # fold the carried state into the first step, then scan the recurrence
    dbx = dbx.at[0].add(da[0] * state.astype(jnp.float32))

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    _, h = jax.lax.associative_scan(combine, (da, dbx), axis=0)
    y = jnp.einsum("tis,ts->ti", h, c.astype(jnp.float32))
    return y, h[-1]
