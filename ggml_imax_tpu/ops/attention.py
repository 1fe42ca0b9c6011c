"""Attention ops.

- `attention_xla`: reference attention (QK^T -> soft_max_ext -> V), supporting
  GQA broadcast, additive masks, ALiBi, logit soft-capping. The semantic model
  is ggml_flash_attn_ext (/root/reference/include/ggml/ggml.h:1750) / the
  unfused mul_mat+soft_max+mul_mat graphs the examples build.
- the fused Pallas flash-attention kernel lives in ops/flash_attention.py.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from .softmax import alibi_slopes


def attention_xla(q, k, v, mask=None, *, scale: float | None = None,
                  max_bias: float = 0.0, logit_softcap: float = 0.0,
                  out_dtype=None, precision=None):
    """q: (B, Tq, Hq, D), k/v: (B, Tk, Hkv, D), mask: broadcastable to
    (B, Hq, Tq, Tk) additive (-inf for masked). Returns (B, Tq, Hq, D).
    Hq must be a multiple of Hkv (GQA)."""
    B, Tq, Hq, D = q.shape
    _, Tk, Hkv, _ = k.shape
    out_dtype = out_dtype or q.dtype
    scale = scale if scale is not None else 1.0 / math.sqrt(D)

    rep = Hq // Hkv
    # operands stay in their input dtype (bf16 KV reads at full HBM rate on
    # the decode path — no f32 copy of the cache); accumulation is f32
    qf = q.transpose(0, 2, 1, 3)                              # (B, Hq, Tq, D)
    kf = k.astype(q.dtype).transpose(0, 2, 1, 3)              # (B, Hkv, Tk, D)
    vf = v.astype(q.dtype).transpose(0, 2, 1, 3)
    if rep > 1:
        kf = jnp.repeat(kf, rep, axis=1)
        vf = jnp.repeat(vf, rep, axis=1)

    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf, precision=precision,
                   preferred_element_type=jnp.float32) * scale
    if logit_softcap > 0.0:
        s = logit_softcap * jnp.tanh(s / logit_softcap)
    if max_bias > 0.0:
        slopes = jnp.asarray(alibi_slopes(Hq, max_bias)).reshape(1, Hq, 1, 1)
        if mask is not None:
            s = s + slopes * mask.astype(jnp.float32)
    elif mask is not None:
        s = s + mask.astype(jnp.float32)

    # fully-masked rows (continuous-batching pad rows): clamp the running
    # max and the denominator so the output is 0, not NaN — matching the
    # Pallas decode kernels' 1e-30 clamp. A NaN here is not benign: the
    # row's next-layer K/V would carry it into the shared cell arena.
    mx = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), -0.7e38)
    e = jnp.exp(s - mx)
    e = jnp.where(jnp.isneginf(s), 0.0, e)
    p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(vf.dtype), vf,
                   precision=precision, preferred_element_type=jnp.float32)
    return o.transpose(0, 2, 1, 3).astype(out_dtype)


def causal_mask(t_q: int, t_k: int, n_past: int, dtype=jnp.float32):
    """Additive causal mask for a query block starting at position n_past
    attending over t_k cached keys: (t_q, t_k) with 0 where visible."""
    q_pos = jnp.arange(t_q)[:, None] + n_past
    k_pos = jnp.arange(t_k)[None, :]
    return jnp.where(k_pos <= q_pos, 0.0, -jnp.inf).astype(dtype)
