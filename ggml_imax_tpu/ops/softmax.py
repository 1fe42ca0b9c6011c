"""soft_max_ext: fused scale + mask + ALiBi softmax.

Reference semantics: ggml_compute_forward_soft_max_f32
(/root/reference/src/ggml.c:13393-13497; API ggml_soft_max_ext ggml.h:1443):
out = softmax(x * scale + slope(head) * mask), with per-head ALiBi slopes
derived from max_bias, and -inf inputs producing exact zeros.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def alibi_slopes(n_head: int, max_bias: float) -> np.ndarray:
    """Per-head ALiBi slopes (ggml.c:13424-13447)."""
    if max_bias <= 0.0:
        return np.ones(n_head, dtype=np.float32)
    n_head_log2 = 1 << int(np.floor(np.log2(n_head)))
    m0 = 2.0 ** (-max_bias / n_head_log2)
    m1 = 2.0 ** (-max_bias / 2.0 / n_head_log2)
    h = np.arange(n_head)
    return np.where(h < n_head_log2,
                    m0 ** (h + 1),
                    m1 ** (2 * (h - n_head_log2) + 1)).astype(np.float32)


def soft_max_ext(x, mask=None, scale: float = 1.0, max_bias: float = 0.0,
                 head_axis: int = -3):
    """x: (..., H, Tq, Tk) attention scores; mask broadcastable (..., Tq, Tk).
    Computed in f32; masked (-inf) lanes produce exact zeros."""
    xf = x.astype(jnp.float32) * scale
    if mask is not None:
        m = mask.astype(jnp.float32)
        if max_bias > 0.0:
            n_head = x.shape[head_axis]
            slopes = jnp.asarray(alibi_slopes(n_head, max_bias))
            shape = [1] * x.ndim
            shape[head_axis] = n_head
            m = slopes.reshape(shape) * m[..., None, :, :] if m.ndim == x.ndim - 1 else slopes.reshape(shape) * m
        xf = xf + m
    mx = jnp.max(xf, axis=-1, keepdims=True)
    e = jnp.exp(xf - mx)
    e = jnp.where(jnp.isneginf(xf), 0.0, e)
    s = jnp.sum(e, axis=-1, keepdims=True)
    # a fully-masked row has s == 0; produce exact zeros, not 0/0 = NaN
    # (the reference zeroes -INF lanes explicitly, ggml.c:13393-13497)
    return (e / jnp.maximum(s, 1e-30)).astype(x.dtype)
