"""Miscellaneous tensor ops from ggml's op set (enum ggml_op,
/root/reference/include/ggml/ggml.h:424-512) that are thin, fusable XLA
expressions on TPU. Each cites its reference kernel. ggml's ne-order is the
reverse of numpy shape order; here "rows" means the last axis (ne0).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def scale(x, s: float):
    """GGML_OP_SCALE (ggml.h:1095)."""
    return x * s


def clamp(x, lo: float, hi: float):
    """ggml_clamp (ggml.h:1552)."""
    return jnp.clip(x, lo, hi)


def sqr(x):
    return x * x


def sqrt_(x):
    return jnp.sqrt(x)


def log_(x):
    return jnp.log(x)


def sum_(x):
    """GGML_OP_SUM: full reduction to a single value (ggml.h:910)."""
    return jnp.sum(x.astype(jnp.float32)).reshape(1)


def sum_rows(x):
    """GGML_OP_SUM_ROWS (ggml.h:914): reduce the innermost axis, keepdims."""
    return jnp.sum(x.astype(jnp.float32), axis=-1, keepdims=True).astype(x.dtype)


def mean(x):
    """GGML_OP_MEAN (ggml.h:918): mean over innermost axis, keepdims."""
    return jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)


def argmax(x):
    """GGML_OP_ARGMAX (ggml.h:922): argmax over innermost axis."""
    return jnp.argmax(x, axis=-1).astype(jnp.int32)


def repeat(x, target_shape):
    """GGML_OP_REPEAT (ggml.h:926): tile x up to target_shape."""
    reps = tuple(t // s for t, s in zip(target_shape, x.shape))
    return jnp.tile(x, reps)


def concat(a, b, axis: int = -3):
    """ggml_concat (ggml.h:1064) — reference concatenates along ne2
    (dim -3 in numpy order for 4-D tensors)."""
    return jnp.concatenate([a, b], axis=axis)


def argsort(x, descending: bool = False):
    """GGML_OP_ARGSORT (ggml.h:1686) over the innermost axis."""
    order = jnp.argsort(-x if descending else x, axis=-1, stable=True)
    return order.astype(jnp.int32)


def top_k(x, k: int):
    """ggml_top_k (ggml.h:1693): indices of the k largest, sorted desc."""
    return argsort(x, descending=True)[..., :k]


def diag_mask_inf(x, n_past: int):
    """ggml_diag_mask_inf (ggml.h:1425): x (..., Tq, Tk); entries with
    k > n_past + q become -inf."""
    tq, tk = x.shape[-2:]
    q = jnp.arange(tq)[:, None]
    k = jnp.arange(tk)[None, :]
    return jnp.where(k > q + n_past, -jnp.inf, x.astype(jnp.float32))


def diag_mask_zero(x, n_past: int):
    """ggml_diag_mask_zero (ggml.h:1433)."""
    tq, tk = x.shape[-2:]
    q = jnp.arange(tq)[:, None]
    k = jnp.arange(tk)[None, :]
    return jnp.where(k > q + n_past, 0.0, x.astype(jnp.float32))


def acc(dst, src, offsets):
    """GGML_OP_ACC (ggml.h:891): add src into a view of dst at element
    offsets (functional: returns updated dst)."""
    view = jax.lax.dynamic_slice(dst, offsets, src.shape)
    return jax.lax.dynamic_update_slice(dst, view + src.astype(dst.dtype), offsets)


def set_(dst, src, offsets):
    """GGML_OP_SET (ggml.h:1003): overwrite a view (functional)."""
    return jax.lax.dynamic_update_slice(dst, src.astype(dst.dtype), offsets)


def arange(start: float, stop: float, step: float):
    """ggml_arange (ggml.h:1699)."""
    return jnp.arange(start, stop, step, dtype=jnp.float32)


def timestep_embedding(timesteps, dim: int, max_period: int = 10000):
    """ggml_timestep_embedding (ggml.h:1707) — sinusoidal embedding as in
    stable-diffusion: out (T, dim), first half cos, second half sin."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def win_part(x, w: int):
    """ggml_win_part (ggml.h:1723) — SAM windowed attention partition.
    x: (B, H, W, C) -> (B*nWh*nWw, w, w, C) with zero pad to multiples of w.
    Reference kernel: ggml.c (GGML_OP_WIN_PART), used sam/main.cpp:1238."""
    b, h, wdt, c = x.shape
    ph, pw = (-h) % w, (-wdt) % w
    xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    nh, nw = (h + ph) // w, (wdt + pw) // w
    xw = xp.reshape(b, nh, w, nw, w, c).transpose(0, 1, 3, 2, 4, 5)
    return xw.reshape(b * nh * nw, w, w, c)


def win_unpart(x, h: int, wdt: int, w: int):
    """ggml_win_unpart (ggml.h:1730): inverse of win_part, crops padding."""
    nh, nw = (h + (-h) % w) // w, (wdt + (-wdt) % w) // w
    b = x.shape[0] // (nh * nw)
    c = x.shape[-1]
    xw = x.reshape(b, nh, nw, w, w, c).transpose(0, 1, 3, 2, 4, 5)
    return xw.reshape(b, nh * w, nw * w, c)[:, :h, :wdt, :]


def get_rel_pos(rel_pos, qh: int, kh: int):
    """ggml_get_rel_pos (ggml.h:1742) — SAM decomposed relative positions:
    rel_pos ((2*max-1), C) -> (qh, kh, C) gathered at relative coords
    (sam/main.cpp:1282-1294 semantics)."""
    q = jnp.arange(qh)[:, None] * max(kh / qh, 1.0)
    k = jnp.arange(kh)[None, :] * max(qh / kh, 1.0)
    coords = (q - k + (kh - 1) * max(qh / kh, 1.0)).astype(jnp.int32)
    return rel_pos[coords]


def add_rel_pos(attn, rel_w, rel_h):
    """ggml_add_rel_pos (ggml.h:1746): attn (B, qh*qw, kh*kw) +=
    rel_h (B, qh, qw, kh) broadcast over kw + rel_w (B, qh, qw, kw) over kh."""
    b, _, _ = attn.shape
    bq, qh, qw, kh = rel_h.shape
    kw = rel_w.shape[-1]
    a = attn.reshape(b, qh, qw, kh, kw)
    a = a + rel_h[..., :, None] + rel_w[..., None, :]
    return a.reshape(b, qh * qw, kh * kw)


def cross_entropy_loss(logits, labels):
    """ggml_cross_entropy_loss (ggml.h:2044): mean over rows of
    -sum(labels * log_softmax(logits)). Reference computes a single scalar.
    labels are probabilities (often one-hot)."""
    ls = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    per_row = -jnp.sum(labels.astype(jnp.float32) * ls, axis=-1)
    return jnp.mean(per_row).reshape(1)


def leaky_relu(x, negative_slope: float = 0.1):
    from .activations import leaky_relu as _lr
    return _lr(x, negative_slope)


def flip(x, axis: int):
    return jnp.flip(x, axis)


def outer_prod(a, b):
    """GGML_OP_OUT_PROD (ggml.h:1030): a (..., M), b (..., N) -> (..., N, M)
    in numpy order (ggml: ne=[M,N])."""
    return jnp.einsum("...m,...n->...nm", a.astype(jnp.float32),
                      b.astype(jnp.float32))
