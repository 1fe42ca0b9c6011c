"""Normalization ops (reference: ggml_compute_forward_norm/rms_norm/group_norm,
/root/reference/src/ggml.c; API ggml.h:942-976). Computed in f32 regardless of
input dtype, matching the reference's f32 kernels."""
from __future__ import annotations

import jax.numpy as jnp

GGML_EPS_DEFAULT = 1e-5


def layer_norm(x, weight=None, bias=None, eps: float = GGML_EPS_DEFAULT):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mean) / jnp.sqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(x, weight=None, eps: float = GGML_EPS_DEFAULT):
    xf = x.astype(jnp.float32)
    ms = (xf * xf).mean(axis=-1, keepdims=True)
    y = xf * jax_rsqrt(ms + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    return y.astype(x.dtype)


def jax_rsqrt(v):
    return jnp.reciprocal(jnp.sqrt(v))


def group_norm(x, n_groups: int, eps: float = GGML_EPS_DEFAULT):
    """ggml group_norm: normalize over (channels-in-group, spatial). x layout
    follows ggml conv tensors: (..., C, H*W) flattened as (..., C, S)."""
    xf = x.astype(jnp.float32)
    *lead, c, s = xf.shape
    g = xf.reshape(*lead, n_groups, c // n_groups * s)
    mean = g.mean(axis=-1, keepdims=True)
    var = ((g - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (g - mean) / jnp.sqrt(var + eps)
    return y.reshape(*lead, c, s).astype(x.dtype)
