"""Unary activations matching ggml's definitions (enum ggml_unary_op,
/root/reference/include/ggml/ggml.h:514-530; CPU kernels in ggml.c).

ggml's GELU is the tanh approximation (evaluated through an fp16 lookup table
on CPU — we use the analytic form, which is strictly more accurate).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

SQRT_2_OVER_PI = math.sqrt(2.0 / math.pi)
GELU_COEF_A = 0.044715
GELU_QUICK_COEF = -1.702


def gelu(x):
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + jnp.tanh(SQRT_2_OVER_PI * xf * (1.0 + GELU_COEF_A * xf * xf)))
    return y.astype(x.dtype)


def gelu_quick(x):
    xf = x.astype(jnp.float32)
    return (xf * (1.0 / (1.0 + jnp.exp(GELU_QUICK_COEF * xf)))).astype(x.dtype)


def silu(x):
    xf = x.astype(jnp.float32)
    return (xf / (1.0 + jnp.exp(-xf))).astype(x.dtype)


def relu(x):
    return jnp.maximum(x, 0)


def leaky_relu(x, negative_slope: float = 0.1):
    return jnp.where(x > 0, x, x * negative_slope)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def tanh(x):
    return jnp.tanh(x)


def elu(x):
    return jax.nn.elu(x)


def hardswish(x):
    xf = x.astype(jnp.float32)
    return (xf * jnp.clip(xf / 6.0 + 0.5, 0.0, 1.0)).astype(x.dtype)


def hardsigmoid(x):
    xf = x.astype(jnp.float32)
    return jnp.clip(xf / 6.0 + 0.5, 0.0, 1.0).astype(x.dtype)


def abs_(x):
    return jnp.abs(x)


def sgn(x):
    return jnp.sign(x)


def neg(x):
    return -x


def step(x):
    return (x > 0).astype(x.dtype)


def relu_squared(x):
    r = jnp.maximum(x, 0)
    return r * r
