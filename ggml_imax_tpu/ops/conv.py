"""Convolution / pooling / resampling ops.

Reference semantics (all in /root/reference/src/ggml.c, API include/ggml/ggml.h):
- ggml_im2col (ggml.h:1556) — patch extraction, the reference's conv building
  block (conv = im2col + mul_mat).
- ggml_conv_1d / ggml_conv_2d (ggml.h:1570-1608) with (stride s, pad p,
  dilation d) per spatial dim.
- ggml_conv_transpose_1d (ggml.h:1587), ggml_conv_transpose_2d_p0 (ggml.h:1616).
- ggml_pool_1d / ggml_pool_2d (ggml.h:1625-1645), GGML_OP_POOL_MAX/AVG.
- ggml_upscale (ggml.h:1652) nearest-neighbor, ggml_pad (ggml.h:1660).

TPU-first design: convs lower to `lax.conv_general_dilated`, which XLA tiles
straight onto the MXU — no hand im2col on the hot path (im2col is still
provided for op parity/tests). Layout convention: channels-last spatial
layouts map best to TPU tiling, but for parity with the reference's loaders
we accept NCW/NCHW (ggml's ne reversed) and let XLA transpose internally via
dimension_numbers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def conv_1d(x, w, s0: int = 1, p0: int = 0, d0: int = 1):
    """x: (N, Cin, W), w: (Cout, Cin, K) -> (N, Cout, OW). ggml_conv_1d."""
    return lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32),
        window_strides=(s0,), padding=((p0, p0),), rhs_dilation=(d0,),
        dimension_numbers=("NCH", "OIH", "NCH"))


def conv_2d(x, w, s0: int = 1, s1: int = 1, p0: int = 0, p1: int = 0,
            d0: int = 1, d1: int = 1):
    """x: (N, Cin, H, W), w: (Cout, Cin, KH, KW) -> (N, Cout, OH, OW).
    ggml_conv_2d; ggml's (s0,p0,d0) are the W-axis params, (s1,p1,d1) the H."""
    return lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32),
        window_strides=(s1, s0), padding=((p1, p1), (p0, p0)),
        rhs_dilation=(d1, d0), dimension_numbers=("NCHW", "OIHW", "NCHW"))


def conv_transpose_1d(x, w, s0: int = 1, p0: int = 0, d0: int = 1):
    """x: (N, Cin, W), w: (Cin, Cout, K) -> (N, Cout, OW).
    ggml_conv_transpose_1d (ggml.h:1587): output length (W-1)*s - 2p + d*(K-1)+1."""
    k = w.shape[-1]
    return lax.conv_general_dilated(
        x.astype(jnp.float32),
        jnp.flip(w.astype(jnp.float32), -1).swapaxes(0, 1),
        window_strides=(1,), padding=((d0 * (k - 1) - p0, d0 * (k - 1) - p0),),
        lhs_dilation=(s0,), rhs_dilation=(d0,),
        dimension_numbers=("NCH", "OIH", "NCH"))


def conv_transpose_2d_p0(x, w, stride: int):
    """x: (N, Cin, H, W), w: (Cin, Cout, KH, KW). ggml_conv_transpose_2d_p0."""
    kh, kw = w.shape[-2:]
    return lax.conv_general_dilated(
        x.astype(jnp.float32),
        jnp.flip(w.astype(jnp.float32), (-1, -2)).swapaxes(0, 1),
        window_strides=(1, 1),
        padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def im2col(x, kh: int, kw: int, s0: int = 1, s1: int = 1, p0: int = 0,
           p1: int = 0, d0: int = 1, d1: int = 1):
    """ggml_im2col 2D: x (N, Cin, H, W) -> (N, OH, OW, Cin*KH*KW) patches,
    flattened in (Cin, KH, KW) order, so conv == patches @ w.reshape(Cout,-1).T."""
    n, c, h, wdt = x.shape
    xf = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, 0), (p1, p1), (p0, p0)))
    oh = (h + 2 * p1 - d1 * (kh - 1) - 1) // s1 + 1
    ow = (wdt + 2 * p0 - d0 * (kw - 1) - 1) // s0 + 1
    patches = lax.conv_general_dilated_patches(
        xf, (kh, kw), (s1, s0), padding=((0, 0), (0, 0)),
        rhs_dilation=(d1, d0), dimension_numbers=("NCHW", "OIHW", "NCHW"))
    # patches: (N, C*KH*KW, OH, OW) in (C, KH, KW) order
    return patches.reshape(n, c * kh * kw, oh, ow).transpose(0, 2, 3, 1)


def pool_1d(x, op: str, k0: int, s0: int, p0: int = 0):
    """x: (N, C, W). op in {'max','avg'}. ggml_pool_1d (ggml.h:1625)."""
    return _pool(x, op, (k0,), (s0,), (p0,), spatial=1)


def pool_2d(x, op: str, k0: int, k1: int, s0: int, s1: int,
            p0: int = 0, p1: int = 0):
    """x: (N, C, H, W). ggml_pool_2d (ggml.h:1635); (k0,s0,p0) on W."""
    return _pool(x, op, (k1, k0), (s1, s0), (p1, p0), spatial=2)


def _pool(x, op, k, s, p, spatial):
    xf = x.astype(jnp.float32)
    dims = (1,) * (x.ndim - spatial) + k
    strides = (1,) * (x.ndim - spatial) + s
    pads = ((0, 0),) * (x.ndim - spatial) + tuple((pi, pi) for pi in p)
    if op == "max":
        init = -jnp.inf
        out = lax.reduce_window(xf, init, lax.max, dims, strides, pads)
    elif op == "avg":
        out = lax.reduce_window(xf, 0.0, lax.add, dims, strides, pads)
        out = out / float(jnp.prod(jnp.asarray(k)))
    else:
        raise ValueError(op)
    return out


def upscale(x, scale: int):
    """Nearest-neighbor integer upscale of the two innermost spatial dims.
    x: (N, C, H, W) -> (N, C, H*scale, W*scale). ggml_upscale (ggml.h:1652)."""
    x = jnp.repeat(x, scale, axis=-2)
    return jnp.repeat(x, scale, axis=-1)


def interpolate_bilinear(x, oh: int, ow: int, align_corners: bool = False):
    """Bilinear resize of (N, C, H, W) (GGML_SCALE_MODE_BILINEAR analog)."""
    return jax.image.resize(x, x.shape[:-2] + (oh, ow), method="bilinear")


def pad(x, *widths):
    """ggml_pad (ggml.h:1660): zero-pad; widths are per-axis trailing pads
    given innermost-first like ggml (p0 on last axis)."""
    cfg = [(0, 0)] * x.ndim
    for i, wdt in enumerate(widths):
        cfg[x.ndim - 1 - i] = (0, wdt)
    return jnp.pad(x, cfg)
