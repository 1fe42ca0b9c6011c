"""Rotary position embeddings with the reference's full parameter surface:
linear/NTK/YaRN scaling, normal (interleaved) / NeoX / GLM modes, xPos.

Semantics match ggml_compute_forward_rope_f32 (/root/reference/src/ggml.c:
13775-13948) and rope_yarn/_ramp/_corr_dims (ggml.c:13719-13773), including
its quirks (NeoX applies freq_scale to theta_base before rope_yarn scales it
again; the NeoX YaRN ramp index is `-ic/n_dims`), so that models tuned against
ggml behave identically.

x: (..., T, H, D) — rotation over the last axis. pos: int32 (..., T).
"""
from __future__ import annotations

import math
from functools import partial

import jax.numpy as jnp
import numpy as np

ROPE_MODE_NORMAL = 0
ROPE_MODE_NEOX = 2
ROPE_MODE_GLM = 4


def yarn_corr_dims(n_dims: int, n_orig_ctx: int, freq_base: float,
                   beta_fast: float, beta_slow: float) -> tuple[float, float]:
    def corr_dim(n_rot):
        return n_dims * math.log(n_orig_ctx / (n_rot * 2 * math.pi)) / (2 * math.log(freq_base))
    start = math.floor(corr_dim(beta_fast))
    end = math.ceil(corr_dim(beta_slow))
    return max(0.0, start), min(n_dims - 1.0, end)


def _rope_yarn(theta_extrap, freq_scale, corr_lo, corr_hi, ramp_idx,
               ext_factor, mscale):
    """Returns (cos, sin) with YaRN interpolation/extrapolation mixing."""
    theta_interp = freq_scale * theta_extrap
    if ext_factor != 0.0:
        y = (ramp_idx / 2.0 - corr_lo) / max(0.001, corr_hi - corr_lo)
        ramp = (1.0 - jnp.clip(y, 0.0, 1.0)) * ext_factor
        theta = theta_interp * (1 - ramp) + theta_extrap * ramp
        mscale = mscale * (1.0 + 0.1 * math.log(1.0 / freq_scale))
    else:
        theta = theta_interp
    return jnp.cos(theta) * mscale, jnp.sin(theta) * mscale


def rope(x, pos, n_dims: int | None = None, mode: int = ROPE_MODE_NORMAL, *,
         freq_base: float = 10000.0, freq_scale: float = 1.0,
         ext_factor: float = 0.0, attn_factor: float = 1.0,
         beta_fast: float = 32.0, beta_slow: float = 1.0,
         n_orig_ctx: int = 0, n_ctx: int = 0,
         xpos_base: float = 0.0, xpos_down: bool = False,
         forward: bool = True):
    """Apply RoPE. n_dims defaults to the head dim; dims beyond n_dims pass
    through unchanged (NeoX mode, matching the reference)."""
    D = x.shape[-1]
    n_dims = n_dims or D
    assert n_dims % 2 == 0
    n_orig_ctx = n_orig_ctx or n_ctx or 2048
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    p = pos.astype(jnp.float32)
    # broadcast positions over head & pair axes: (..., T) -> (..., T, 1, 1)
    p = p[..., None, None]
    sin_sign = 1.0 if forward else -1.0

    theta_scale = freq_base ** (-2.0 / n_dims)
    corr_lo, corr_hi = yarn_corr_dims(n_dims, n_orig_ctx, freq_base, beta_fast, beta_slow)

    if mode & 4:  # GLM
        theta_b = jnp.minimum(p, n_ctx - 2)
        block_theta = jnp.maximum(p - (n_ctx - 2), 0.0)
        i = jnp.arange(D // 4, dtype=jnp.float32)
        scales = theta_scale ** i
        th = theta_b * scales
        bth = block_theta * scales
        cos_t, sin_t = jnp.cos(th), jnp.sin(th) * sin_sign
        cos_b, sin_b = jnp.cos(bth), jnp.sin(bth) * sin_sign
        q = D // 4
        x0, x1 = xf[..., 0:q], xf[..., q:2 * q]
        x2, x3 = xf[..., 2 * q:3 * q], xf[..., 3 * q:]
        out = jnp.concatenate([
            x0 * cos_t - x1 * sin_t,
            x0 * sin_t + x1 * cos_t,
            x2 * cos_b - x3 * sin_b,
            x2 * sin_b + x3 * cos_b,
        ], axis=-1)
        return out.astype(orig_dtype)

    if mode & 2:  # NeoX: pairs (i, i + n_dims/2), extra dims pass through
        j = jnp.arange(n_dims // 2, dtype=jnp.float32)
        # reference: theta_base *= freq_scale once, then *= theta_scale per pair
        theta_extrap = (p * freq_scale) * theta_scale ** j
        ramp_idx = (-2.0 * j) / n_dims            # reference cur_rot quirk
        cos_t, sin_t = _rope_yarn(theta_extrap, freq_scale, corr_lo, corr_hi,
                                  ramp_idx, ext_factor, attn_factor)
        sin_t = sin_t * sin_sign
        x0 = xf[..., : n_dims // 2]
        x1 = xf[..., n_dims // 2: n_dims]
        rot = jnp.concatenate([x0 * cos_t - x1 * sin_t,
                               x0 * sin_t + x1 * cos_t], axis=-1)
        out = jnp.concatenate([rot, xf[..., n_dims:]], axis=-1) if n_dims < D else rot
        return out.astype(orig_dtype)

    # normal (interleaved) mode: pairs (2i, 2i+1) over the FULL head dim, with
    # theta exponent i and YaRN ramp index 2i (= i0)
    cos_t, sin_t, zeta = _normal_tables(
        p, D, theta_scale, corr_lo, corr_hi, ext_factor, attn_factor,
        sin_sign, freq_scale, xpos_base, xpos_down)
    x_pairs = xf.reshape(*xf.shape[:-1], D // 2, 2)
    x0 = x_pairs[..., 0]
    x1 = x_pairs[..., 1]
    r0 = x0 * cos_t * zeta - x1 * sin_t * zeta
    r1 = x0 * sin_t * zeta + x1 * cos_t * zeta
    out = jnp.stack([r0, r1], axis=-1).reshape(xf.shape)
    return out.astype(orig_dtype)


def _normal_tables(p, D, theta_scale, corr_lo, corr_hi, ext_factor,
                   attn_factor, sin_sign, freq_scale, xpos_base, xpos_down):
    """(cos, sin, zeta) for normal-mode pair i — shared by the interleaved
    and the split-half (permuted-weight) applications."""
    i = jnp.arange(D // 2, dtype=jnp.float32)
    theta_extrap = p * theta_scale ** i
    ramp_idx = 2.0 * i
    cos_t, sin_t = _rope_yarn(theta_extrap, freq_scale, corr_lo, corr_hi,
                              ramp_idx, ext_factor, attn_factor)
    sin_t = sin_t * sin_sign
    if xpos_base != 0.0:
        zeta = ((2.0 * i + 0.4 * D) / (1.4 * D)) ** (p / xpos_base)
        if xpos_down:
            zeta = 1.0 / zeta
    else:
        zeta = 1.0
    return cos_t, sin_t, zeta


def _normal_mode_setup(x, pos, n_dims, *, freq_base, freq_scale, ext_factor,
                       attn_factor, beta_fast, beta_slow, n_orig_ctx, n_ctx,
                       xpos_base, xpos_down, forward):
    """Shared normal-mode preamble (defaulting, upcast, tables) for rope()
    and rope_split() — keeping the two applications on ONE parameter path
    so the P(rope(x)) == rope_split(P(x)) identity can't silently drift."""
    D = x.shape[-1]
    n_dims = n_dims or D
    assert n_dims % 2 == 0
    n_orig_ctx = n_orig_ctx or n_ctx or 2048
    xf = x.astype(jnp.float32)
    p = pos.astype(jnp.float32)[..., None, None]
    sin_sign = 1.0 if forward else -1.0
    theta_scale = freq_base ** (-2.0 / n_dims)
    corr_lo, corr_hi = yarn_corr_dims(n_dims, n_orig_ctx, freq_base,
                                      beta_fast, beta_slow)
    cos_t, sin_t, zeta = _normal_tables(
        p, D, theta_scale, corr_lo, corr_hi, ext_factor, attn_factor,
        sin_sign, freq_scale, xpos_base, xpos_down)
    return xf, cos_t, sin_t, zeta


def rope_split(x, pos, n_dims: int | None = None, *,
               freq_base: float = 10000.0, freq_scale: float = 1.0,
               ext_factor: float = 0.0, attn_factor: float = 1.0,
               beta_fast: float = 32.0, beta_slow: float = 1.0,
               n_orig_ctx: int = 0, n_ctx: int = 0,
               xpos_base: float = 0.0, xpos_down: bool = False,
               forward: bool = True):
    """Normal-mode RoPE on SPLIT-HALF data: pair i of the interleaved
    layout lives at lanes (i, D/2 + i) instead of (2i, 2i+1).

    Mathematically identical to `rope(..., mode=0)` under the per-head
    column permutation P: P(rope(x)) == rope_split(P(x)) — attention
    scores are invariant to permuting q and k consistently, so permuting
    the q/k projection columns once at load (split_rope_permutation) lets
    the hot path rotate two CONTIGUOUS half-blocks (4 mul + 2 add, no
    lane interleave) instead of de/re-interleaving 128 lane pairs, which
    Mosaic/XLA realize as strided lane shuffles. Same tables, including
    the reference quirk of rotating ALL D/2 pairs past n_dims
    (ggml_rope_cache_init /root/reference/src/ggml.c:13750-13763 fills
    theta over the full ne0)."""
    xf, cos_t, sin_t, zeta = _normal_mode_setup(
        x, pos, n_dims, freq_base=freq_base, freq_scale=freq_scale,
        ext_factor=ext_factor, attn_factor=attn_factor,
        beta_fast=beta_fast, beta_slow=beta_slow, n_orig_ctx=n_orig_ctx,
        n_ctx=n_ctx, xpos_base=xpos_base, xpos_down=xpos_down,
        forward=forward)
    orig_dtype = x.dtype
    D = x.shape[-1]
    x0 = xf[..., : D // 2]
    x1 = xf[..., D // 2:]
    # same op association as rope()'s interleaved application so the two
    # paths are bit-identical under the permutation
    out = jnp.concatenate([x0 * cos_t * zeta - x1 * sin_t * zeta,
                           x0 * sin_t * zeta + x1 * cos_t * zeta],
                          axis=-1)
    return out.astype(orig_dtype)


def split_rope_permutation(D: int) -> np.ndarray:
    """Column permutation taking interleaved pairs to split halves within
    one head: source column for target t is 2t (t < D/2) or 2(t-D/2)+1."""
    t = np.arange(D)
    return np.where(t < D // 2, 2 * t, 2 * (t - D // 2) + 1)
