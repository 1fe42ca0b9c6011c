"""Fused Pallas flash attention (online softmax, O(T) memory).

The TPU analog of the reference's fused attention family:
- semantics: ggml_flash_attn_ext (/root/reference/include/ggml/ggml.h:1750)
  incl. GQA broadcast, additive mask, ALiBi slopes (max_bias) and logit
  soft-capping, f32 accumulation (ggml.h:1759 precision override).
- CPU impl being replaced: ggml.c:15572 (online-softmax loop per row).
- CUDA shape-specialization precedent: src/ggml-cuda/fattn.cu:517 dispatches
  on head size / batch; here one kernel is specialized by (block_q, block_k)
  at trace time and XLA caches the compiled variants.

Design: grid (B*Hq, Tq/BQ, Tk/BK) with the KV axis innermost ("arbitrary",
sequential); running max/denominator live in VMEM scratch across KV steps;
Q/K/V tiles stream HBM->VMEM via BlockSpecs; QK^T and P.V hit the MXU in
bf16 with f32 accumulate. GQA is free: the K/V index_map folds the q-head ->
kv-head mapping, so no repeated K/V ever materializes (the XLA reference
path pays a rep-times HBM blowup via jnp.repeat).

Masks use a large-finite NEG (-0.7*f32max) instead of -inf so that
exp(masked - m) underflows to 0 without NaN edge cases in fully-masked
(padding) rows.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import attention_xla

NEG = -0.7 * float(np.finfo(np.float32).max)
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(scale, softcap, use_mask, use_slope, want_lse, *refs):
    # refs = [inputs..., o_ref, (lse_out), acc, mx, lse] — outputs follow
    # inputs in out_specs order, scratch last
    refs = list(refs)
    lse = refs.pop()
    mx = refs.pop()
    acc = refs.pop()
    lse_out = refs.pop() if want_lse else None
    o_ref = refs.pop()
    if use_mask and use_slope:
        q_ref, k_ref, v_ref, m_in_ref, slope_ref = refs
    elif use_mask:
        q_ref, k_ref, v_ref, m_in_ref = refs
    else:
        q_ref, k_ref, v_ref = refs
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        mx[:] = jnp.full_like(mx, NEG)
        lse[:] = jnp.zeros_like(lse)

    q = q_ref[0]                                            # (BQ, D)
    k = k_ref[0]                                            # (BK, D)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if softcap > 0.0:
        s = softcap * jnp.tanh(s / softcap)
    if use_mask:
        mb = m_in_ref[0].astype(jnp.float32)                # (BQ, BK)
        if use_slope:
            mb = mb * slope_ref[0, 0]
        s = jnp.maximum(s + mb, NEG)

    m_prev = mx[:, :1]                                      # (BQ, 1)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)                                  # (BQ, BK)
    alpha = jnp.exp(m_prev - m_new)                         # (BQ, 1)
    lse[:, :1] = lse[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    mx[:, :1] = m_new
    pv = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc[:] = acc[:] * alpha + pv

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = acc[:] / jnp.maximum(lse[:, :1], 1e-30)
        if want_lse:
            # L = m + log(l): what the backward needs to rebuild P (l >= 1
            # always — the row max contributes exp(0)). Stored with q-rows on
            # sublanes, lane-broadcast to 8 (no relayout on write or read).
            col = mx[:, :1] + jnp.log(jnp.maximum(lse[:, :1], 1e-30))
            lse_out[0] = jnp.broadcast_to(col, lse_out.shape[1:])


@functools.partial(jax.jit, static_argnames=(
    "scale", "max_bias", "logit_softcap", "out_dtype", "block_q", "block_k",
    "interpret", "want_lse"))
def _flash(q, k, v, mask, *, scale, max_bias, logit_softcap, out_dtype,
           block_q, block_k, interpret, want_lse=False):
    B, Tq, Hq, D = q.shape
    _, Tk, Hkv, _ = k.shape
    rep = Hq // Hkv

    dpad = _round_up(D, _LANE)
    bq = min(block_q, _round_up(Tq, 8))
    bk = min(block_k, _round_up(Tk, _LANE))
    tq, tk = _round_up(Tq, bq), _round_up(Tk, bk)

    # head-major, padded layouts the kernel streams over
    qh = jnp.pad(q.astype(jnp.bfloat16).transpose(0, 2, 1, 3),
                 ((0, 0), (0, 0), (0, tq - Tq), (0, dpad - D))
                 ).reshape(B * Hq, tq, dpad)
    kh = jnp.pad(k.astype(jnp.bfloat16).transpose(0, 2, 1, 3),
                 ((0, 0), (0, 0), (0, tk - Tk), (0, dpad - D))
                 ).reshape(B * Hkv, tk, dpad)
    vh = jnp.pad(v.astype(jnp.bfloat16).transpose(0, 2, 1, 3),
                 ((0, 0), (0, 0), (0, tk - Tk), (0, dpad - D))
                 ).reshape(B * Hkv, tk, dpad)

    use_mask = mask is not None or tk != Tk
    if use_mask:
        if mask is None:
            m3 = jnp.zeros((B, Tq, Tk), jnp.float32)
        else:
            # accept (B,1,Tq,Tk) / (Tq,Tk) / (B,Tq,Tk); heads must share it
            m3 = jnp.broadcast_to(jnp.squeeze(mask, axis=1)
                                  if mask.ndim == 4 else mask, (B, Tq, Tk))
        m3 = jnp.maximum(m3.astype(jnp.float32), NEG)
        m3 = jnp.pad(m3, ((0, 0), (0, tq - Tq), (0, tk - Tk)),
                     constant_values=NEG)

    use_slope = max_bias > 0.0
    grid = (B * Hq, tq // bq, tk // bk)
    in_specs = [
        pl.BlockSpec((1, bq, dpad), lambda bh, qq, kk: (bh, qq, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, dpad),
                     lambda bh, qq, kk: (bh // Hq * Hkv + bh % Hq // rep, kk, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, dpad),
                     lambda bh, qq, kk: (bh // Hq * Hkv + bh % Hq // rep, kk, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qh, kh, vh]
    if use_mask:
        in_specs.append(pl.BlockSpec((1, bq, bk),
                                     lambda bh, qq, kk: (bh // Hq, qq, kk),
                                     memory_space=pltpu.VMEM))
        args.append(m3)
    if use_slope:
        from .softmax import alibi_slopes
        slopes = jnp.asarray(alibi_slopes(Hq, max_bias),
                             jnp.float32).reshape(Hq, 1)
        in_specs.append(pl.BlockSpec((1, 1), lambda bh, qq, kk: (bh % Hq, 0),
                                     memory_space=pltpu.SMEM))
        args.append(slopes)

    out_specs = pl.BlockSpec((1, bq, dpad), lambda bh, qq, kk: (bh, qq, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B * Hq, tq, dpad), jnp.float32)
    if want_lse:
        out_specs = [out_specs,
                     pl.BlockSpec((1, bq, 8), lambda bh, qq, kk: (bh, qq, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((B * Hq, tq, 8), jnp.float32)]
    out = pl.pallas_call(
        functools.partial(_kernel, scale, logit_softcap, use_mask, use_slope,
                          want_lse),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bq, dpad), jnp.float32),
            pltpu.VMEM((bq, _LANE), jnp.float32),
            pltpu.VMEM((bq, _LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * tq * tk * dpad,
            bytes_accessed=(B * Hq * tq * dpad * 6
                            + 2 * B * Hkv * tk * dpad * 2
                            + (B * tq * tk * 4 if use_mask else 0)),
            transcendentals=B * Hq * tq * tk),
        interpret=interpret,
    )(*args)
    if want_lse:
        out, lse = out
    out = out.reshape(B, Hq, tq, dpad)[:, :, :Tq, :D]
    out = out.transpose(0, 2, 1, 3).astype(out_dtype)
    return (out, lse) if want_lse else out


# cfg = (scale, max_bias, logit_softcap, out_dtype, block_q, block_k,
#        interpret) — hashable, passed as a nondiff arg so jax.grad flows
# only through q/k/v (and returns a zero cotangent for the mask)
@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fa(cfg, q, k, v, mask):
    scale, max_bias, softcap, out_dtype, bq, bk, interp = cfg
    return _flash(q, k, v, mask, scale=scale, max_bias=max_bias,
                  logit_softcap=softcap, out_dtype=out_dtype,
                  block_q=bq, block_k=bk, interpret=interp)


def _fa_fwd(cfg, q, k, v, mask):
    scale, max_bias, softcap, out_dtype, bq, bk, interp = cfg
    out, lse = _flash(q, k, v, mask, scale=scale, max_bias=max_bias,
                      logit_softcap=softcap, out_dtype=out_dtype,
                      block_q=bq, block_k=bk, interpret=interp,
                      want_lse=True)
    return out, (q, k, v, mask, out, lse)


def _fa_bwd(cfg, res, do):
    from .flash_backward import flash_attention_bwd
    scale, max_bias, softcap, out_dtype, bq, bk, interp = cfg
    q, k, v, mask, out, lse = res
    dq, dk, dv = flash_attention_bwd(
        q, k, v, mask, out, lse, do, scale=scale, max_bias=max_bias,
        logit_softcap=softcap, block_q=bq, block_k=bk, interpret=interp)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dq, dk, dv, dmask


_fa.defvjp(_fa_fwd, _fa_bwd)


def flash_attention(q, k, v, mask=None, *, scale: float | None = None,
                    max_bias: float = 0.0, logit_softcap: float = 0.0,
                    out_dtype=None, block_q: int = 256, block_k: int = 512,
                    interpret: bool | None = None, precision=None):
    """Drop-in for attention_xla: q (B,Tq,Hq,D), k/v (B,Tk,Hkv,D),
    mask additive broadcastable to (B,1,Tq,Tk). Returns (B,Tq,Hq,D).
    `precision` is accepted for xla-path signature parity and ignored: the
    kernel always accumulates in f32 (ggml_flash_attn_ext_set_prec analog).

    Differentiable: jax.grad runs through the Pallas backward kernels in
    ops/flash_backward.py (the GGML_OP_FLASH_ATTN_BACK analog,
    /root/reference/include/ggml/ggml.h:424-512)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    out_dtype = out_dtype or q.dtype
    scale = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])
    cfg = (float(scale), float(max_bias), float(logit_softcap),
           jnp.dtype(out_dtype), block_q, block_k, interpret)
    return _fa(cfg, q, k, v, mask)


def attention(q, k, v, mask=None, *, impl: str = "auto", **kw):
    """Dispatcher: 'flash' (Pallas), 'xla' (reference), or 'auto'."""
    if impl == "xla":
        return attention_xla(q, k, v, mask, **kw)
    if impl == "flash":
        return flash_attention(q, k, v, mask, **kw)
    # auto: flash on TPU for multi-token queries (prefill); single-token
    # decode pads Tq 1->8 in the kernel and gains nothing over XLA's fused
    # softmax (decode attention is HBM-bound on the KV read either way), so
    # it takes the XLA path — mirroring the reference's mmq-vs-mmvq batch
    # dispatch (ggml-cuda.cu:1867-1960).
    if jax.devices()[0].platform == "tpu" and q.shape[1] > 1:
        return flash_attention(q, k, v, mask, **kw)
    return attention_xla(q, k, v, mask, **kw)
