"""Pallas flash-attention backward kernels (the FLASH_ATTN_BACK analog).

The reference carries an explicit backward op for fused attention
(GGML_OP_FLASH_ATTN_BACK, /root/reference/include/ggml/ggml.h:424-512; CPU
impl ggml.c near :15572) so training can run through the fused path. Here the
same capability is provided as a jax.custom_vjp on ops.flash_attention: the
forward kernel additionally emits the per-row logsumexp L = m + log(l), and
two backward kernels recompute P = exp(S_eff - L) tile-by-tile (FlashAttention-2
style — no (Tq, Tk) matrix ever hits HBM):

  dQ kernel   grid (B*Hq, Tq/BQ, Tk/BK), KV innermost sequential:
              dS = P * (dO V^T - D),  dQ += dS K * scale
  dKV kernel  grid (B*Hq, Tk/BK, Tq/BQ), Q innermost sequential:
              dV += P^T dO,  dK += dS^T Q * scale

where D_i = rowsum(dO * O) is precomputed in XLA. GQA: both kernels read K/V
through the same q-head -> kv-head index map as the forward; the per-q-head
dK/dV partials are summed over each GQA group outside the kernel.

Masking consistency: the forward clamps logits at the large-finite NEG instead
of -inf, so exp(S_eff - L) in the backward reproduces the forward's P exactly
(including the fully-masked-row case, where P is uniform and dS = P*(dP - D)
correctly vanishes only when dO does) — no NaN guards needed.

Softcap: S_eff = c*tanh(S/c) (+mask); backward multiplies dS_eff by
(1 - tanh^2) before the K/Q dots, matching ggml_flash_attn_ext's logit
soft-capping semantics.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import NEG, _LANE, _round_up


def _p_ds(scale, softcap, use_mask, use_slope, q, k, v, do, lrow, drow,
          m_ref, s_ref):
    """Shared tile math: returns (p, ds) both (BQ, BK) f32, with the softcap
    chain-rule factor already folded into ds (scale is applied by callers)."""
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if softcap > 0.0:
        t = jnp.tanh(s / softcap)
        se = softcap * t
    else:
        t = None
        se = s
    if use_mask:
        mb = m_ref[0].astype(jnp.float32)
        if use_slope:
            mb = mb * s_ref[0, 0]
        se = jnp.maximum(se + mb, NEG)
    p = jnp.exp(se - lrow)                                  # (BQ, BK)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - drow)
    if t is not None:
        ds = ds * (1.0 - t * t)
    return p, ds


def _kernel_dq(scale, softcap, use_mask, use_slope, *refs):
    if use_mask and use_slope:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, m_ref, s_ref,
         dq_ref, acc) = refs
    elif use_mask:
        q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, m_ref, dq_ref, acc = refs
        s_ref = None
    else:
        q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref, acc = refs
        m_ref = s_ref = None
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    lrow = lse_ref[0][:, :1]                                # (BQ, 1)
    drow = di_ref[0][:, :1]
    _, ds = _p_ds(scale, softcap, use_mask, use_slope,
                  q_ref[0], k_ref[0], v_ref[0], do_ref[0], lrow, drow,
                  m_ref, s_ref)
    acc[:] += jax.lax.dot_general(ds.astype(jnp.bfloat16), k_ref[0],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        dq_ref[0] = acc[:] * scale


def _kernel_dkv(scale, softcap, use_mask, use_slope, *refs):
    if use_mask and use_slope:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, m_ref, s_ref,
         dk_ref, dv_ref, dk_acc, dv_acc) = refs
    elif use_mask:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, m_ref,
         dk_ref, dv_ref, dk_acc, dv_acc) = refs
        s_ref = None
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
         dk_ref, dv_ref, dk_acc, dv_acc) = refs
        m_ref = s_ref = None
    qq = pl.program_id(2)

    @pl.when(qq == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    lrow = lse_ref[0][:, :1]
    drow = di_ref[0][:, :1]
    p, ds = _p_ds(scale, softcap, use_mask, use_slope,
                  q_ref[0], k_ref[0], v_ref[0], do_ref[0], lrow, drow,
                  m_ref, s_ref)
    dv_acc[:] += jax.lax.dot_general(p.astype(jnp.bfloat16), do_ref[0],
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dk_acc[:] += jax.lax.dot_general(ds.astype(jnp.bfloat16), q_ref[0],
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(qq == pl.num_programs(2) - 1)
    def _():
        dk_ref[0] = dk_acc[:] * scale
        dv_ref[0] = dv_acc[:]


@functools.partial(jax.jit, static_argnames=(
    "scale", "max_bias", "logit_softcap", "block_q", "block_k", "interpret"))
def flash_attention_bwd(q, k, v, mask, out, lse, do, *, scale, max_bias,
                        logit_softcap, block_q, block_k, interpret):
    """-> (dq, dk, dv) with the input shapes/dtypes of q/k/v.

    q (B,Tq,Hq,D), k/v (B,Tk,Hkv,D), out/do (B,Tq,Hq,D),
    lse (B*Hq, tq_padded, 8) from the forward kernel (lane-broadcast)."""
    B, Tq, Hq, D = q.shape
    _, Tk, Hkv, _ = k.shape
    rep = Hq // Hkv

    dpad = _round_up(D, _LANE)
    bq = min(block_q, _round_up(Tq, 8))
    bk = min(block_k, _round_up(Tk, _LANE))
    tq, tk = _round_up(Tq, bq), _round_up(Tk, bk)

    def pad_heads(x, t, h):
        return jnp.pad(x.astype(jnp.bfloat16).transpose(0, 2, 1, 3),
                       ((0, 0), (0, 0), (0, t - x.shape[1]), (0, dpad - D))
                       ).reshape(B * h, t, dpad)

    qh = pad_heads(q, tq, Hq)
    kh = pad_heads(k, tk, Hkv)
    vh = pad_heads(v, tk, Hkv)
    doh = pad_heads(do, tq, Hq)

    # D_i = rowsum(dO * O), f32, padded to the kernel's (B*Hq, tq) layout
    di = (do.astype(jnp.float32) * out.astype(jnp.float32)).sum(-1)
    di = jnp.pad(di.transpose(0, 2, 1), ((0, 0), (0, 0), (0, tq - Tq))
                 ).reshape(B * Hq, tq)
    # match the forward lse layout: q-rows on sublanes, 8 broadcast lanes
    di = jnp.broadcast_to(di[:, :, None], (B * Hq, tq, 8))

    use_mask = mask is not None or tk != Tk
    if use_mask:
        if mask is None:
            m3 = jnp.zeros((B, Tq, Tk), jnp.float32)
        else:
            m3 = jnp.broadcast_to(jnp.squeeze(mask, axis=1)
                                  if mask.ndim == 4 else mask, (B, Tq, Tk))
        m3 = jnp.maximum(m3.astype(jnp.float32), NEG)
        m3 = jnp.pad(m3, ((0, 0), (0, tq - Tq), (0, tk - Tk)),
                     constant_values=NEG)
    use_slope = max_bias > 0.0

    # ---- dQ kernel: grid (B*Hq, tq/bq, tk/bk), kv sequential ----
    in_specs = [
        pl.BlockSpec((1, bq, dpad), lambda bh, qq, kk: (bh, qq, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, dpad),
                     lambda bh, qq, kk: (bh // Hq * Hkv + bh % Hq // rep, kk, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, dpad),
                     lambda bh, qq, kk: (bh // Hq * Hkv + bh % Hq // rep, kk, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bq, dpad), lambda bh, qq, kk: (bh, qq, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bq, 8), lambda bh, qq, kk: (bh, qq, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bq, 8), lambda bh, qq, kk: (bh, qq, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qh, kh, vh, doh, lse, di]
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

    dqh = pl.pallas_call(
        functools.partial(_kernel_dq, scale, logit_softcap, use_mask,
                          use_slope),
        grid=(B * Hq, tq // bq, tk // bk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, dpad), lambda bh, qq, kk: (bh, qq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * Hq, tq, dpad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bq, dpad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * Hq * tq * tk * dpad,
            bytes_accessed=B * Hq * (tq * dpad * 8 + 2 * tk * dpad * 2),
            transcendentals=B * Hq * tq * tk),
        interpret=interpret,
    )(*args)

    # ---- dKV kernel: grid (B*Hq, tk/bk, tq/bq), q sequential ----
    in_specs = [
        pl.BlockSpec((1, bq, dpad), lambda bh, kk, qq: (bh, qq, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, dpad),
                     lambda bh, kk, qq: (bh // Hq * Hkv + bh % Hq // rep, kk, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, dpad),
                     lambda bh, kk, qq: (bh // Hq * Hkv + bh % Hq // rep, kk, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bq, dpad), lambda bh, kk, qq: (bh, qq, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bq, 8), lambda bh, kk, qq: (bh, qq, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bq, 8), lambda bh, kk, qq: (bh, qq, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qh, kh, vh, doh, lse, di]
    if use_mask:
        in_specs.append(pl.BlockSpec((1, bq, bk),
                                     lambda bh, kk, qq: (bh // Hq, qq, kk),
                                     memory_space=pltpu.VMEM))
        args.append(m3)
    if use_slope:
        in_specs.append(pl.BlockSpec((1, 1), lambda bh, kk, qq: (bh % Hq, 0),
                                     memory_space=pltpu.SMEM))
        args.append(slopes)

    dkh, dvh = pl.pallas_call(
        functools.partial(_kernel_dkv, scale, logit_softcap, use_mask,
                          use_slope),
        grid=(B * Hq, tk // bk, tq // bq),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, bk, dpad), lambda bh, kk, qq: (bh, kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dpad), lambda bh, kk, qq: (bh, kk, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * Hq, tk, dpad), jnp.float32),
            jax.ShapeDtypeStruct((B * Hq, tk, dpad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bk, dpad), jnp.float32),
                        pltpu.VMEM((bk, dpad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * Hq * tq * tk * dpad,
            bytes_accessed=B * Hq * (tq * dpad * 4 + 2 * tk * dpad * 10),
            transcendentals=B * Hq * tq * tk),
        interpret=interpret,
    )(*args)

    dq = (dqh.reshape(B, Hq, tq, dpad)[:, :, :Tq, :D]
          .transpose(0, 2, 1, 3).astype(q.dtype))
    # GQA: sum the per-q-head partials over each group of rep q-heads
    dk = (dkh.reshape(B, Hkv, rep, tk, dpad).sum(2)[:, :, :Tk, :D]
          .transpose(0, 2, 1, 3).astype(k.dtype))
    dv = (dvh.reshape(B, Hkv, rep, tk, dpad).sum(2)[:, :, :Tk, :D]
          .transpose(0, 2, 1, 3).astype(v.dtype))
    return dq, dk, dv
