"""Quantized matrix multiplication — the framework's hot path.

Replaces the reference's mul_mat driver + vec_dot kernels
(ggml_compute_forward_mul_mat, /root/reference/src/ggml.c:11808;
ggml_vec_dot_q4_0_q8_0, /root/reference/src/ggml-quants.c:3469) with a
TPU-native design:

- default path: dequantize-in-XLA. The unpack + scale expansion is written so
  XLA fuses it into the matmul's operand read; the MXU consumes bf16 while
  weights travel HBM->VMEM at their quantized width.
- fast path: fused Pallas kernels (ops/pallas_qmm.py) over repacked weight
  layouts. Decode GEMVs run ggml's own W4A8 math (Q8_0 activations +
  integer MXU dots, vec_dot_q4_0_q8_0) for maximum weight-stream bandwidth;
  prefill keeps activations bf16 (W4A16, strictly more accurate than the
  reference at the same weights). The quality gate (docs/QUALITY.md) pins
  both paths' whole-model PPL damage to the reference's own W4A8 contract.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..quant.device import QTensor


def _unpack_rowpair(qs, qt):
    """Decode the row-pair int4 layout (ops/pallas_qmm.repack_rowpair_device)
    back to signed values (K, N): nibble = (stored ^ 8) - 8; interleave the
    byte's two rows; undo the u = e*NB + b row permutation."""
    bk = qt.interleaved_bk
    nb = bk // 32
    lo = ((qs & 0x0F) ^ 8).astype(jnp.int8) - 8
    hi = ((qs >> 4) ^ 8).astype(jnp.int8) - 8
    u = jnp.stack([lo, hi], axis=1).reshape(qt.k, qt.n)      # u-order rows
    return (u.reshape(qt.k // bk, 32, nb, qt.n)
            .transpose(0, 2, 1, 3).reshape(qt.k, qt.n))


def dequantize_xla(qt: QTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Expand a QTensor to a dense (K, N) array inside a traced computation.
    XLA fuses this into the consuming matmul."""
    if qt.kind == "dense":
        return jnp.asarray(qt.q, dtype=dtype)

    scale = jnp.asarray(qt.scale)
    n_groups = scale.shape[0]
    group = qt.k // n_groups

    if qt.kind == "nib2":
        # compressed IQ2 residency (quant/device.py): 2-bit codebook index
        # + sign bitplane; w = ±lut4[q2] * scale. XLA fuses the expansion
        # into the consuming matmul, so HBM traffic stays at the packed
        # width (the analog of ggml-cuda/vecdotq.cuh streaming compressed).
        qs = jnp.asarray(qt.q)                                   # (K/4, N)
        e = jnp.stack([(qs >> (2 * j)) & 3 for j in range(4)],
                      axis=1).reshape(qt.k, qt.n)
        mag = jnp.take(jnp.asarray(qt.lut), e)
        sb = jnp.asarray(qt.signs)                               # (K/8, N)
        neg = jnp.stack([(sb >> j) & 1 for j in range(8)],
                        axis=1).reshape(qt.k, qt.n)
        q = jnp.where(neg == 1, -mag, mag)
    elif qt.kind == "nib4" and qt.lut is not None:
        # compressed IQ3 residency: 4-bit sign+magnitude codebook index
        qs = jnp.asarray(qt.q)                                   # (K/2, N)
        g = qs.reshape(qt.k // 32, 16, qt.n)
        idx = jnp.concatenate([g & 0x0F, g >> 4], axis=1) \
            .reshape(qt.k, qt.n)
        q = jnp.take(jnp.asarray(qt.lut), idx)
    elif qt.kind == "nib4":
        qs = jnp.asarray(qt.q)                                   # (K/2, N)
        if qt.q4_layout == 3:
            # natural-pair layout (repack_natpair_device): byte row i packs
            # elements (2i, 2i+1) XOR 8 — no row permutation to undo
            lo = ((qs & 0x0F) ^ 8).astype(jnp.int8) - 8
            hi = ((qs >> 4) ^ 8).astype(jnp.int8) - 8
            q = jnp.stack([lo, hi], axis=1).reshape(qt.k, qt.n)
        elif qt.q4_layout == 1:
            q = _unpack_rowpair(qs, qt)
        else:
            if qt.interleaved_bk:
                # undo the fused-kernel tile interleave (repack_interleaved)
                nb = qt.interleaved_bk // 32
                qs = (qs.reshape(qt.k // qt.interleaved_bk, 16, nb, qt.n)
                      .transpose(0, 2, 1, 3).reshape(qt.k // 2, qt.n))
            g = qs.reshape(qt.k // 32, 16, qt.n)
            lo = (g & 0x0F).astype(jnp.int8) - qt.zero
            hi = (g >> 4).astype(jnp.int8) - qt.zero
            q = jnp.concatenate([lo, hi], axis=1).reshape(qt.k, qt.n)
    elif qt.kind == "int8":
        q = jnp.asarray(qt.q)                                    # (K, N) int8
        if qt.q4_layout == 2:
            # undo the u-order row permutation (repack_int8_rows_device)
            bk = qt.interleaved_bk
            nb = bk // group
            q = (q.reshape(qt.k // bk, group, nb, qt.n)
                 .transpose(0, 2, 1, 3).reshape(qt.k, qt.n))
    else:
        raise ValueError(qt.kind)

    w = q.reshape(n_groups, group, qt.n).astype(dtype) * scale.astype(dtype)[:, None, :]
    if qt.bias is not None:
        w = w + jnp.asarray(qt.bias).astype(dtype)[:, None, :]
    return w.reshape(qt.k, qt.n)


def _leading(x) -> int:
    """Product of leading (non-contraction) dims — the GEMM m."""
    m = 1
    for d in x.shape[:-1]:
        m *= int(d)
    return m


# optional activation observer for imatrix collection (quant/imatrix.py):
# called as observer(qt, x) on every qmatmul. None = disabled (zero cost).
_activation_observer = None

# optional activation-quantization simulation for the quality gate
# (tools/quality_gate.py): "w4a8" reproduces the reference's Q8_0 activation
# quantization (quantize_row_q8_0, /root/reference/src/ggml-quants.c:440) in
# value terms before every quantized matmul, so whole-model PPL can be
# compared between ggml's W4A8 integer-dot math and this repo's W4A16 path.
_activation_sim = None


def set_activation_sim(mode):
    """None (production) or "w4a8" (ggml vec_dot activation-quant sim)."""
    global _activation_sim
    assert mode in (None, "w4a8"), mode
    _activation_sim = mode


def _q8_0_sim(x):
    """Per-32 symmetric int8 round-trip, d = amax/127 (quantize_row_q8_0
    semantics; jnp.round is round-half-even vs the reference's roundf —
    half-integer quotients are measure-zero on real activations)."""
    lead = x.shape[:-1]
    xr = x.astype(jnp.float32).reshape(*lead, -1, 32)
    amax = jnp.max(jnp.abs(xr), axis=-1, keepdims=True)
    d = amax / 127.0
    q = jnp.where(d > 0, jnp.round(xr / jnp.where(d > 0, d, 1.0)), 0.0)
    return (q * d).reshape(x.shape)


# dryrun/test hook: route interleaved QTensors through the fused Pallas path
# even off-TPU (the kernels run in interpret mode there). Lets the multichip
# dryrun prove the repacked layouts + GSPMD shardings compose without chips.
_force_fused = False


def set_force_fused(enable: bool):
    global _force_fused
    _force_fused = bool(enable)


def set_activation_observer(fn):
    """Install/remove (None) the qmatmul activation observer. Used by
    ImatrixCollector — the analog of llama.cpp's imatrix eval callback
    feeding ggml_quantize_chunk's quant_weights (ggml.h:2251)."""
    global _activation_observer
    _activation_observer = fn


@jax.custom_vjp
def _qmm_fused(x: jax.Array, qt: QTensor) -> jax.Array:
    from .pallas_qmm import qmatmul_pallas
    return qmatmul_pallas(x, qt)


def _qmm_fused_fwd(x, qt):
    # zero-size carrier keeps x's dtype in the residuals (raw dtypes are not
    # valid JAX residual types)
    return _qmm_fused(x, qt), (qt, jnp.zeros((0,), x.dtype))


def _qmm_fused_bwd(res, dy):
    """Dequant-weight VJP: dx = dy @ W^T with W expanded lazily in XLA (the
    backward analog of the reference's autodiff-through-mul_mat,
    ggml_compute_backward MUL_MAT adjoint /root/reference/src/ggml.c:18179).
    Quantized weights are frozen: integer leaves get float0 cotangents,
    float leaves (scales/bias) zeros."""
    qt, x_carrier = res
    w = dequantize_xla(qt, dtype=jnp.bfloat16)            # fused into the dot
    dx = jnp.matmul(dy.astype(jnp.bfloat16), w.T,
                    preferred_element_type=jnp.float32).astype(x_carrier.dtype)

    def zero_ct(a):
        if a is None:
            return None
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.inexact):
            return jnp.zeros_like(a)
        import numpy as _np
        return _np.zeros(_np.shape(a), jax.dtypes.float0)

    return dx, jax.tree.map(zero_ct, qt)


_qmm_fused.defvjp(_qmm_fused_fwd, _qmm_fused_bwd)


def qmatmul(x: jax.Array, qt: QTensor, *, compute_dtype=jnp.bfloat16,
            out_dtype=None, precision=None) -> jax.Array:
    """x @ dequant(W). x: (..., K) -> (..., N).

    compute_dtype: operand precision fed to the MXU (bf16 default; float32 +
    precision="highest" for differential tests). Accumulation is always f32.
    """
    out_dtype = out_dtype or x.dtype
    if _activation_observer is not None:
        _activation_observer(qt, x)
    if _activation_sim == "w4a8" and qt.kind != "dense":
        x = _q8_0_sim(x)
    # fused-kernel fast path: block-interleaved weights (repack_interleaved /
    # params_repack_device at load) on a real TPU. Measured (v5e, K=4096
    # N=16384 GEMV): 0.097 ms rowpair vs 0.209 ms dense-bf16 vs 0.390 ms
    # XLA-fused — the mmvq/mmq dispatch of the reference
    # (ggml-cuda.cu:1867-1960). The kernel covers every m (the reference's
    # mmq does too): up to 512 rows run as one VMEM-resident tile; larger m
    # is split into 512-row tiles by the kernel's m-grid (pallas_qmm
    # ._m_tiling), each amortizing its weight stream over 512 rows.
    if (qt.kind in ("nib4", "int8") and qt.interleaved_bk > 0
            and (jax.devices()[0].platform == "tpu" or _force_fused)
            and qt.n % 128 == 0):
        return _qmm_fused(x, qt).astype(out_dtype)
    w = dequantize_xla(qt, dtype=compute_dtype)
    y = jnp.matmul(x.astype(compute_dtype), w,
                   preferred_element_type=jnp.float32, precision=precision)
    return y.astype(out_dtype)


def qmatmul_stacked(x: jax.Array, qt: QTensor, li, *,
                    compute_dtype=jnp.bfloat16) -> jax.Array:
    """x @ dequant(W[li]) over a stacked QTensor (quant.device.stack_layers):
    the layer is selected by a scalar-prefetched index inside the fused
    kernels, so lax.scan-over-layers streams each layer's tiles straight
    from the stacked HBM buffer. Off-TPU (and for layouts without a stacked
    kernel) falls back to a dynamic-slice + XLA-dequant matmul. Returns f32."""
    import os
    if (qt.kind in ("nib4", "int8") and qt.interleaved_bk > 0
            and qt.q4_layout in (3, 4) and qt.n % 128 == 0
            and os.environ.get("GGML_STACKED_FALLBACK", "0") != "1"
            and (jax.devices()[0].platform == "tpu" or _force_fused)):
        from .pallas_qmm import qmatmul_stacked as _stk
        return _stk(x, qt, li)
    from ..quant.device import index_stacked
    w = dequantize_xla(index_stacked(qt, li), dtype=compute_dtype)
    return jnp.matmul(x.astype(compute_dtype), w,
                      preferred_element_type=jnp.float32)
