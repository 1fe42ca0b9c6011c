"""Differential tests: Pallas flash attention vs the XLA reference.

Mirrors the reference's flash_attn_ext sweep in tests/test-backend-ops.cpp:1508
(head sizes x kv lengths x GQA x mask/ALiBi/softcap), with NMSE tolerances in
the spirit of test-backend-ops.cpp:288.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from ggml_imax_tpu.ops.attention import attention_xla, causal_mask
from ggml_imax_tpu.ops.flash_attention import flash_attention


def nmse(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    denom = np.mean(a * a) + 1e-30
    return float(np.mean((a - b) ** 2) / denom)


def make_qkv(rng, b, tq, tk, hq, hkv, d):
    # bf16 inputs for both paths: the kernel computes in bf16 (MXU native),
    # so the differential isolates algorithmic error, not input rounding
    q = rng.standard_normal((b, tq, hq, d)).astype(np.float32)
    k = rng.standard_normal((b, tk, hkv, d)).astype(np.float32)
    v = rng.standard_normal((b, tk, hkv, d)).astype(np.float32)
    return (jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
            jnp.asarray(v, jnp.bfloat16))


CASES = [
    # b, tq, tk, hq, hkv, d       (reference sweep: head 64..256, GQA reps)
    (1, 8, 8, 2, 2, 64),
    (1, 16, 48, 4, 4, 80),       # non-128 head dim, ragged kv
    (2, 32, 64, 8, 2, 64),       # GQA 4x
    (1, 1, 96, 4, 1, 128),       # decode step (tq=1), MQA
    (1, 130, 130, 2, 2, 128),    # non-multiple of block sizes
    (1, 64, 256, 4, 4, 256),     # gpt-j head size
]


@pytest.mark.parametrize("b,tq,tk,hq,hkv,d", CASES)
def test_flash_matches_xla_causal(rng, b, tq, tk, hq, hkv, d):
    q, k, v = make_qkv(rng, b, tq, tk, hq, hkv, d)
    n_past = tk - tq
    mask = causal_mask(tq, tk, n_past)[None, None]
    ref = attention_xla(q, k, v, mask, out_dtype=jnp.float32)
    got = flash_attention(q, k, v, mask, out_dtype=jnp.float32,
                          block_q=64, block_k=128, interpret=True)
    assert nmse(ref, got) < 5e-5  # bf16 P.V on MXU; ref uses looser flash tol too (test-backend-ops)


def test_flash_no_mask(rng):
    q, k, v = make_qkv(rng, 2, 24, 24, 4, 4, 64)
    ref = attention_xla(q, k, v, None, out_dtype=jnp.float32)
    got = flash_attention(q, k, v, None, out_dtype=jnp.float32,
                          block_q=16, block_k=128, interpret=True)
    assert nmse(ref, got) < 5e-5  # bf16 P.V on MXU; ref uses looser flash tol too (test-backend-ops)


def test_flash_softcap(rng):
    q, k, v = make_qkv(rng, 1, 16, 32, 2, 2, 64)
    mask = causal_mask(16, 32, 16)[None, None]
    ref = attention_xla(q, k, v, mask, logit_softcap=30.0, out_dtype=jnp.float32)
    got = flash_attention(q, k, v, mask, logit_softcap=30.0,
                          out_dtype=jnp.float32, interpret=True)
    assert nmse(ref, got) < 5e-5  # bf16 P.V on MXU; ref uses looser flash tol too (test-backend-ops)


def test_flash_alibi(rng):
    b, tq, tk, h, d = 1, 16, 16, 8, 64
    q, k, v = make_qkv(rng, b, tq, tk, h, h, d)
    # ggml-style ALiBi: mask carries positional distances, slope multiplies it
    pos = (np.arange(tk)[None, :] - np.arange(tq)[:, None] - (tk - tq)).astype(np.float32)
    pos = np.where(pos > 0, -np.inf, pos)
    mask = jnp.asarray(pos)[None, None]
    ref = attention_xla(q, k, v, mask, max_bias=8.0, out_dtype=jnp.float32)
    got = flash_attention(q, k, v, mask, max_bias=8.0, out_dtype=jnp.float32,
                          interpret=True)
    assert nmse(ref, got) < 5e-5  # bf16 P.V on MXU; ref uses looser flash tol too (test-backend-ops)


def test_flash_custom_scale(rng):
    q, k, v = make_qkv(rng, 1, 8, 8, 2, 2, 64)
    ref = attention_xla(q, k, v, None, scale=0.25, out_dtype=jnp.float32)
    got = flash_attention(q, k, v, None, scale=0.25, out_dtype=jnp.float32,
                          interpret=True)
    assert nmse(ref, got) < 5e-5  # bf16 P.V on MXU; ref uses looser flash tol too (test-backend-ops)
