"""Differential tests: C++ native codecs vs the golden-tested numpy codecs.

The numpy codecs are bit-exact vs the compiled reference (golden_quant.npz),
so byte-equality here transitively proves the native library matches
src/ggml-quants.c.
"""
import numpy as np
import pytest

from ggml_imax_tpu.native import lib
from ggml_imax_tpu.quant import codecs
from ggml_imax_tpu.quant.formats import FORMATS, GGMLType

pytestmark = pytest.mark.skipif(lib() is None,
                                reason="no native toolchain available")

QUANT_TYPES = [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
               GGMLType.Q8_0, GGMLType.Q8_1, GGMLType.Q2_K, GGMLType.Q3_K,
               GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q8_K]
DEQ_TYPES = QUANT_TYPES


def interesting_data(rng, n):
    """Stress rounding edges: normals, tiny, huge, ties, zero blocks."""
    x = rng.standard_normal(n).astype(np.float32)
    x[: n // 8] = 0.0                                       # d == 0 path
    x[n // 8: n // 4] *= 1e-18   # tiny but finite squares (f32 denormal floor)
    x[n // 4: 3 * n // 8] *= 1e5                            # large scales
    x[3 * n // 8: n // 2] = np.round(x[3 * n // 8: n // 2] * 2) / 2  # .5 ties
    return x


@pytest.mark.parametrize("t", QUANT_TYPES, ids=lambda t: t.name)
def test_native_quantize_bit_exact(rng, t):
    x = interesting_data(rng, 256 * 64)
    ref = codecs._QUANTIZERS[t](x).reshape(-1)
    nat = codecs._native_quantize(x, t)
    assert nat is not None
    np.testing.assert_array_equal(np.asarray(ref), nat)


@pytest.mark.parametrize("t", DEQ_TYPES, ids=lambda t: t.name)
def test_native_dequantize_bit_exact(rng, t):
    x = interesting_data(rng, 256 * 64)
    raw = codecs._QUANTIZERS[t](x).reshape(-1)
    ref = codecs._DEQUANTIZERS[t](raw)
    nat = codecs._native_dequantize(raw, t)
    assert nat is not None
    np.testing.assert_array_equal(ref, nat)


def test_f16_conversions_bit_exact(rng):
    import ctypes
    cdll = lib()
    # all 65536 fp16 bit patterns -> f32 must match numpy
    h = np.arange(65536, dtype=np.uint16)
    out = np.empty(65536, np.float32)
    cdll.f16_row_to_f32(h.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        ctypes.c_int64(65536))
    ref = h.view(np.float16).astype(np.float32)
    np.testing.assert_array_equal(ref[~np.isnan(ref)], out[~np.isnan(out)])
    assert np.array_equal(np.isnan(ref), np.isnan(out))

    # f32 -> f16 on adversarial values incl. rounding ties and subnormals
    x = np.concatenate([
        interesting_data(rng, 4096),
        np.asarray([0.0, -0.0, 65504.0, 65520.0, 1e-8, -1e-8, 6e-5],
                   np.float32)])
    got = np.empty(x.size, np.uint16)
    cdll.f32_row_to_f16(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        got.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                        ctypes.c_int64(x.size))
    with np.errstate(over="ignore"):
        np.testing.assert_array_equal(x.astype(np.float16).view(np.uint16), got)


def test_public_api_uses_native_and_matches(rng):
    """quantize()/dequantize() must give identical bytes with native on/off."""
    import ggml_imax_tpu.native as native
    x = interesting_data(rng, 256 * 16)
    for t in DEQ_TYPES:
        raw = codecs.quantize(x, t)
        back = codecs.dequantize(raw, t)
        ref_raw = codecs._QUANTIZERS[t](x).reshape(-1)
        ref_back = codecs._DEQUANTIZERS[t](ref_raw)
        np.testing.assert_array_equal(np.asarray(ref_raw), raw, err_msg=str(t))
        np.testing.assert_array_equal(ref_back, back, err_msg=str(t))
