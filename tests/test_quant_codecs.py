"""Quantization codec tests.

Two layers of guarantees:
1. Bit-exactness against golden vectors produced by the compiled reference
   quantizers (tests/fixtures/golden_quant.npz) — encode and decode.
2. The reference's portable accuracy contract (test-quantize-fns.cpp:16-22):
   round-trip RMSE thresholds per bit-width on the reference's synthetic data.
"""
import numpy as np
import pytest

from ggml_imax_tpu.quant import GGMLType, codecs, row_size, type_from_name

GOLDEN = np.load("tests/fixtures/golden_quant.npz")
ALL_TYPES = ["q4_0", "q4_1", "q5_0", "q5_1", "q8_0", "q8_1",
             "q2_K", "q3_K", "q4_K", "q5_K", "q6_K", "q8_K"]
DATASETS = ["x", "x2", "x3"]

# reference thresholds: tests/test-quantize-fns.cpp:16-22
MAX_TOTAL_ERROR = {
    "q2_K": 0.0075, "q3_K": 0.0040,
}
DEFAULT_TOTAL_ERROR = 0.002


def synthetic_data(n, offset=0.0):
    # reference generate_data: 0.1 + 2*cos(i + offset) (test-quantize-fns.cpp)
    i = np.arange(n, dtype=np.float32)
    return (0.1 + 2.0 * np.cos(i + offset)).astype(np.float32)


def ref_error_metric(a, b):
    # reference array_rmse (test-quantize-fns.cpp:35-42): sqrt(sum(diff^2)) / n
    d = a.astype(np.float64) - b.astype(np.float64)
    return float(np.sqrt(np.sum(d * d)) / len(a))


@pytest.mark.parametrize("dataset", DATASETS)
@pytest.mark.parametrize("name", ALL_TYPES)
def test_encode_bit_exact(name, dataset):
    t = type_from_name(name)
    x = GOLDEN[dataset]
    mine = codecs.quantize(x, t)
    ref = GOLDEN[f"{dataset}_{name}_bytes"]
    assert np.array_equal(mine, ref), f"{name} encode differs from reference on {dataset}"


@pytest.mark.parametrize("dataset", DATASETS)
@pytest.mark.parametrize("name", ALL_TYPES)
def test_decode_bit_exact(name, dataset):
    t = type_from_name(name)
    ref_bytes = GOLDEN[f"{dataset}_{name}_bytes"]
    mine = codecs.dequantize(ref_bytes, t)
    ref = GOLDEN[f"{dataset}_{name}_dequant"]
    assert np.array_equal(mine, ref), f"{name} dequant differs from reference on {dataset}"


@pytest.mark.parametrize("offset", [0.0, 1.0])
@pytest.mark.parametrize("name", ALL_TYPES)
def test_round_trip_rmse_contract(name, offset):
    # exact analog of the reference's total_quantization_error test
    # (test-quantize-fns.cpp:45-51, 145): test_size=32*128, thresholds :16-20
    t = type_from_name(name)
    x = synthetic_data(32 * 128, offset)
    y = codecs.dequantize(codecs.quantize(x, t), t)
    err = ref_error_metric(x, y)
    limit = MAX_TOTAL_ERROR.get(name, DEFAULT_TOTAL_ERROR)
    assert err < limit, f"{name}: error {err:.6f} over limit {limit}"


@pytest.mark.parametrize("name", ALL_TYPES)
def test_row_size(name):
    t = type_from_name(name)
    x = synthetic_data(1024)
    raw = codecs.quantize(x, t)
    assert raw.nbytes == row_size(t, 1024)


def test_f16_f32_bf16_codecs():
    x = synthetic_data(256)
    assert np.array_equal(codecs.dequantize(codecs.quantize(x, GGMLType.F32), GGMLType.F32), x)
    y = codecs.dequantize(codecs.quantize(x, GGMLType.F16), GGMLType.F16)
    assert np.allclose(x, y, atol=2e-3)
    z = codecs.dequantize(codecs.quantize(x, GGMLType.BF16), GGMLType.BF16)
    assert np.allclose(x, z, atol=2e-2)


def test_zero_and_constant_blocks():
    for name in ALL_TYPES:
        t = type_from_name(name)
        x = np.zeros(512, dtype=np.float32)
        y = codecs.dequantize(codecs.quantize(x, t), t)
        assert np.all(np.isfinite(y)), name
        assert np.abs(y).max() < 1e-6, name

        x = np.full(512, 2.5, dtype=np.float32)
        y = codecs.dequantize(codecs.quantize(x, t), t)
        assert np.all(np.isfinite(y)), name
        assert np.abs(y - 2.5).max() < 0.3, name
