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


# ---- IQ4_NL (added after golden_quant.npz was generated; verified bit-exact
# against the compiled reference for both entry points — the ntry=7 chunk
# path (ggml_quantize_chunk/quantize_iq4_nl) and the ntry=-1 row path —
# except the reference's undefined-behavior case of an all-zero FIRST block
# (packs uninitialized stack memory with d=0) ----

def test_iq4_nl_roundtrip_and_layout(rng):
    from ggml_imax_tpu.quant import codecs
    from ggml_imax_tpu.quant.formats import FORMATS, GGMLType
    x = (rng.standard_normal(2048) * 0.8).astype(np.float32)
    raw = codecs.quantize(x, GGMLType.IQ4_NL)
    assert raw.nbytes == 2048 // 32 * FORMATS[GGMLType.IQ4_NL].type_size
    y = codecs.dequantize(raw, GGMLType.IQ4_NL)
    rmse = np.sqrt(np.mean((x - y) ** 2))
    assert rmse < 0.002 * 40   # same contract family as 4-bit formats
    # nonlinear grid: dequantized values / d must lie on the kvalues table
    blk = raw.view(codecs.BLOCK_DTYPES[GGMLType.IQ4_NL])
    d = blk["d"].astype(np.float32)
    vals = set(codecs.KVALUES_IQ4NL.tolist())
    lv = np.concatenate([blk["qs"] & 0xF, blk["qs"] >> 4], axis=1)
    assert set(np.unique(lv)).issubset(set(range(16)))
    ratio = y.reshape(-1, 32) / np.where(d == 0, 1, d)[:, None]
    assert set(np.rint(ratio[d != 0]).astype(int).ravel()).issubset(vals)


def test_iq4_nl_dead_block_semantics(rng):
    from ggml_imax_tpu.quant import codecs
    from ggml_imax_tpu.quant.formats import GGMLType
    x = (rng.standard_normal(128) * 0.5).astype(np.float32)
    x[32:64] = 0.0                     # dead block NOT first
    raw = codecs.quantize_iq4_nl(x, ntry=-1)
    blk = raw.reshape(-1, 18)
    assert blk[1, :2].view(np.float16)[0] == 0          # d == 0
    np.testing.assert_array_equal(blk[1, 2:], blk[0, 2:])  # stale-L quirk
    y = codecs.dequantize(raw, GGMLType.IQ4_NL)
    np.testing.assert_array_equal(y[32:64], 0.0)


def test_iq4_xs_roundtrip_and_device(rng):
    """IQ4_XS (super-block IQ4_NL) — verified bit-exact vs the compiled
    reference's quantize_iq4_xs/dequantize_row_iq4_xs during development;
    here: layout, round-trip error contract, device decode consistency."""
    from ggml_imax_tpu.quant import codecs
    from ggml_imax_tpu.quant.device import dequantize_qtensor, quantize_for_device
    from ggml_imax_tpu.quant.formats import FORMATS, GGMLType
    x = (rng.standard_normal(2048) * 0.7).astype(np.float32)
    x[256:288] = 0.0
    raw = codecs.quantize(x, GGMLType.IQ4_XS)
    assert raw.nbytes == 2048 // 256 * FORMATS[GGMLType.IQ4_XS].type_size
    y = codecs.dequantize(raw, GGMLType.IQ4_XS)
    assert np.sqrt(np.mean((x - y) ** 2)) < 0.08
    np.testing.assert_array_equal(y[256:288], 0.0)
    w = x.reshape(8, 256).T                   # (K=256, N=8) device layout
    qt = quantize_for_device(w, GGMLType.IQ4_XS)
    ref = codecs.dequantize(codecs.quantize(np.ascontiguousarray(w.T),
                                            GGMLType.IQ4_XS),
                            GGMLType.IQ4_XS, shape=(8, 256)).T
    np.testing.assert_allclose(dequantize_qtensor(qt), ref, rtol=1e-6)


@pytest.mark.parametrize("name,t", [("iq2_xxs", "IQ2_XXS"),
                                    ("iq2_xs", "IQ2_XS"),
                                    ("iq3_xxs", "IQ3_XXS"),
                                    ("iq2_s", "IQ2_S"),
                                    ("iq3_s", "IQ3_S"),
                                    ("iq1_s", "IQ1_S"),
                                    ("iq1_m", "IQ1_M")])
def test_iq_codebook_dequant_golden(name, t):
    """IQ2_XXS/IQ2_XS/IQ3_XXS decode vs reference golden vectors
    (decode-only formats; encoders require imatrix grid search)."""
    from ggml_imax_tpu.quant import codecs
    from ggml_imax_tpu.quant.formats import GGMLType
    import pathlib
    g = np.load(pathlib.Path(__file__).parent / "fixtures/golden_iq.npz")
    tt = getattr(GGMLType, t)
    mine = codecs.dequantize(g[f"{name}_bytes"], tt)
    np.testing.assert_array_equal(g[f"{name}_dequant"], mine)
    from ggml_imax_tpu.quant.imatrix import quantize_requires_imatrix
    # reference-exact semantics (ggml.c:21586): only IQ2_XXS/IQ2_XS/IQ1_S
    # hard-require the imatrix; the others accept qw=None
    expected = tt.name in ("IQ2_XXS", "IQ2_XS", "IQ1_S")
    assert quantize_requires_imatrix(tt) == expected
