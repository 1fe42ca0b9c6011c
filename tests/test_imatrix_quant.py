"""Imatrix-weighted quantizer golden tests.

Mirrors the reference's requantization contract: ggml_quantize_chunk with a
quant_weights array dispatches to the imatrix-aware per-row quantizers
(quantize_q4_K -> quantize_row_q4_K_impl, /root/reference/src/ggml-quants.c:2226
and siblings). Fixture golden_imatrix.npz holds the compiled reference
encoder's output bytes (recipe: tests/fixtures/README_golden_imatrix.txt);
our encoders must be bit-exact.
"""
from pathlib import Path

import numpy as np
import pytest

from ggml_imax_tpu.quant import codecs
from ggml_imax_tpu.quant.formats import FORMATS, GGMLType
from ggml_imax_tpu.quant.imatrix import (_IMATRIX_QUANTIZERS, quantize_rows,
                                         quantize_requires_imatrix)

FIX = Path(__file__).parent / "fixtures" / "golden_imatrix.npz"
GOLD = np.load(FIX)

CASES = {
    GGMLType.Q4_0: "q4_0", GGMLType.Q4_1: "q4_1",
    GGMLType.Q5_0: "q5_0", GGMLType.Q5_1: "q5_1",
    GGMLType.Q2_K: "q2_K", GGMLType.Q3_K: "q3_K", GGMLType.Q4_K: "q4_K",
    GGMLType.Q5_K: "q5_K", GGMLType.Q6_K: "q6_K",
    GGMLType.IQ4_NL: "iq4_nl", GGMLType.IQ4_XS: "iq4_xs",
}


@pytest.mark.parametrize("t", list(CASES), ids=[CASES[t] for t in CASES])
def test_imatrix_quantize_bit_exact(t):
    x = GOLD["x"]
    qw = GOLD["qw"]
    ours = quantize_rows(x, t, qw)
    ref = GOLD[f"{CASES[t]}_bytes"]
    assert ours.dtype == np.uint8 and ours.shape == ref.shape
    assert np.array_equal(ours, ref), \
        f"{t.name}: {np.count_nonzero(ours != ref)}/{len(ref)} bytes differ"


@pytest.mark.parametrize("t", list(CASES), ids=[CASES[t] for t in CASES])
def test_imatrix_roundtrip_rmse(t):
    """Quantization contract sanity: imatrix-weighted encodes still decode
    within the reference RMSE thresholds (test-quantize-fns.cpp:16-20)."""
    x = GOLD["x"]
    qw = GOLD["qw"]
    enc = quantize_rows(x, t, qw)
    dec = codecs.dequantize(enc, t).reshape(x.shape)
    scale = np.abs(x).max()
    rmse = np.sqrt(np.mean((dec - x) ** 2)) / scale
    bits = {GGMLType.Q2_K: 0.06, GGMLType.Q3_K: 0.02}.get(t, 0.01)
    assert rmse < bits, (t.name, rmse)


def test_imatrix_improves_weighted_error():
    """The weighted encoder must beat the plain encoder on weighted MSE for
    a strongly non-uniform importance vector — the point of the imatrix."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((8, 1024)).astype(np.float32)
    qw = np.full(1024, 1e-3, np.float32)
    qw[::7] = 10.0                        # a few columns matter a lot
    for t in (GGMLType.Q4_0, GGMLType.Q4_K, GGMLType.Q2_K):
        plain = codecs.dequantize(codecs.quantize(x, t), t).reshape(x.shape)
        weighted = codecs.dequantize(quantize_rows(x, t, qw), t).reshape(x.shape)
        err_plain = (qw * (plain - x) ** 2).sum()
        err_weighted = (qw * (weighted - x) ** 2).sum()
        assert err_weighted < err_plain, (t.name, err_weighted, err_plain)


def test_quantize_rows_shapes_and_fallback():
    x = GOLD["x"]
    # q8_0 has no imatrix path in the reference — must silently fall back
    out = quantize_rows(x, GGMLType.Q8_0, GOLD["qw"])
    assert np.array_equal(out, codecs.quantize(x, GGMLType.Q8_0))
    # every encodable imatrix format has the right row size
    for t in _IMATRIX_QUANTIZERS:
        fmt = FORMATS[t]
        got = quantize_rows(x, t, GOLD["qw"])
        assert got.size == x.shape[0] * (x.shape[1] // fmt.block_size) * fmt.type_size
