"""IQ codebook encoders (IQ2_XXS/XS/S, IQ3_XXS/S, IQ1_S/M).

Golden-tested bit-exact against the compiled reference encoders
(quantize_iq2_xxs and siblings, /root/reference/src/ggml-quants.c:12529+);
fixture recipe in tests/fixtures/README_golden_iq.txt. Also exercises the
full requantize path: F16 GGUF -> IQ2_XS with an imatrix (the
ggml_quantize_requires_imatrix formats become encodable).
"""
import pathlib

import numpy as np
import pytest

from ggml_imax_tpu.quant import codecs
from ggml_imax_tpu.quant.formats import GGMLType, row_size
from ggml_imax_tpu.quant.imatrix import (quantize_requires_imatrix,
                                         quantize_rows)
from ggml_imax_tpu.quant.iq_encode import available, quantize_iq

FIX = pathlib.Path(__file__).parent / "fixtures" / "golden_iq_encode.npz"

needs_native = pytest.mark.skipif(not available(),
                                  reason="native IQ encoder lib unavailable")

CASES = [
    ("iq2_xxs", GGMLType.IQ2_XXS, True),
    ("iq2_xs", GGMLType.IQ2_XS, True),
    ("iq2_s", GGMLType.IQ2_S, True),
    ("iq3_xxs", GGMLType.IQ3_XXS, True),
    ("iq3_s", GGMLType.IQ3_S, True),
    ("iq1_s", GGMLType.IQ1_S, True),
    ("iq1_m", GGMLType.IQ1_M, True),
    ("iq2_s", GGMLType.IQ2_S, False),
    ("iq3_xxs", GGMLType.IQ3_XXS, False),
    ("iq3_s", GGMLType.IQ3_S, False),
    ("iq1_m", GGMLType.IQ1_M, False),
]


@needs_native
@pytest.mark.parametrize("name,t,with_qw", CASES,
                         ids=[f"{c[0]}{'' if c[2] else '-noqw'}"
                              for c in CASES])
def test_iq_encode_bit_exact(name, t, with_qw):
    z = np.load(FIX)
    x, qw = z["x"], z["qw"]
    got = quantize_iq(x, t, qw if with_qw else None).reshape(-1)
    ref = z[f"{name}_bytes" + ("" if with_qw else "_noqw")]
    assert np.array_equal(got, ref), (
        t.name, with_qw, int((got != ref).sum()))


@needs_native
@pytest.mark.parametrize("t", [GGMLType.IQ2_XXS, GGMLType.IQ2_S,
                               GGMLType.IQ3_S, GGMLType.IQ1_M])
def test_iq_encode_decode_roundtrip(t):
    """our encoder -> our decoder: reconstruction error within the format's
    expected distortion (2-bit formats are lossy by design; the gate here is
    sanity, the exactness gate is the golden test above)."""
    z = np.load(FIX)
    x, qw = z["x"], z["qw"]
    enc = quantize_iq(x, t, qw)
    dec = codecs.dequantize(enc.reshape(-1), t, shape=x.shape)
    # scale-normalized RMSE; IQ1/IQ2 are sub-2.1 bpw codebooks
    rmse = float(np.sqrt(np.mean((dec - x) ** 2)) / np.sqrt(np.mean(x * x)))
    assert rmse < 0.75, (t.name, rmse)


@needs_native
def test_quantize_rows_routes_iq():
    z = np.load(FIX)
    x, qw = z["x"], z["qw"]
    enc = quantize_rows(x, GGMLType.IQ2_XS, imatrix=qw)
    assert enc.nbytes == x.shape[0] * row_size(GGMLType.IQ2_XS, x.shape[1])
    with pytest.raises(ValueError):
        quantize_rows(x, GGMLType.IQ2_XS)      # imatrix required


def test_requires_imatrix_matches_reference():
    """ggml_quantize_requires_imatrix (ggml.c:21586)."""
    assert quantize_requires_imatrix(GGMLType.IQ2_XXS)
    assert quantize_requires_imatrix(GGMLType.IQ2_XS)
    assert quantize_requires_imatrix(GGMLType.IQ1_S)
    assert not quantize_requires_imatrix(GGMLType.IQ1_M)
    assert not quantize_requires_imatrix(GGMLType.IQ2_S)
    assert not quantize_requires_imatrix(GGMLType.Q4_0)


@needs_native
def test_requantize_gguf_to_iq2_xs(tmp_path, rng):
    """VERDICT gate: requantize a synthetic F16 GGUF to an IQ format with an
    imatrix, then load and decode the result."""
    from ggml_imax_tpu.io.gguf import GGUFReader, GGUFWriter
    from ggml_imax_tpu.tools.quantize import requantize_gguf

    rng = np.random.default_rng(7)
    n, rows = 512, 8
    x = (rng.standard_normal((rows, n)) * 0.1).astype(np.float32)
    src, dst = tmp_path / "src.gguf", tmp_path / "dst.gguf"
    w = GGUFWriter(src)
    w.add_kv("general.architecture", "test")
    w.add_tensor("blk.0.attn.weight",
                 x.astype(np.float16).view(np.uint8).reshape(-1),
                 GGMLType.F16, shape=(n, rows))
    w.write()

    qw = np.abs(rng.standard_normal(n)).astype(np.float32) + 0.05
    stats = requantize_gguf(src, dst, GGMLType.IQ2_XS,
                            imatrix={"blk.0.attn.weight": qw})
    st, dt_, nin, nout = stats["blk.0.attn.weight"]
    assert dt_ == GGMLType.IQ2_XS and nout < nin
    with GGUFReader(dst) as r:
        info = r.tensors["blk.0.attn.weight"]
        assert info.ggml_type == GGMLType.IQ2_XS
        dec = codecs.dequantize(r.tensor_data(info.name), GGMLType.IQ2_XS,
                                shape=(rows, n))
    assert np.isfinite(dec).all()
    corr = np.corrcoef(dec.reshape(-1),
                       x.astype(np.float16).astype(np.float32).reshape(-1))[0, 1]
    assert corr > 0.75, corr
