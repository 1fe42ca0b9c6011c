"""Differential tests for the quantized matmul paths — the analog of the
reference's test-backend-ops MUL_MAT sweep (tests/test-backend-ops.cpp:908):
every quantized type x shape, compared against the bit-exact codec
dequantization + float matmul, with NMSE tolerances."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggml_imax_tpu.ops import qmatmul, qmatmul_pallas, repack_interleaved
from ggml_imax_tpu.quant import GGMLType, type_from_name
from ggml_imax_tpu.quant.device import dequantize_qtensor, quantize_for_device

WEIGHT_TYPES = ["q4_0", "q4_1", "q5_0", "q5_1", "q8_0",
                "q2_K", "q3_K", "q4_K", "q5_K", "q6_K"]


def nmse(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.sum((a - b) ** 2) / (np.sum(b * b) + 1e-30))


def make_case(name, k=256, n=128, m=4, seed=0):
    rng = np.random.default_rng(seed)
    w = (rng.standard_normal((k, n)) * 0.5).astype(np.float32)
    x = (rng.standard_normal((m, k)) * 0.5).astype(np.float32)
    qt = quantize_for_device(w, type_from_name(name))
    ref = x @ dequantize_qtensor(qt)   # exact f64-ish reference of the q weights
    return x, qt, ref


@pytest.mark.parametrize("name", WEIGHT_TYPES)
def test_qmatmul_f32_exactness(name):
    """With f32 compute the XLA path must match the host dequant matmul to
    float rounding (NMSE well under the reference's 1e-7 default)."""
    x, qt, ref = make_case(name)
    out = qmatmul(jnp.asarray(x), qt, compute_dtype=jnp.float32,
                  out_dtype=jnp.float32, precision="highest")
    assert nmse(out, ref) < 1e-9, f"{name}: NMSE {nmse(out, ref)}"


@pytest.mark.parametrize("name", WEIGHT_TYPES)
def test_qmatmul_bf16(name):
    x, qt, ref = make_case(name)
    out = qmatmul(jnp.asarray(x), qt, compute_dtype=jnp.bfloat16, out_dtype=jnp.float32)
    assert nmse(out, ref) < 1e-4, f"{name}: NMSE {nmse(out, ref)}"


@pytest.mark.parametrize("name", ["q4_0", "q4_1", "q2_K", "q3_K", "q4_K"])
def test_qmatmul_pallas_matches_xla(name):
    """Fused kernel (interpret mode on CPU) vs the XLA path."""
    x, qt, ref = make_case(name, k=512, n=256, m=4)
    qti = repack_interleaved(qt, bk=256)
    out = qmatmul_pallas(jnp.asarray(x), qti, bn=128)
    assert nmse(out, ref) < 1e-4, f"{name}: NMSE {nmse(out, ref)}"


def test_qmatmul_batched_leading_dims():
    x, qt, ref = make_case("q4_0", k=256, n=128, m=6)
    xb = jnp.asarray(x).reshape(2, 3, 256)
    out = qmatmul(xb, qt, compute_dtype=jnp.float32, out_dtype=jnp.float32,
                  precision="highest")
    assert out.shape == (2, 3, 128)
    assert nmse(out.reshape(6, 128), ref) < 1e-9


def test_qmatmul_dense_f16_weights():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((128, 64)).astype(np.float32)
    from ggml_imax_tpu.quant import codecs
    from ggml_imax_tpu.quant.device import to_device_format
    raw = codecs.quantize(np.ascontiguousarray(w.T), GGMLType.F16)
    qt = to_device_format(raw, GGMLType.F16, (128, 64))
    x = rng.standard_normal((4, 128)).astype(np.float32)
    out = qmatmul(jnp.asarray(x), qt, compute_dtype=jnp.float32,
                  out_dtype=jnp.float32, precision="highest")
    ref = x @ w.astype(np.float16).astype(np.float32)
    assert nmse(out, ref) < 1e-9


def test_qmatmul_under_jit():
    x, qt, ref = make_case("q4_K")
    f = jax.jit(lambda x, qt: qmatmul(x, qt, compute_dtype=jnp.float32,
                                      out_dtype=jnp.float32, precision="highest"))
    out = f(jnp.asarray(x), qt)   # QTensor is a pytree -> passes jit boundary
    assert nmse(out, ref) < 1e-9


def test_dequantize_xla_handles_interleaved(rng):
    """The XLA fallback must decode block-interleaved (fused-kernel layout)
    weights identically to the natural layout."""
    import jax.numpy as jnp
    from ggml_imax_tpu.ops.pallas_qmm import repack_interleaved
    from ggml_imax_tpu.ops.qmatmul import dequantize_xla
    from ggml_imax_tpu.quant.device import quantize_for_device
    from ggml_imax_tpu.quant.formats import GGMLType
    w = (rng.standard_normal((1024, 64)) * 0.3).astype(np.float32)
    qt = quantize_for_device(w, GGMLType.Q4_0)
    ref = np.asarray(dequantize_xla(qt, dtype=jnp.float32))
    qi = repack_interleaved(qt, bk=512)
    got = np.asarray(dequantize_xla(qi, dtype=jnp.float32))
    np.testing.assert_array_equal(ref, got)


def test_repack_device_matches_host(rng):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from ggml_imax_tpu.ops.pallas_qmm import (repack_interleaved,
                                              repack_interleaved_device)
    from ggml_imax_tpu.quant.device import quantize_for_device
    from ggml_imax_tpu.quant.formats import GGMLType
    w = (rng.standard_normal((1024, 32)) * 0.3).astype(np.float32)
    qt = quantize_for_device(w, GGMLType.Q4_0)
    a = repack_interleaved(qt, bk=512)
    b = repack_interleaved_device(qt, bk=512)
    np.testing.assert_array_equal(np.asarray(a.q), np.asarray(b.q))
    assert b.interleaved_bk == 512


def test_get_rows_handles_interleaved(rng):
    import jax.numpy as jnp
    from ggml_imax_tpu.ops.embedding import get_rows
    from ggml_imax_tpu.ops.pallas_qmm import repack_interleaved
    from ggml_imax_tpu.quant.device import quantize_for_device
    from ggml_imax_tpu.quant.formats import GGMLType
    w = (rng.standard_normal((1024, 40)) * 0.3).astype(np.float32)
    qt = quantize_for_device(w, GGMLType.Q4_0)
    ids = jnp.asarray([0, 7, 39, 2])
    ref = np.asarray(get_rows(qt, ids, dtype=jnp.float32))
    got = np.asarray(get_rows(repack_interleaved(qt, bk=512), ids,
                              dtype=jnp.float32))
    np.testing.assert_array_equal(ref, got)


def test_gptj_forward_invariant_under_repack(rng):
    """Whole-model check: repacking weights for the fused kernel must not
    change logits through any path (matmul, embedding gather)."""
    import jax.numpy as jnp
    from ggml_imax_tpu.models import gptj
    from ggml_imax_tpu.ops.pallas_qmm import params_repack_device
    from ggml_imax_tpu.quant.formats import GGMLType
    cfg = gptj.GPTJConfig(n_vocab=64, n_ctx=32, n_embd=512, n_head=2,
                          n_layer=1, n_rot=32)
    params = gptj.synthetic_params(cfg, GGMLType.Q4_0, seed=2)
    toks = jnp.asarray(rng.integers(0, 64, (1, 4)).astype(np.int32))
    pos = jnp.arange(4, dtype=jnp.int32)[None]
    cache = gptj.init_cache(cfg, batch=1, dtype=jnp.float32)
    ref, _ = gptj.forward(cfg, params, toks, pos, cache, 0,
                          compute_dtype=jnp.float32)
    cache2 = gptj.init_cache(cfg, batch=1, dtype=jnp.float32)
    got, _ = gptj.forward(cfg, params_repack_device(params), toks, pos,
                          cache2, 0, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("t", ["Q4_0", "Q4_1", "Q4_K"])
def test_rowpair_kernel_parity(rng, t):
    """Row-pair int4-bitcast kernel vs exact f32 dequant matmul (interpret
    emulation of the bitcast on CPU)."""
    import jax.numpy as jnp
    from ggml_imax_tpu.ops.pallas_qmm import (qmatmul_pallas,
                                              repack_rowpair_device)
    from ggml_imax_tpu.quant.device import (dequantize_qtensor,
                                            quantize_for_device)
    from ggml_imax_tpu.quant.formats import GGMLType
    tt = getattr(GGMLType, t)
    K, N = 1024, 256
    w = (rng.standard_normal((K, N)) * 0.3).astype(np.float32)
    qt = quantize_for_device(w, tt)
    x = jnp.asarray(rng.standard_normal((3, K)).astype(np.float32))
    exact = np.asarray(x) @ dequantize_qtensor(qt)
    got = np.asarray(qmatmul_pallas(x, repack_rowpair_device(qt, bk=512),
                                    interpret=True))
    err = np.abs(got - exact).max() / (np.abs(exact).max() + 1e-9)
    assert err < 6e-3, (t, err)   # bf16 weight product, f32 affine term


def test_params_repack_layout_choice(rng):
    from ggml_imax_tpu.ops.pallas_qmm import params_repack_device
    from ggml_imax_tpu.quant.device import quantize_for_device
    from ggml_imax_tpu.quant.formats import GGMLType
    w = (rng.standard_normal((1024, 32)) * 0.3).astype(np.float32)
    p = {"a": quantize_for_device(w, GGMLType.Q4_0),      # per-32 -> natpair
         "b": quantize_for_device(w, GGMLType.Q2_K)}      # per-16 -> planes
    r = params_repack_device(p)
    assert r["a"].q4_layout == 3 and r["a"].interleaved_bk > 0
    assert r["b"].q4_layout == 0 and r["b"].interleaved_bk > 0


@pytest.mark.parametrize("t", ["Q8_0", "Q5_0", "Q5_1", "Q6_K", "Q5_K",
                               "IQ4_NL"])
def test_int8_fused_kernel_parity(rng, t):
    """Fused int8-kind kernel (u-order rows, per-16/32 tile-repeat scales)
    vs exact f32 dequant matmul. bf16 weight products bound the error
    (~3e-3 for 8-bit, ~8e-3 for 5-bit-with-bias; ggml's vec_dot contract
    is 2e-2 abs/elt)."""
    import jax.numpy as jnp
    from ggml_imax_tpu.ops.pallas_qmm import (qmatmul_pallas,
                                              repack_int8_rows_device)
    from ggml_imax_tpu.quant.device import (dequantize_qtensor,
                                            quantize_for_device)
    from ggml_imax_tpu.quant.formats import GGMLType
    tt = getattr(GGMLType, t)
    K, N = 1024, 256
    w = (rng.standard_normal((K, N)) * 0.3).astype(np.float32)
    qt = quantize_for_device(w, tt)
    x = jnp.asarray(rng.standard_normal((3, K)).astype(np.float32))
    exact = np.asarray(x) @ dequantize_qtensor(qt)
    got = np.asarray(qmatmul_pallas(x, repack_int8_rows_device(qt),
                                    interpret=True))
    err = np.abs(got - exact).max() / (np.abs(exact).max() + 1e-9)
    assert err < 1.2e-2, (t, err)


@pytest.mark.parametrize("layout", ["rowpair", "planes", "int8"])
def test_m_grid_large_batch_parity(rng, layout):
    """m > DEFAULT_BM exercises the kernel's m-grid (pad + 512-row tiles) —
    the reference's mmq covers all batch sizes (ggml-cuda.cu:1867-1960);
    round 1 capped the fused path at m<=512 and this removes the cap."""
    import jax.numpy as jnp
    from ggml_imax_tpu.ops.pallas_qmm import (qmatmul_pallas,
                                              repack_int8_rows_device,
                                              repack_interleaved,
                                              repack_rowpair_device)
    from ggml_imax_tpu.quant.device import (dequantize_qtensor,
                                            quantize_for_device)
    from ggml_imax_tpu.quant.formats import GGMLType
    K, N = 1024, 256
    m = 600                                    # not a multiple of 512 or 8
    t = {"rowpair": GGMLType.Q4_0, "planes": GGMLType.Q2_K,
         "int8": GGMLType.Q6_K}[layout]
    w = (rng.standard_normal((K, N)) * 0.3).astype(np.float32)
    qt = quantize_for_device(w, t)
    qtr = {"rowpair": lambda: repack_rowpair_device(qt, bk=512),
           "planes": lambda: repack_interleaved(qt, bk=256),
           "int8": lambda: repack_int8_rows_device(qt)}[layout]()
    x = jnp.asarray(rng.standard_normal((m, K)).astype(np.float32))
    exact = np.asarray(x) @ dequantize_qtensor(qt)
    got = np.asarray(qmatmul_pallas(x, qtr, interpret=True))
    assert got.shape == (m, N)
    err = np.abs(got - exact).max() / (np.abs(exact).max() + 1e-9)
    assert err < 1.2e-2, (layout, err)


@pytest.mark.parametrize("t", ["Q4_0", "Q4_1"])
def test_natpair_kernel_parity(rng, t):
    """Natpair (q4_layout=3) production layout: W4A8 int8-MXU decode path at
    m<=8 and W4A16 full-tile path at larger m must both match the XLA
    dequant reference. W4A8 quantizes activations per-32 to int8 (the
    vec_dot_q4_0_q8_0 math) — its noise is bounded well inside 1e-4 NMSE."""
    from ggml_imax_tpu.ops.pallas_qmm import (qmatmul_pallas,
                                              repack_natpair_device,
                                              set_w4a8)
    w = (rng.standard_normal((512, 256)) * 0.5).astype(np.float32)
    qt = quantize_for_device(w, getattr(GGMLType, t))
    ref_w = dequantize_qtensor(qt)
    qtn = repack_natpair_device(qt, bk=512)
    assert qtn.q4_layout == 3

    for m in (1, 4, 64):
        x = (rng.standard_normal((m, 512)) * 0.5).astype(np.float32)
        ref = x @ ref_w
        got = np.asarray(qmatmul_pallas(jnp.asarray(x), qtn))
        assert nmse(got, ref) < 1e-4, (t, m, nmse(got, ref))

    # W4A16-only mode must also agree at decode shapes
    set_w4a8(False)
    try:
        x = (rng.standard_normal((1, 512)) * 0.5).astype(np.float32)
        got = np.asarray(qmatmul_pallas(jnp.asarray(x), qtn))
        assert nmse(got, x @ ref_w) < 1e-5
    finally:
        set_w4a8(True)


def test_natpair_dequant_and_get_rows(rng):
    """dequantize_xla and get_rows must decode the natpair layout exactly."""
    from ggml_imax_tpu.ops.embedding import get_rows
    from ggml_imax_tpu.ops.qmatmul import dequantize_xla
    from ggml_imax_tpu.ops.pallas_qmm import repack_natpair_device
    w = (rng.standard_normal((256, 128)) * 0.5).astype(np.float32)
    qt = quantize_for_device(w, GGMLType.Q4_0)
    ref = dequantize_qtensor(qt)
    qtn = repack_natpair_device(qt, bk=256)
    got = np.asarray(dequantize_xla(qtn, dtype=jnp.float32))
    assert np.abs(got - ref).max() < 1e-6
    ids = jnp.asarray(np.array([0, 5, 127, 3]))
    rows = np.asarray(get_rows(qtn, ids, dtype=jnp.float32))
    assert np.abs(rows - ref.T[np.asarray(ids)]).max() < 1e-6


def test_params_repack_prefers_natpair(rng):
    from ggml_imax_tpu.ops.pallas_qmm import params_repack_device
    w = (rng.standard_normal((512, 256)) * 0.5).astype(np.float32)
    p = {"a": quantize_for_device(w, GGMLType.Q4_0)}
    r = params_repack_device(p)
    assert r["a"].q4_layout == 3 and r["a"].interleaved_bk > 0


@pytest.mark.parametrize("t", ["Q8_0", "Q5_1", "Q6_K"])
def test_nat8_kernel_parity(rng, t):
    """nat8 (q4_layout=4) int8-kind layout: W8A8 per-block int8 dots at
    decode shapes and W8A16 full-tile dots at prefill shapes, both vs the
    XLA dequant reference."""
    from ggml_imax_tpu.ops.pallas_qmm import (qmatmul_pallas,
                                              repack_nat8_device)
    w = (rng.standard_normal((512, 256)) * 0.5).astype(np.float32)
    qt = quantize_for_device(w, getattr(GGMLType, t))
    assert qt.kind == "int8", (t, qt.kind)
    ref_w = dequantize_qtensor(qt)
    qtn = repack_nat8_device(qt, bk=512)
    assert qtn.q4_layout == 4
    for m in (1, 4, 64):
        x = (rng.standard_normal((m, 512)) * 0.5).astype(np.float32)
        got = np.asarray(qmatmul_pallas(jnp.asarray(x), qtn))
        assert nmse(got, x @ ref_w) < 1e-4, (t, m, nmse(got, x @ ref_w))


def test_int8_uorder_dequant_roundtrip(rng):
    """dequantize_xla and get_rows must undo the u-order layout-2 int8
    permutation (regression: they previously returned permuted rows)."""
    from ggml_imax_tpu.ops.embedding import get_rows
    from ggml_imax_tpu.ops.pallas_qmm import repack_int8_rows_device
    from ggml_imax_tpu.ops.qmatmul import dequantize_xla
    w = (rng.standard_normal((512, 128)) * 0.5).astype(np.float32)
    qt = quantize_for_device(w, GGMLType.Q8_0)
    ref = dequantize_qtensor(qt)
    qtu = repack_int8_rows_device(qt, bk=512)
    got = np.asarray(dequantize_xla(qtu, dtype=jnp.float32))
    assert np.abs(got - ref).max() < 1e-6
    ids = jnp.asarray(np.array([0, 7, 127]))
    rows = np.asarray(get_rows(qtu, ids, dtype=jnp.float32))
    assert np.abs(rows - ref.T[np.asarray(ids)]).max() < 1e-6


@pytest.mark.parametrize("t,repacker", [("Q4_K", "natpair"),
                                        ("Q5_K", "nat8")])
def test_half_width_affine_storage(rng, t, repacker):
    """scale_dtype=bf16 stores per-32 scales AND mins half-width (the wire
    format keeps K-quant d/dmin in fp16, ggml-common.h:261-273) — the
    device-residency fix for LLaMA-2 7B Q4_K_M. Kernel + XLA fallback must
    stay within bf16 rounding of the f32-affine result."""
    from ggml_imax_tpu.ops.pallas_qmm import (qmatmul_pallas,
                                              repack_natpair_device,
                                              repack_nat8_device)
    from ggml_imax_tpu.ops.qmatmul import dequantize_xla
    w = (rng.standard_normal((512, 256)) * 0.5).astype(np.float32)
    qt = quantize_for_device(w, getattr(GGMLType, t))
    ref_w = dequantize_qtensor(qt)
    rp = repack_natpair_device if repacker == "natpair" else repack_nat8_device
    qth = rp(qt, bk=512, scale_dtype=jnp.bfloat16)
    assert qth.scale.dtype == jnp.bfloat16
    assert qth.bias is not None and qth.bias.dtype == jnp.bfloat16

    for m in (1, 64):                      # W4A8/W8A8 decode + W*A16 tiles
        x = (rng.standard_normal((m, 512)) * 0.5).astype(np.float32)
        got = np.asarray(qmatmul_pallas(jnp.asarray(x), qth))
        assert nmse(got, x @ ref_w) < 2e-4, (t, m, nmse(got, x @ ref_w))
    # XLA fallback dequant must also accept half-width affine storage
    got_w = np.asarray(dequantize_xla(qth, dtype=jnp.float32))
    assert nmse(got_w, ref_w) < 1e-4


def test_params_repack_scale_dtype_covers_nat8(rng):
    """params_repack_device(scale_dtype=...) must reach int8-kind leaves
    (Q5_K/Q6_K in a Q4_K_M mix), not just nib4 natpair ones."""
    from ggml_imax_tpu.ops.pallas_qmm import params_repack_device
    p = {"a": quantize_for_device(
            (rng.standard_normal((512, 128)) * 0.5).astype(np.float32),
            GGMLType.Q4_K),
         "b": quantize_for_device(
            (rng.standard_normal((512, 128)) * 0.5).astype(np.float32),
            GGMLType.Q6_K)}
    r = params_repack_device(p, scale_dtype=jnp.bfloat16)
    assert r["a"].scale.dtype == jnp.bfloat16
    assert r["a"].bias.dtype == jnp.bfloat16
    assert r["b"].scale.dtype == jnp.bfloat16


def test_pick_bn_largest_legal_divisor():
    """_pick_bn must return the largest 128-multiple divisor of n capped at
    the requested tile — the r04 fix for the LM-head GEMV falling to tiny
    n-tiles (50432 = 256*197 has no divisor in {512, 1024, 2048, 4096})."""
    from ggml_imax_tpu.ops.pallas_qmm import _pick_bn
    assert _pick_bn(16384, 4096) == 4096          # divides: take the cap
    assert _pick_bn(512, 4096) == 512             # n smaller than the cap
    assert _pick_bn(50432, 4096) == 256           # 256*197: best available
    assert _pick_bn(51200, 4096) == 3200          # beats the old 512 pick
    assert _pick_bn(51200, 2048) == 2048
    assert _pick_bn(28672, 8192) == 7168          # 4096*7: old code gave 512
    assert _pick_bn(32000, 2048) == 1280          # llama vocab: old gave 256
    assert _pick_bn(200, 4096) == 200             # n <= cap passes through
    with pytest.raises(ValueError):
        _pick_bn(4296, 4096)                      # no 128-multiple divisor


def test_pad_lm_head_production_vocab_gets_wide_tiles(rng):
    """pad_lm_head(None) pads production-size vocabs to a 2048 multiple so
    the fused decode GEMV keeps full-width n-tiles, and leaves small/test
    vocabs at the cheap 128 pad."""
    from ggml_imax_tpu.models import gptj
    from ggml_imax_tpu.ops.pallas_qmm import _pick_bn

    def mk(n_vocab):
        w = (rng.standard_normal((256, n_vocab)) * 0.1).astype(np.float32)
        return {"lmh_w": quantize_for_device(w, GGMLType.Q4_0),
                "lmh_b": np.zeros((n_vocab,), np.float32)}

    big = gptj.pad_lm_head(mk(50400))
    assert big["lmh_w"].n == 51200                # 25 * 2048
    assert _pick_bn(big["lmh_w"].n, 4096) >= 2048
    assert np.asarray(big["lmh_b"])[-1] == -1e30  # pad cols never win argmax

    small = gptj.pad_lm_head(mk(1000))
    assert small["lmh_w"].n == 1024               # 128 pad only
