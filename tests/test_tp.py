"""Tensor-parallel shard_map decode (parallel/tp.py) vs single-device.

The TP analog of the reference's split-buffer test surface: sharded
execution must be numerically equal to the single-device fused path
(ggml-cuda split buffers produce bit-identical results to single-GPU via
the same kernels on row ranges; here the same Pallas kernels run on
column/row shards and one psum per layer reassembles the residual)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggml_imax_tpu.models import gptj
from ggml_imax_tpu.ops.pallas_qmm import params_repack_device
from ggml_imax_tpu.ops.qmatmul import set_force_fused
from ggml_imax_tpu.parallel.mesh import make_mesh
from ggml_imax_tpu.parallel.tp import (collective_volume_model, forward_tp,
                                       init_cache_tp, shard_params_tp)
from ggml_imax_tpu.quant.formats import GGMLType

TP = 4


def _cfg():
    # E/tp = 128: every per-device component slice keeps the fused kernels'
    # 128-lane alignment, so BOTH sides run the same W4A8/W4A16 paths
    return gptj.GPTJConfig(n_vocab=1024, n_ctx=64, n_embd=512, n_head=8,
                           n_layer=2, n_rot=32)


def _fused_stacked_params(cfg, tp):
    os.environ["GGML_FUSE_FF"] = "1"
    params = gptj.synthetic_params(cfg, GGMLType.Q4_0, seed=3)
    params = gptj.fuse_qkv(params)
    params = gptj.fuse_out(params)
    params = gptj.pad_lm_head(params, multiple=128 * tp)
    params = params_repack_device(params)
    return gptj.stack_model(params)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(dp=1, tp=TP, devices=jax.devices()[:TP])


def test_tp_decode_matches_single_device(mesh):
    cfg = _cfg()
    set_force_fused(True)
    try:
        ref_params = _fused_stacked_params(cfg, TP)
        tp_params, specs = shard_params_tp(_fused_stacked_params(cfg, TP),
                                           mesh, cfg)

        cache1 = gptj.init_cache(cfg, batch=1, n_ctx=64, flat=True)
        cache4 = init_cache_tp(cfg, mesh, batch=1, n_ctx=64)
        assert cache4.heads == cfg.n_head // TP

        toks = jnp.asarray(np.arange(1, 5, dtype=np.int32)[None])
        pos = jnp.asarray(np.arange(4, dtype=np.int32)[None])
        l1, cache1 = gptj.forward(cfg, ref_params, toks, pos, cache1, 0)
        l4, cache4 = forward_tp(cfg, tp_params, toks, pos, cache4, 0, mesh,
                                specs)
        assert l4.shape == l1.shape == (1, 4, cfg.n_vocab)
        np.testing.assert_allclose(np.asarray(l4), np.asarray(l1),
                                   rtol=2e-3, atol=2e-3)

        # two decode steps, growing n_past
        tok = jnp.argmax(l1[:, -1:], -1).astype(jnp.int32)
        for step in range(2):
            p = jnp.full((1, 1), 4 + step, jnp.int32)
            l1, cache1 = gptj.forward(cfg, ref_params, tok, p, cache1,
                                      4 + step)
            l4, cache4 = forward_tp(cfg, tp_params, tok, p, cache4,
                                    4 + step, mesh, specs)
            np.testing.assert_allclose(np.asarray(l4), np.asarray(l1),
                                       rtol=2e-3, atol=2e-3)
            tok = jnp.argmax(l1[:, -1:], -1).astype(jnp.int32)
    finally:
        set_force_fused(False)


def test_tp_shard_sizes(mesh):
    """Per-device shards are exactly 1/tp of each sharded weight (the
    memory-plan-fits contract: get_row_split rounding analog)."""
    cfg = _cfg()
    set_force_fused(True)
    try:
        tp_params, _ = shard_params_tp(_fused_stacked_params(cfg, TP),
                                       mesh, cfg)
    finally:
        set_force_fused(False)
    for name in ("qkvf_w", "of_w"):
        qt = tp_params["stack"][name]
        shard = qt.q.addressable_shards[0].data
        assert shard.nbytes * TP == qt.q.nbytes, (name, shard.shape)
    lmh = tp_params["lmh_w"]
    assert lmh.q.addressable_shards[0].data.nbytes * TP == lmh.q.nbytes
    assert lmh.n * TP % (128 * TP) == 0


def test_tp_q8_cache(mesh):
    """TP decode over the q8_0 quantized KV arena matches single-device."""
    cfg = _cfg()
    set_force_fused(True)
    try:
        ref_params = _fused_stacked_params(cfg, TP)
        tp_params, specs = shard_params_tp(_fused_stacked_params(cfg, TP),
                                           mesh, cfg)
        cache1 = gptj.init_cache(cfg, batch=1, n_ctx=64, dtype="q8_0",
                                 flat=True)
        cache4 = init_cache_tp(cfg, mesh, batch=1, n_ctx=64, dtype="q8_0")
        toks = jnp.asarray(np.arange(1, 4, dtype=np.int32)[None])
        pos = jnp.asarray(np.arange(3, dtype=np.int32)[None])
        l1, _ = gptj.forward(cfg, ref_params, toks, pos, cache1, 0)
        l4, _ = forward_tp(cfg, tp_params, toks, pos, cache4, 0, mesh, specs)
        np.testing.assert_allclose(np.asarray(l4), np.asarray(l1),
                                   rtol=2e-3, atol=2e-3)
    finally:
        set_force_fused(False)


def test_collective_volume_model():
    """Scaling model sanity: quantized decode TP is overwhelmingly
    HBM-bound, so predicted efficiency stays >=80% (the BASELINE multi-host
    gate) out to tp=8 at GPT-J-6B geometry."""
    cfg = gptj.GPTJConfig(n_vocab=50400, n_ctx=2048, n_embd=4096, n_head=16,
                          n_layer=28, n_rot=64)
    for tp in (2, 4, 8):
        m = collective_volume_model(cfg, tp)
        assert m["predicted_scaling_efficiency"] >= 0.8, m
        assert m["allreduce_bytes_per_tok"] < 2**21     # ~1.8 MB at tp=8
    m1 = collective_volume_model(cfg, 2)
    m2 = collective_volume_model(cfg, 8)
    assert m2["t_step_ms"] < m1["t_step_ms"]


def test_tp_llama_decode_matches_single_device(mesh):
    """LLaMA TP (GQA, two psums/layer) matches the single-device stacked
    path through prefill + decode."""
    from ggml_imax_tpu.models import llama
    from ggml_imax_tpu.parallel.tp import (forward_tp_llama,
                                           shard_params_tp_llama)
    from ggml_imax_tpu.quant.device import quantize_for_device

    cfg = llama.LlamaConfig(n_vocab=1024, n_ctx=64, n_embd=512, n_head=4,
                            n_head_kv=4, n_layer=2, n_ff=1024)
    rng = np.random.default_rng(23)

    def build():
        r = np.random.default_rng(23)
        q = lambda s: quantize_for_device(
            (r.standard_normal(s) * 0.05).astype(np.float32), GGMLType.Q4_0)
        vec = lambda n: jnp.asarray(
            (r.standard_normal(n) * 0.05).astype(np.float32))
        E, F, KV = cfg.n_embd, cfg.n_ff, cfg.n_head_kv * cfg.head_dim
        p = {"tok_embd": q((E, cfg.n_vocab)), "out_norm": vec(E) + 1.0,
             "output": q((E, 2048)), "layers": []}
        for _ in range(cfg.n_layer):
            p["layers"].append({
                "attn_norm": vec(E) + 1.0,
                "q_w": q((E, E)), "k_w": q((E, KV)), "v_w": q((E, KV)),
                "o_w": q((E, E)), "ffn_norm": vec(E) + 1.0,
                "gate_w": q((E, F)), "up_w": q((E, F)), "down_w": q((F, E)),
            })
        return llama.stack_model(
            params_repack_device(llama.prepare_fused(p)))

    set_force_fused(True)
    try:
        ref = build()
        tp_params, specs = shard_params_tp_llama(build(), mesh, cfg)
        c1 = llama.init_cache(cfg, batch=1, n_ctx=64, flat=True)
        c4 = init_cache_tp(cfg, mesh, batch=1, n_ctx=64)
        toks = jnp.asarray(np.arange(1, 5, dtype=np.int32)[None])
        pos = jnp.asarray(np.arange(4, dtype=np.int32)[None])
        l1, c1 = llama.forward(cfg, ref, toks, pos, c1, 0)
        l4, c4 = forward_tp_llama(cfg, tp_params, toks, pos, c4, 0, mesh,
                                  specs)
        # 'output' head n=2048 > n_vocab -> both slice to vocab
        assert l4.shape == l1.shape == (1, 4, cfg.n_vocab)
        np.testing.assert_allclose(np.asarray(l4), np.asarray(l1),
                                   rtol=5e-3, atol=5e-3)
        tok = jnp.argmax(l1[:, -1:], -1).astype(jnp.int32)
        p1 = jnp.full((1, 1), 4, jnp.int32)
        l1, _ = llama.forward(cfg, ref, tok, p1, c1, 4)
        l4, _ = forward_tp_llama(cfg, tp_params, tok, p1, c4, 4, mesh, specs)
        np.testing.assert_allclose(np.asarray(l4), np.asarray(l1),
                                   rtol=5e-3, atol=5e-3)
    finally:
        set_force_fused(False)
