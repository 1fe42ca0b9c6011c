"""Stacked (scan-over-layers) decode path: flat KV arena + fused decode
attention vs the per-layer reference path.

The stacked path is the warmup/perf fix for deep models (one compiled layer
body instead of n_layer copies; VERDICT.md r02 items 1-2): weights are
stacked along a leading layer axis (quant.device.stack_layers), the KV cache
is stored flat as (L, B, T, H*D) (models.common.KVCache, flat=True) so the
decode-attention kernel's view IS the storage, and forward() scans one body
over layers. These tests pin (a) flat-cache read/update semantics against
the rank-5 layout, (b) the decode-attention kernel (interpret mode) against
XLA attention, and (c) whole-model stacked-vs-unstacked logits parity.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ggml_imax_tpu.models import gptj
from ggml_imax_tpu.models.common import (
    init_kv_cache, read_kv, update_kv, update_kv_cells)
from ggml_imax_tpu.ops.attention import attention_xla
from ggml_imax_tpu.ops.decode_attention import decode_attention_stacked
from ggml_imax_tpu.quant.formats import GGMLType

L, B, T, H, D = 3, 2, 256, 2, 128


def _filled_caches(dtype, rng):
    """A flat and a rank-5 cache filled with identical data via update_kv."""
    flat = init_kv_cache(L, B, T, H, D, dtype=dtype, flat=True)
    full = init_kv_cache(L, B, T, H, D, dtype=dtype, flat=False)
    for li in range(L):
        k = jnp.asarray(rng.standard_normal((B, 5, H, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, 5, H, D)), jnp.bfloat16)
        flat = update_kv(flat, li, k, v, 3)
        full = update_kv(full, li, k, v, 3)
    return flat, full


@pytest.mark.parametrize("dtype", [jnp.bfloat16, "q8_0"])
def test_flat_cache_matches_rank5(rng, dtype):
    flat, full = _filled_caches(dtype, rng)
    assert flat.flat and not full.flat
    assert flat.head_dim == full.head_dim == D
    for li in range(L):
        kf, vf = read_kv(flat, li)
        k5, v5 = read_kv(full, li)
        np.testing.assert_array_equal(np.asarray(kf), np.asarray(k5))
        np.testing.assert_array_equal(np.asarray(vf), np.asarray(v5))


@pytest.mark.parametrize("dtype", [jnp.bfloat16, "q8_0"])
def test_flat_cache_cells_and_select_batch(rng, dtype):
    flat = init_kv_cache(L, B, T, H, D, dtype=dtype, flat=True)
    full = init_kv_cache(L, B, T, H, D, dtype=dtype, flat=False)
    k = jnp.asarray(rng.standard_normal((B, 4, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, 4, H, D)), jnp.bfloat16)
    cells = jnp.asarray([[7, 9, 11, 2], [0, 5, 6, 1]], jnp.int32)
    flat = update_kv_cells(flat, 1, k, v, cells)
    full = update_kv_cells(full, 1, k, v, cells)
    flat = flat.select_batch(jnp.asarray([1, 0]))
    full = full.select_batch(jnp.asarray([1, 0]))
    kf, vf = read_kv(flat, 1)
    k5, v5 = read_kv(full, 1)
    np.testing.assert_array_equal(np.asarray(kf), np.asarray(k5))
    np.testing.assert_array_equal(np.asarray(vf), np.asarray(v5))


@pytest.mark.parametrize("dtype", [jnp.bfloat16, "q8_0"])
@pytest.mark.parametrize("flat", [True, False])
def test_decode_attention_kernel_vs_xla(rng, dtype, flat):
    cache = init_kv_cache(L, B, T, H, D, dtype=dtype, flat=flat)
    n_past = T - 1  # fill the whole context so every block is live
    k = jnp.asarray(rng.standard_normal((B, n_past + 1, H, D)) * 0.3,
                    jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, n_past + 1, H, D)) * 0.3,
                    jnp.bfloat16)
    for li in range(L):
        cache = update_kv(cache, li, k, v, 0)
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)) * 0.3, jnp.bfloat16)
    pos = jnp.arange(T)[None, None, None, :]
    mask = jnp.where(pos <= n_past, 0.0, -jnp.inf).astype(jnp.float32)
    mask = jnp.broadcast_to(mask, (B, 1, 1, T))
    for li in range(L):
        got = decode_attention_stacked(cache, li, q, mask, interpret=True)
        kd, vd = read_kv(cache, li, dtype=jnp.bfloat16)
        ref = attention_xla(q, kd, vd, mask, out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=2e-2)


def _decode_tokens(cfg, params, cache, prompt, n_new):
    toks = jnp.asarray(prompt, jnp.int32)[None]
    pos = jnp.arange(toks.shape[1], dtype=jnp.int32)[None]
    logits, cache = gptj.forward(cfg, params, toks, pos, cache, 0)
    out = [int(jnp.argmax(logits[0, -1]))]
    n_past = toks.shape[1]
    for _ in range(n_new - 1):
        tok = jnp.asarray([[out[-1]]], jnp.int32)
        p = jnp.asarray([[n_past]], jnp.int32)
        logits, cache = gptj.forward(cfg, params, tok, p, cache, n_past)
        out.append(int(jnp.argmax(logits[0, -1])))
        n_past += 1
    return out, logits


def test_stacked_forward_matches_unstacked():
    cfg = gptj.GPTJConfig(n_vocab=160, n_ctx=256, n_embd=H * D, n_head=H,
                          n_layer=L, n_rot=64)
    params = gptj.synthetic_params_device(cfg, GGMLType.Q4_0, seed=7)
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]

    ref_cache = gptj.init_cache(cfg, dtype="q8_0")
    ref_toks, ref_logits = _decode_tokens(cfg, params, ref_cache, prompt, 6)

    sp = gptj.stack_model(gptj.fuse_out(gptj.fuse_qkv(
        gptj.synthetic_params_device(cfg, GGMLType.Q4_0, seed=7))))
    st_cache = gptj.init_cache(cfg, dtype="q8_0", flat=True)
    st_toks, st_logits = _decode_tokens(cfg, sp, st_cache, prompt, 6)

    assert st_toks == ref_toks
    np.testing.assert_allclose(np.asarray(st_logits), np.asarray(ref_logits),
                               rtol=0, atol=0.25)


def test_split_rope_stacked_matches_baseline():
    """split_rope_prep (q/k columns permuted to split-half rope layout,
    models/gptj.py) must leave decode OUTPUTS unchanged: attention scores
    are permutation-invariant and v/o are untouched. Runs the full
    stacked pipeline with head_dim 256 > n_rot 64 (the GPT-J geometry
    where the reference's rotate-past-n_dims quirk is live)."""
    cfg = gptj.GPTJConfig(n_vocab=160, n_ctx=256, n_embd=2 * 256, n_head=2,
                          n_layer=L, n_rot=64)
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]

    base = gptj.stack_model(gptj.fuse_out(gptj.fuse_qkv(
        gptj.synthetic_params_device(cfg, GGMLType.Q4_0, seed=7))))
    b_cache = gptj.init_cache(cfg, dtype="q8_0", flat=True)
    b_toks, b_logits = _decode_tokens(cfg, base, b_cache, prompt, 6)

    sp = gptj.stack_model(gptj.fuse_out(gptj.fuse_qkv(gptj.split_rope_prep(
        gptj.synthetic_params_device(cfg, GGMLType.Q4_0, seed=7), cfg))))
    assert "rope_split" in sp
    s_cache = gptj.init_cache(cfg, dtype="q8_0", flat=True)
    s_toks, s_logits = _decode_tokens(cfg, sp, s_cache, prompt, 6)

    assert s_toks == b_toks
    np.testing.assert_allclose(np.asarray(s_logits), np.asarray(b_logits),
                               rtol=0, atol=2e-2)   # dot-order reassociation


def test_split_rope_unfused_bit_exact():
    """Without kernels in the way (f32 compute, unfused weights) the
    permuted model's logits match the baseline's to FMA-contraction
    rounding (XLA may contract x0*c - x1*s differently per structure)."""
    from ggml_imax_tpu.ops.rope import rope_split, split_rope_permutation
    from ggml_imax_tpu.ops import rope as rope_mod
    rng = np.random.default_rng(0)
    # op-level identity: P(rope(x)) == rope_split(P(x)), incl. past-n_dims
    x = jnp.asarray(rng.standard_normal((1, 4, 2, 256)).astype(np.float32))
    pos = jnp.asarray(np.array([[0, 1, 300, 447]], dtype=np.int32))
    perm = split_rope_permutation(256)
    y_ref = rope_mod.rope(x, pos, n_dims=64, mode=0)[..., perm]
    y_new = rope_split(x[..., perm], pos, n_dims=64)
    np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_ref),
                               rtol=0, atol=1e-5)

    cfg = gptj.GPTJConfig(n_vocab=160, n_ctx=64, n_embd=2 * 256, n_head=2,
                          n_layer=2, n_rot=64)
    p0 = gptj.synthetic_params(cfg, GGMLType.Q4_0, seed=3)
    toks = jnp.asarray(rng.integers(0, 160, size=(1, 16)).astype(np.int32))
    posi = jnp.arange(16, dtype=jnp.int32)[None]
    c0 = gptj.init_cache(cfg, batch=1, n_ctx=64, dtype=jnp.float32)
    l0, _ = gptj.forward(cfg, p0, toks, posi, c0, 0,
                         compute_dtype=jnp.float32)
    p1 = gptj.split_rope_prep(p0, cfg)
    c1 = gptj.init_cache(cfg, batch=1, n_ctx=64, dtype=jnp.float32)
    l1, _ = gptj.forward(cfg, p1, toks, posi, c1, 0,
                         compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                               rtol=0, atol=1e-4)


@pytest.mark.parametrize("kv", ["bf16", "q8_0"])
def test_fused_update_attention_matches_two_step(kv):
    """decode_attention_update_stacked (ONE kernel: row write + attention,
    arena aliased) must match update_kv + decode_attention_stacked over
    several steps, for both residencies."""
    import math
    from ggml_imax_tpu.models.common import (attention_mask, init_kv_cache,
                                             update_kv)
    from ggml_imax_tpu.ops.decode_attention import (
        decode_attention_stacked, decode_attention_update_stacked)

    L, B, T, H, D = 3, 2, 256, 2, 128
    dt = jnp.bfloat16 if kv == "bf16" else "q8_0"
    c_ref = init_kv_cache(L, B, T, H, D, dt, flat=True)
    c_fus = init_kv_cache(L, B, T, H, D, dt, flat=True)
    rng = np.random.default_rng(0)

    for step in range(3):
        n_past = step
        pos = jnp.full((B, 1), n_past, jnp.int32)
        mask = attention_mask(pos, T, n_past)
        for li in range(L):
            q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.float32)
            kn = jnp.asarray(rng.standard_normal((B, 1, H, D)) * 0.5,
                             jnp.float32)
            vn = jnp.asarray(rng.standard_normal((B, 1, H, D)) * 0.5,
                             jnp.float32)
            c_ref2 = update_kv(c_ref, li, kn, vn, n_past)
            a_ref = decode_attention_stacked(c_ref2, li, q, mask)
            a_fus, c_fus = decode_attention_update_stacked(
                c_fus, li, q, kn, vn, n_past, mask)
            np.testing.assert_allclose(np.asarray(a_fus), np.asarray(a_ref),
                                       rtol=2e-3, atol=2e-3)
            c_ref = c_ref2
        np.testing.assert_allclose(
            np.asarray(c_fus.k).astype(np.float32),
            np.asarray(c_ref.k).astype(np.float32), rtol=1e-2, atol=1e-2)
        if kv == "q8_0":
            np.testing.assert_allclose(np.asarray(c_fus.ks),
                                       np.asarray(c_ref.ks),
                                       rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("kv", ["bf16", "q8_0"])
def test_llama_stacked_matches_unstacked(kv):
    """LLaMA stacked decode (scan-over-layers + fused update kernel, GQA)
    greedy-matches the unstacked forward."""
    import os
    from ggml_imax_tpu.models import llama
    import importlib
    from ggml_imax_tpu.ops.pallas_qmm import params_repack_device
    qmm = importlib.import_module("ggml_imax_tpu.ops.qmatmul")

    cfg = llama.LlamaConfig(n_vocab=512, n_ctx=64, n_embd=256, n_head=2,
                            n_head_kv=1, n_layer=2, n_ff=512)
    rng = np.random.default_rng(11)
    # dense-ish random weights through the real codec for determinism
    import torch  # noqa: F401  (unused; keeps parity with other tests)
    from ggml_imax_tpu.quant.device import quantize_for_device
    def q(shape):
        w = (rng.standard_normal(shape) * 0.05).astype(np.float32)
        return quantize_for_device(w, GGMLType.Q4_0)
    def vec(n):
        return jnp.asarray((rng.standard_normal(n) * 0.05).astype(np.float32))
    E, F, KV = cfg.n_embd, cfg.n_ff, cfg.n_head_kv * cfg.head_dim
    params = {"tok_embd": q((E, cfg.n_vocab)), "out_norm": vec(E) + 1.0,
              "output": None, "layers": []}
    for _ in range(cfg.n_layer):
        params["layers"].append({
            "attn_norm": vec(E) + 1.0,
            "q_w": q((E, E)), "k_w": q((E, KV)), "v_w": q((E, KV)),
            "o_w": q((E, E)), "ffn_norm": vec(E) + 1.0,
            "gate_w": q((E, F)), "up_w": q((E, F)), "down_w": q((F, E)),
        })

    def greedy(p, cache, n=5, prompt=(3, 5, 7)):
        toks = jnp.asarray(np.array(prompt, np.int32)[None])
        pos = jnp.asarray(np.arange(len(prompt), dtype=np.int32)[None])
        logits, cache = llama.forward(cfg, p, toks, pos, cache, 0)
        out = []
        tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
        for i in range(n):
            out.append(int(tok[0, 0]))
            pp = jnp.full((1, 1), len(prompt) + i, jnp.int32)
            logits, cache = llama.forward(cfg, p, tok, pp, cache,
                                          len(prompt) + i)
            tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
        return out

    ref = greedy(params, llama.init_cache(cfg, 1, 64,
                                          dtype=jnp.bfloat16))
    stacked = llama.stack_model(
        params_repack_device(llama.prepare_fused(params)))
    qmm.set_force_fused(True)
    try:
        dt = jnp.bfloat16 if kv == "bf16" else "q8_0"
        got = greedy(stacked, llama.init_cache(cfg, 1, 64, dtype=dt,
                                               flat=True))
    finally:
        qmm.set_force_fused(False)
    assert got == ref, (got, ref)


def test_llama_stacked_padded_ff_matches_unstacked():
    """fuse_gate_up's tile padding (gate/up N AND down-proj K zero-padded
    to the tile multiple — the get_row_rounding analog,
    /root/reference/src/ggml-cuda.cu:580) must not change any token: the
    pad SwiGLU lanes are exactly silu(0)*0 = 0 into zero down-proj rows.
    F=160 with pad_multiple=256 forces a real 96-lane pad."""
    import importlib
    from ggml_imax_tpu.models import llama
    from ggml_imax_tpu.ops.pallas_qmm import params_repack_device
    from ggml_imax_tpu.quant.device import quantize_for_device
    qmm = importlib.import_module("ggml_imax_tpu.ops.qmatmul")

    cfg = llama.LlamaConfig(n_vocab=512, n_ctx=64, n_embd=256, n_head=2,
                            n_head_kv=1, n_layer=2, n_ff=160)
    rng = np.random.default_rng(13)

    def q(shape):
        w = (rng.standard_normal(shape) * 0.05).astype(np.float32)
        return quantize_for_device(w, GGMLType.Q4_0)

    def vec(n):
        return jnp.asarray((rng.standard_normal(n) * 0.05).astype(np.float32))

    E, F, KV = cfg.n_embd, cfg.n_ff, cfg.n_head_kv * cfg.head_dim
    params = {"tok_embd": q((E, cfg.n_vocab)), "out_norm": vec(E) + 1.0,
              "output": None, "layers": []}
    for _ in range(cfg.n_layer):
        params["layers"].append({
            "attn_norm": vec(E) + 1.0,
            "q_w": q((E, E)), "k_w": q((E, KV)), "v_w": q((E, KV)),
            "o_w": q((E, E)), "ffn_norm": vec(E) + 1.0,
            "gate_w": q((E, F)), "up_w": q((E, F)), "down_w": q((F, E)),
        })

    def greedy(p, cache, n=5, prompt=(3, 5, 7)):
        toks = jnp.asarray(np.array(prompt, np.int32)[None])
        pos = jnp.asarray(np.arange(len(prompt), dtype=np.int32)[None])
        logits, cache = llama.forward(cfg, p, toks, pos, cache, 0)
        out = []
        tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
        for i in range(n):
            out.append(int(tok[0, 0]))
            pp = jnp.full((1, 1), len(prompt) + i, jnp.int32)
            logits, cache = llama.forward(cfg, p, tok, pp, cache,
                                          len(prompt) + i)
            tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
        return out

    ref = greedy(params, llama.init_cache(cfg, 1, 64, dtype=jnp.bfloat16))
    fused = llama.fuse_gate_up(llama.fuse_qkv(params), pad_multiple=256)
    assert fused["layers"][0]["gu_w"].n == 2 * 256
    assert fused["layers"][0]["down_w"].k == 256
    stacked = llama.stack_model(params_repack_device(fused))
    qmm.set_force_fused(True)
    try:
        got = greedy(stacked, llama.init_cache(cfg, 1, 64,
                                               dtype=jnp.bfloat16, flat=True))
    finally:
        qmm.set_force_fused(False)
    assert got == ref, (got, ref)


@pytest.mark.parametrize("wt", ["q8_0", "q4_0"])
def test_gpt2_stacked_matches_unstacked(wt):
    """GPT-2 stacked decode (48-layer 1558M is the warmup-critical config)
    greedy-matches the unstacked forward, incl. the tied Q8_0 head."""
    import importlib
    from ggml_imax_tpu.models import gpt2
    from ggml_imax_tpu.ops.pallas_qmm import params_repack_device
    from ggml_imax_tpu.quant.device import quantize_for_device
    qmm = importlib.import_module("ggml_imax_tpu.ops.qmatmul")

    t = GGMLType.Q8_0 if wt == "q8_0" else GGMLType.Q4_0
    cfg = gpt2.GPT2Config(n_vocab=512, n_ctx=64, n_embd=256, n_head=2,
                          n_layer=2)
    rng = np.random.default_rng(21)
    q = lambda s: quantize_for_device(
        (rng.standard_normal(s) * 0.05).astype(np.float32), t)
    vec = lambda n: jnp.asarray(
        (rng.standard_normal(n) * 0.05).astype(np.float32))
    E = cfg.n_embd
    params = {"wte": q((E, cfg.n_vocab)), "wpe": jnp.asarray(
                  (rng.standard_normal((64, E)) * 0.02).astype(np.float32)),
              "ln_f_g": vec(E) + 1.0, "ln_f_b": vec(E),
              "lm_head": None, "layers": []}
    for _ in range(cfg.n_layer):
        params["layers"].append({
            "ln_1_g": vec(E) + 1.0, "ln_1_b": vec(E),
            "attn_w": q((E, 3 * E)), "attn_b": vec(3 * E),
            "proj_w": q((E, E)), "proj_b": vec(E),
            "ln_2_g": vec(E) + 1.0, "ln_2_b": vec(E),
            "fc_w": q((E, 4 * E)), "fc_b": vec(4 * E),
            "out_w": q((4 * E, E)), "out_b": vec(E),
        })

    def greedy(p, cache, n=5, prompt=(3, 5, 7)):
        toks = jnp.asarray(np.array(prompt, np.int32)[None])
        pos = jnp.asarray(np.arange(len(prompt), dtype=np.int32)[None])
        logits, cache = gpt2.forward(cfg, p, toks, pos, cache, 0)
        out, tok = [], jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
        for i in range(n):
            out.append(int(tok[0, 0]))
            pp = jnp.full((1, 1), len(prompt) + i, jnp.int32)
            logits, cache = gpt2.forward(cfg, p, tok, pp, cache,
                                         len(prompt) + i)
            tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
        return out

    ref = greedy(params, gpt2.init_cache(cfg, 1, 64, dtype=jnp.bfloat16))
    stk = gpt2.stack_model(params_repack_device(gpt2.prepare_fused(params)))
    qmm.set_force_fused(True)
    try:
        got = greedy(stk, gpt2.init_cache(cfg, 1, 64, dtype=jnp.bfloat16,
                                          flat=True))
    finally:
        qmm.set_force_fused(False)
    assert got == ref, (got, ref)


@pytest.mark.parametrize("shape", [
    (2, 1, 384, 1, 4, 128),     # GQA 4:1, T=384 -> bk=128
    (1, 2, 256, 2, 2, 128),     # MHA, B=2
])
def test_fused_update_attention_shapes(shape):
    """Fused update+attention across GQA ratios, batch and KV lengths."""
    from ggml_imax_tpu.models.common import (attention_mask, init_kv_cache,
                                             update_kv)
    from ggml_imax_tpu.ops.decode_attention import (
        decode_attention_stacked, decode_attention_update_stacked)
    L, B, T, Hkv, Hq, D = shape
    rng = np.random.default_rng(7)
    c_ref = init_kv_cache(L, B, T, Hkv, D, jnp.bfloat16, flat=True)
    c_fus = init_kv_cache(L, B, T, Hkv, D, jnp.bfloat16, flat=True)
    for step in range(2):
        n_past = step
        pos = jnp.full((B, 1), n_past, jnp.int32)
        mask = attention_mask(pos, T, n_past)
        for li in range(L):
            q = jnp.asarray(rng.standard_normal((B, 1, Hq, D)), jnp.float32)
            kn = jnp.asarray(rng.standard_normal((B, 1, Hkv, D)) * 0.5,
                             jnp.float32)
            vn = jnp.asarray(rng.standard_normal((B, 1, Hkv, D)) * 0.5,
                             jnp.float32)
            c_ref = update_kv(c_ref, li, kn, vn, n_past)
            a_ref = decode_attention_stacked(c_ref, li, q, mask)
            a_fus, c_fus = decode_attention_update_stacked(
                c_fus, li, q, kn, vn, n_past, mask)
            np.testing.assert_allclose(np.asarray(a_fus), np.asarray(a_ref),
                                       rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(c_fus.k).astype(np.float32),
                               np.asarray(c_ref.k).astype(np.float32),
                               rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize("kv", ["bf16", "q8_0"])
def test_fused_cells_kernel_matches_xla(kv):
    """decode_attention_update_cells (shared arena, per-row cell writes)
    matches update_kv_cells + XLA attention under a cells mask, including
    pad rows routed to a trash cell."""
    from ggml_imax_tpu.models.common import (cells_attention_mask,
                                             init_kv_cache, read_kv,
                                             update_kv_cells)
    from ggml_imax_tpu.ops.decode_attention import \
        decode_attention_update_cells
    from ggml_imax_tpu.ops.flash_attention import attention_xla

    L, T, H, D = 2, 256, 2, 128
    NB = 4                       # 3 live rows + 1 pad
    trash = T - 1
    dt = jnp.bfloat16 if kv == "bf16" else "q8_0"
    rng = np.random.default_rng(9)
    c_ref = init_kv_cache(L, 1, T, H, D, dt, flat=True)
    c_fus = init_kv_cache(L, 1, T, H, D, dt, flat=True)

    # simulate 2 steps of 3 concurrent sequences writing to spread cells
    cell_pos = np.full(T, -1, np.int32)
    cell_seq = np.zeros(T, np.uint32)
    for step in range(2):
        rows = np.array([step * 8 + 0, step * 8 + 3, step * 8 + 5, trash],
                        np.int32)
        seqs = np.array([0, 1, 2, 31], np.int32)
        poss = np.array([step, step, step, 0], np.int32)
        for r, sq, p in zip(rows[:3], seqs[:3], poss[:3]):
            cell_pos[r] = p
            cell_seq[r] = np.uint32(1 << sq)
        mask = cells_attention_mask(
            jnp.asarray(poss[None]), jnp.asarray(seqs[None]),
            jnp.asarray(cell_pos[None]), jnp.asarray(cell_seq[None]))
        # (1, 1, NB, T) -> per-row (NB, T)
        mask_rows = mask[0, 0]

        for li in range(L):
            q = jnp.asarray(rng.standard_normal((NB, 1, H, D)), jnp.float32)
            kn = jnp.asarray(rng.standard_normal((NB, 1, H, D)) * 0.5,
                             jnp.float32)
            vn = jnp.asarray(rng.standard_normal((NB, 1, H, D)) * 0.5,
                             jnp.float32)
            # reference: celled scatter (B=1, T=NB tokens) + XLA attention
            c_ref = update_kv_cells(c_ref, li, kn.reshape(1, NB, H, D),
                                    vn.reshape(1, NB, H, D),
                                    jnp.asarray(rows[None]))
            kr, vr = read_kv(c_ref, li, dtype=jnp.float32)
            a_ref = attention_xla(q.reshape(1, NB, H, D), kr, vr, mask,
                                  out_dtype=jnp.float32)
            a_fus, c_fus = decode_attention_update_cells(
                c_fus, li, q, kn, vn, jnp.asarray(rows), mask_rows)
            # pad row (fully masked) is NaN in the XLA softmax and a clamped
            # zero in the kernel; compare the live rows
            np.testing.assert_allclose(np.asarray(a_fus)[:3],
                                       np.asarray(a_ref[0])[:3],
                                       rtol=2e-2, atol=2e-2)
    # arenas agree on every live cell
    live = cell_pos >= 0
    kf = np.asarray(c_fus.k, np.float32)[:, 0, live]
    kr_ = np.asarray(c_ref.k, np.float32)[:, 0, live]
    np.testing.assert_allclose(kf, kr_, rtol=1e-2, atol=1e-2)


def test_select_decode_path_gates():
    """The shared dispatch gate (ONE copy of the kernel-selection rules)."""
    import importlib
    import os
    from ggml_imax_tpu.ops.decode_attention import select_decode_path
    qmm = importlib.import_module("ggml_imax_tpu.ops.qmatmul")

    class Flat:
        flat = True

    class R5:
        flat = False

    qmm.set_force_fused(True)
    old = os.environ.get("GGML_FUSED_KV_UPDATE")
    try:
        base = dict(T=1, B=1, D=128, cells=None, cache=Flat)
        os.environ["GGML_FUSED_KV_UPDATE"] = "1"
        assert select_decode_path(**base) == "fused"
        assert select_decode_path(**{**base, "cache": R5}) == "kernel"
        assert select_decode_path(**{**base, "D": 64}) == "xla"
        assert select_decode_path(**{**base, "T": 4}) == "xla"
        cells = object()
        assert select_decode_path(**{**base, "T": 8, "cells": cells,
                                     "cells_kernel": True,
                                     "mask": object()}) == "cells"
        # pure celled ubatch without the decode-only promise -> xla scatter
        assert select_decode_path(**{**base, "T": 8,
                                     "cells": cells}) == "xla"
        os.environ["GGML_FUSED_KV_UPDATE"] = "0"
        assert select_decode_path(**base) == "kernel"
        assert select_decode_path(**{**base, "T": 8, "cells": cells,
                                     "cells_kernel": True,
                                     "mask": object()}) == "cells2"
        # default (unset) = two-step: the fused update kernel measured 71.3
        # vs 6.51 ms/step on chip (r04 ablation) and is opt-in until fixed
        os.environ.pop("GGML_FUSED_KV_UPDATE")
        assert select_decode_path(**base) == "kernel"
        assert select_decode_path(**{**base, "T": 8, "cells": cells,
                                     "cells_kernel": True,
                                     "mask": object()}) == "cells2"
    finally:
        qmm.set_force_fused(False)
        if old is None:
            os.environ.pop("GGML_FUSED_KV_UPDATE", None)
        else:
            os.environ["GGML_FUSED_KV_UPDATE"] = old


def test_pick_bk_always_mosaic_legal():
    """ADVICE r03: the VMEM-budget shrink loop must never produce a block
    length that is neither a multiple of 128 nor the full T (Mosaic rejects
    such windows at lowering time; interpret-mode tests can't see it)."""
    from ggml_imax_tpu.ops.decode_attention import _pick_bk
    for t in (128, 256, 500, 512, 1000, 1024, 2048, 4096, 8192, 131072):
        for row_bytes in (0, 8192, 65536, 1 << 20, 8 << 20):
            bk = _pick_bk(t, row_bytes)
            assert t % bk == 0, (t, row_bytes, bk)
            assert bk == t or bk % 128 == 0, (t, row_bytes, bk)
    # the regression case from the advisory: t=1000 under a big budget
    assert _pick_bk(1000, 65536) == 1000
    # budget shrink still works for aligned T
    assert _pick_bk(4096, 65536) == 128


@pytest.mark.parametrize("kv", ["bf16", "q8_0"])
def test_cells2_kernel_matches_xla(kv):
    """decode_attention_cells (read-only shared-arena kernel, the two-step
    serving path) matches XLA attention over the same scattered arena."""
    from ggml_imax_tpu.models.common import (cells_attention_mask,
                                             init_kv_cache, read_kv,
                                             update_kv_cells)
    from ggml_imax_tpu.ops.decode_attention import decode_attention_cells
    from ggml_imax_tpu.ops.flash_attention import attention_xla

    L, T, H, D = 2, 256, 2, 128
    NB = 4                       # 3 live rows + 1 pad
    trash = T - 1
    dt = jnp.bfloat16 if kv == "bf16" else "q8_0"
    rng = np.random.default_rng(11)
    c = init_kv_cache(L, 1, T, H, D, dt, flat=True)

    cell_pos = np.full(T, -1, np.int32)
    cell_seq = np.zeros(T, np.uint32)
    for step in range(2):
        rows = np.array([step * 8 + 0, step * 8 + 3, step * 8 + 5, trash],
                        np.int32)
        seqs = np.array([0, 1, 2, 31], np.int32)
        poss = np.array([step, step, step, 0], np.int32)
        for r, sq, p in zip(rows[:3], seqs[:3], poss[:3]):
            cell_pos[r] = p
            cell_seq[r] = np.uint32(1 << sq)
        mask = cells_attention_mask(
            jnp.asarray(poss[None]), jnp.asarray(seqs[None]),
            jnp.asarray(cell_pos[None]), jnp.asarray(cell_seq[None]))
        mask_rows = mask[0, 0]

        for li in range(L):
            q = jnp.asarray(rng.standard_normal((NB, 1, H, D)), jnp.float32)
            kn = jnp.asarray(rng.standard_normal((NB, 1, H, D)) * 0.5,
                             jnp.float32)
            vn = jnp.asarray(rng.standard_normal((NB, 1, H, D)) * 0.5,
                             jnp.float32)
            c = update_kv_cells(c, li, kn.reshape(1, NB, H, D),
                                vn.reshape(1, NB, H, D),
                                jnp.asarray(rows[None]))
            kr, vr = read_kv(c, li, dtype=jnp.float32)
            a_ref = attention_xla(q.reshape(1, NB, H, D), kr, vr, mask,
                                  out_dtype=jnp.float32)
            a_k = decode_attention_cells(c, li, q, mask_rows)
            np.testing.assert_allclose(
                np.asarray(a_k).reshape(NB, H, D)[:3],
                np.asarray(a_ref[0])[:3], rtol=2e-2, atol=2e-2)


def test_batched_stacked_cells2_e2e():
    """BatchedEngine(stacked=True) decode-only ubatches route through the
    cells2 path by default (fused env unset: scatter + read-only cells
    kernel) and match the unstacked engine's greedy output."""
    import importlib
    import os
    from ggml_imax_tpu.models import gptj as gj
    from ggml_imax_tpu.runtime.batched import BatchedEngine
    qmm = importlib.import_module("ggml_imax_tpu.ops.qmatmul")
    assert os.environ.get("GGML_FUSED_KV_UPDATE", "0") != "1"
    cfg = gj.GPTJConfig(n_vocab=640, n_ctx=64, n_embd=256, n_head=2,
                        n_layer=2, n_rot=32)
    params = gj.synthetic_params(cfg, GGMLType.Q4_0, seed=17)
    prompts = [[3, 5, 7, 11], [13, 17]]
    ref_eng = BatchedEngine(gj, cfg, params, compute_dtype=jnp.float32,
                            kv_dtype=jnp.float32)
    rids = [ref_eng.add_request(p, 5, temp=0.0) for p in prompts]
    refs = ref_eng.run()
    qmm.set_force_fused(True)          # interpret-mode kernels on CPU
    try:
        be = BatchedEngine(gj, cfg, params, stacked=True)
        rids2 = [be.add_request(p, 5, temp=0.0) for p in prompts]
        outs = be.run()
    finally:
        qmm.set_force_fused(False)
    for ra, rb in zip(rids, rids2):
        assert outs[rb] == refs[ra], (outs[rb], refs[ra])
