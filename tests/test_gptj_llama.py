"""GPT-J and LLaMA parity vs HuggingFace (tiny random models, torch CPU)."""
import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ggml_imax_tpu.models import gptj, llama
from ggml_imax_tpu.ops.rope import ROPE_MODE_NEOX
from ggml_imax_tpu.quant.formats import GGMLType


def test_gptj_logits_parity():
    torch.manual_seed(0)
    # rotary_dim == head_dim so HF (no-tail-rotation) and ggml (tail keeps
    # rotating, see golden_rope_partial) semantics coincide
    hf_cfg = transformers.GPTJConfig(
        vocab_size=96, n_positions=64, n_embd=64, n_layer=2, n_head=4,
        rotary_dim=16)
    model = transformers.GPTJForCausalLM(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    cfg = gptj.GPTJConfig(n_vocab=96, n_ctx=64, n_embd=64, n_head=4,
                          n_layer=2, n_rot=16)
    params = gptj.from_hf_state_dict(cfg, sd, GGMLType.F32)

    rng = np.random.default_rng(0)
    toks = rng.integers(0, 96, (1, 8)).astype(np.int32)
    pos = np.arange(8, dtype=np.int32)[None]
    cache = gptj.init_cache(cfg, dtype=jnp.float32)
    logits, _ = gptj.forward(cfg, params, jnp.asarray(toks), jnp.asarray(pos),
                             cache, 0, compute_dtype=jnp.float32,
                             precision="highest")
    with torch.no_grad():
        ref = model(torch.tensor(toks.astype(np.int64))).logits.numpy()
    err = np.abs(np.asarray(logits) - ref).max()
    assert err < 5e-3, f"gptj logits mismatch {err}"


def test_llama_logits_parity_gqa():
    torch.manual_seed(0)
    hf_cfg = transformers.LlamaConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    cfg = llama.LlamaConfig(n_vocab=96, n_ctx=64, n_embd=64, n_head=4,
                            n_head_kv=2, n_layer=2, n_ff=128,
                            rope_mode=ROPE_MODE_NEOX)
    params = llama.from_hf_state_dict(cfg, sd, GGMLType.F32)

    rng = np.random.default_rng(1)
    toks = rng.integers(0, 96, (1, 9)).astype(np.int32)
    pos = np.arange(9, dtype=np.int32)[None]
    cache = llama.init_cache(cfg, dtype=jnp.float32)
    logits, _ = llama.forward(cfg, params, jnp.asarray(toks), jnp.asarray(pos),
                              cache, 0, compute_dtype=jnp.float32,
                              precision="highest")
    with torch.no_grad():
        ref = model(torch.tensor(toks.astype(np.int64))).logits.numpy()
    err = np.abs(np.asarray(logits) - ref).max()
    assert err < 5e-3, f"llama logits mismatch {err}"


def test_llama_gguf_roundtrip(tmp_path):
    """Write a tiny llama GGUF with our writer, load it back, and check the
    forward runs (exercises the GGUF model path end to end)."""
    from ggml_imax_tpu.io import GGUFWriter
    from ggml_imax_tpu.quant import codecs

    rng = np.random.default_rng(0)
    E, V, FF, H, HKV, L = 32, 64, 64, 4, 2, 2
    w = GGUFWriter(tmp_path / "tiny.gguf")
    w.add_kv("general.architecture", "llama")
    w.add_kv("llama.block_count", np.uint32(L))
    w.add_kv("llama.context_length", np.uint32(64))
    w.add_kv("llama.embedding_length", np.uint32(E))
    w.add_kv("llama.feed_forward_length", np.uint32(FF))
    w.add_kv("llama.attention.head_count", np.uint32(H))
    w.add_kv("llama.attention.head_count_kv", np.uint32(HKV))
    w.add_kv("llama.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv("tokenizer.ggml.tokens", [f"t{i}" for i in range(V)])
    w.add_kv("tokenizer.ggml.merges", ["t t"])

    def addq(name, k, n, t=codecs.GGMLType.Q4_0):
        data = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
        w.add_tensor(name, codecs.quantize(data, t), t, shape=(k, n))

    def addv(name, n):
        w.add_tensor(name, (rng.standard_normal(n) * 0.05 + 1).astype(np.float32),
                     codecs.GGMLType.F32, shape=(n,))

    addq("token_embd.weight", E, V)
    addv("output_norm.weight", E)
    addq("output.weight", E, V)
    DKV = E // H * HKV
    for i in range(L):
        addv(f"blk.{i}.attn_norm.weight", E)
        addq(f"blk.{i}.attn_q.weight", E, E)
        addq(f"blk.{i}.attn_k.weight", E, DKV)
        addq(f"blk.{i}.attn_v.weight", E, DKV)
        addq(f"blk.{i}.attn_output.weight", E, E)
        addv(f"blk.{i}.ffn_norm.weight", E)
        addq(f"blk.{i}.ffn_gate.weight", E, FF)
        addq(f"blk.{i}.ffn_up.weight", E, FF)
        addq(f"blk.{i}.ffn_down.weight", FF, E)
    w.write()

    cfg, params, tok = llama.load_gguf(tmp_path / "tiny.gguf")
    assert cfg.n_embd == E and cfg.n_head_kv == HKV and cfg.n_layer == L
    assert tok is not None

    toks = np.array([[1, 2, 3]], np.int32)
    pos = np.arange(3, dtype=np.int32)[None]
    cache = llama.init_cache(cfg, dtype=jnp.float32)
    logits, cache = llama.forward(cfg, params, jnp.asarray(toks),
                                  jnp.asarray(pos), cache, 0,
                                  compute_dtype=jnp.float32)
    assert logits.shape == (1, 3, V)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_llama_fused_qkv_matches():
    torch.manual_seed(0)
    hf_cfg = transformers.LlamaConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    cfg = llama.LlamaConfig(n_vocab=96, n_ctx=64, n_embd=64, n_head=4,
                            n_head_kv=2, n_layer=2, n_ff=128,
                            rope_mode=ROPE_MODE_NEOX)
    params = llama.from_hf_state_dict(cfg, sd, GGMLType.F32)
    toks = np.asarray([[3, 9, 27, 4]], np.int32)
    pos = np.arange(4, dtype=np.int32)[None]
    c1 = llama.init_cache(cfg, dtype=jnp.float32)
    ref, _ = llama.forward(cfg, params, jnp.asarray(toks), jnp.asarray(pos),
                           c1, 0, compute_dtype=jnp.float32)
    c2 = llama.init_cache(cfg, dtype=jnp.float32)
    got, _ = llama.forward(cfg, llama.fuse_qkv(params), jnp.asarray(toks),
                           jnp.asarray(pos), c2, 0, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-5, atol=1e-5)


def test_gptj_legacy_bin_loader(tmp_path):
    """Round-trip a tiny gpt-j .bin (reference loader name map,
    gpt-j/main.cpp:96-352) through gptj.load_legacy."""
    from ggml_imax_tpu.io.legacy_bin import write_legacy_bin
    from ggml_imax_tpu.quant import codecs
    rng = np.random.default_rng(4)
    E, V, C = 64, 96, 32
    hp = dict(n_vocab=V, n_ctx=C, n_embd=E, n_head=4, n_layer=1, n_rot=16,
              ftype=0)
    vocab = [f"w{i}".encode() for i in range(V)]

    def enc(shape_ne):
        rows = int(np.prod(shape_ne[1:])) if len(shape_ne) > 1 else 1
        x = (rng.standard_normal((rows, shape_ne[0])) * 0.1).astype(np.float32)
        return (GGMLType.F32, tuple(shape_ne), x)

    tensors = {
        "transformer.wte.weight": enc((E, V)),
        "transformer.ln_f.weight": enc((E,)),
        "transformer.ln_f.bias": enc((E,)),
        "lm_head.weight": enc((E, V)),
        "lm_head.bias": enc((V,)),
    }
    p = "transformer.h.0"
    for name, ne in [("ln_1.weight", (E,)), ("ln_1.bias", (E,)),
                     ("attn.q_proj.weight", (E, E)),
                     ("attn.k_proj.weight", (E, E)),
                     ("attn.v_proj.weight", (E, E)),
                     ("attn.out_proj.weight", (E, E)),
                     ("mlp.fc_in.weight", (E, 4 * E)),
                     ("mlp.fc_in.bias", (4 * E,)),
                     ("mlp.fc_out.weight", (4 * E, E)),
                     ("mlp.fc_out.bias", (E,))]:
        tensors[f"{p}.{name}"] = enc(ne)
    path = tmp_path / "gptj-tiny.bin"
    write_legacy_bin(path, hp, gptj.HPARAM_NAMES, vocab, tensors)

    cfg, params, tok = gptj.load_legacy(path)
    assert cfg.n_embd == E and cfg.n_rot == 16 and len(params["layers"]) == 1
    assert tok.decode([5]) == "w5"          # vocab round-trip via ids
    cache = gptj.init_cache(cfg, dtype=jnp.float32)
    toks = jnp.asarray([[1, 2, 3]], jnp.int32)
    pos = jnp.arange(3, dtype=jnp.int32)[None]
    logits, _ = gptj.forward(cfg, params, toks, pos, cache, 0,
                             compute_dtype=jnp.float32)
    assert logits.shape == (1, 3, V)
    assert np.isfinite(np.asarray(logits)).all()
