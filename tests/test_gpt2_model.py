"""GPT-2 model parity vs HuggingFace transformers (torch CPU).

The analog of the reference's fixed-seed e2e golden runs (ci/run.sh:90-94)
plus its HF-tokenizer parity check (common.h:94-101): we build a tiny
randomly-initialized HF GPT2LMHeadModel, convert its weights, and require
logits parity in f32 and close agreement for the KV-cached decode path.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ggml_imax_tpu.models import gpt2
from ggml_imax_tpu.quant.formats import GGMLType


@pytest.fixture(scope="module")
def tiny_hf():
    torch.manual_seed(0)
    hf_cfg = transformers.GPT2Config(
        vocab_size=128, n_positions=64, n_embd=64, n_layer=2, n_head=4)
    model = transformers.GPT2LMHeadModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    cfg = gpt2.GPT2Config(n_vocab=128, n_ctx=64, n_embd=64, n_head=4, n_layer=2)
    return model, sd, cfg


def hf_logits(model, tokens):
    with torch.no_grad():
        return model(torch.tensor(tokens)).logits.numpy()


def test_gpt2_logits_parity_f32(tiny_hf):
    model, sd, cfg = tiny_hf
    params = gpt2.from_hf_state_dict(cfg, sd, GGMLType.F32)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 128, (2, 12)).astype(np.int32)
    positions = np.broadcast_to(np.arange(12, dtype=np.int32), (2, 12))

    cache = gpt2.init_cache(cfg, batch=2, dtype=jnp.float32)
    logits, _ = gpt2.forward(cfg, params, jnp.asarray(tokens),
                             jnp.asarray(positions), cache, 0,
                             compute_dtype=jnp.float32, precision="highest")
    ref = hf_logits(model, tokens)
    err = np.abs(np.asarray(logits) - ref).max()
    assert err < 2e-3, f"logits mismatch: {err}"


def test_gpt2_kv_decode_matches_full_forward(tiny_hf):
    model, sd, cfg = tiny_hf
    params = gpt2.from_hf_state_dict(cfg, sd, GGMLType.F32)
    rng = np.random.default_rng(1)
    toks = rng.integers(0, 128, (1, 10)).astype(np.int32)

    # full forward
    cache = gpt2.init_cache(cfg, batch=1, dtype=jnp.float32)
    pos = np.arange(10, dtype=np.int32)[None]
    full_logits, _ = gpt2.forward(cfg, params, jnp.asarray(toks),
                                  jnp.asarray(pos), cache, 0,
                                  compute_dtype=jnp.float32, precision="highest")

    # prefill 6 then decode 4 one-by-one
    cache = gpt2.init_cache(cfg, batch=1, dtype=jnp.float32)
    l6, cache = gpt2.forward(cfg, params, jnp.asarray(toks[:, :6]),
                             jnp.asarray(pos[:, :6]), cache, 0,
                             compute_dtype=jnp.float32, precision="highest")
    outs = [np.asarray(l6)]
    for i in range(6, 10):
        li, cache = gpt2.forward(cfg, params, jnp.asarray(toks[:, i:i+1]),
                                 jnp.asarray(pos[:, i:i+1]), cache, i,
                                 compute_dtype=jnp.float32, precision="highest")
        outs.append(np.asarray(li))
    step_logits = np.concatenate(outs, axis=1)
    err = np.abs(step_logits - np.asarray(full_logits)).max()
    # f32 tolerance: T=10 vs T=1 GEMMs accumulate in different orders
    assert err < 1e-3, f"KV decode mismatch: {err}"


def test_gpt2_q4_perplexity_sane(tiny_hf):
    """Quantized weights still produce usable logits (random model => loose
    check: top-1 agreement with f32 on most positions)."""
    model, sd, cfg = tiny_hf
    p32 = gpt2.from_hf_state_dict(cfg, sd, GGMLType.F32)
    pq = gpt2.from_hf_state_dict(cfg, sd, GGMLType.Q8_0)
    rng = np.random.default_rng(2)
    toks = rng.integers(0, 128, (1, 16)).astype(np.int32)
    pos = np.arange(16, dtype=np.int32)[None]
    c1 = gpt2.init_cache(cfg, dtype=jnp.float32)
    c2 = gpt2.init_cache(cfg, dtype=jnp.float32)
    l32, _ = gpt2.forward(cfg, p32, jnp.asarray(toks), jnp.asarray(pos), c1, 0,
                          compute_dtype=jnp.float32, precision="highest")
    lq, _ = gpt2.forward(cfg, pq, jnp.asarray(toks), jnp.asarray(pos), c2, 0,
                         compute_dtype=jnp.float32, precision="highest")
    agree = (np.argmax(np.asarray(l32), -1) == np.argmax(np.asarray(lq), -1)).mean()
    assert agree > 0.8, f"top-1 agreement {agree}"


def test_gpt2_jitted_decode_step(tiny_hf):
    model, sd, cfg = tiny_hf
    params = gpt2.from_hf_state_dict(cfg, sd, GGMLType.F32)

    @jax.jit
    def step(params, tok, pos, cache, n_past):
        return gpt2.forward(cfg, params, tok, pos, cache, n_past,
                            compute_dtype=jnp.float32, precision="highest")

    cache = gpt2.init_cache(cfg, dtype=jnp.float32)
    tok = jnp.asarray([[5]], jnp.int32)
    n_past = 0
    for i in range(3):
        pos = jnp.asarray([[i]], jnp.int32)
        logits, cache = step(params, tok, pos, cache, i)
        tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
    assert logits.shape == (1, 1, 128)
