"""Op-level tests: RoPE golden parity vs the compiled reference, plus numpy
checks for norms / softmax / activations / sampling / tokenizer / get_rows."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ggml_imax_tpu.ops import rope as rope_mod
from ggml_imax_tpu.ops.activations import gelu, gelu_quick, silu
from ggml_imax_tpu.ops.attention import attention_xla
from ggml_imax_tpu.ops.embedding import get_rows
from ggml_imax_tpu.ops.norms import layer_norm, rms_norm
from ggml_imax_tpu.ops.sampling import sample_device, sample_greedy, sample_host
from ggml_imax_tpu.ops.softmax import alibi_slopes, soft_max_ext
from ggml_imax_tpu.quant.device import quantize_for_device, dequantize_qtensor
from ggml_imax_tpu.quant import type_from_name
from ggml_imax_tpu.tokenizer.bpe import GreedyBPETokenizer

ROPE_GOLDEN = np.load("tests/fixtures/golden_rope.npz")
ROPE_CASES = ["normal", "normal_scaled", "normal_yarn", "neox", "neox_part",
              "neox_yarn", "normal_base"]


@pytest.mark.parametrize("case", ROPE_CASES)
def test_rope_matches_reference(case):
    x = ROPE_GOLDEN["x"]            # (T, H, D)
    pos = ROPE_GOLDEN["pos"]
    nd, mode, nctx, noc, fb, fs, ef, af, bf, bs = ROPE_GOLDEN[f"rope_{case}_params"]
    out = rope_mod.rope(jnp.asarray(x)[None], jnp.asarray(pos)[None],
                        n_dims=int(nd), mode=int(mode), freq_base=fb,
                        freq_scale=fs, ext_factor=ef, attn_factor=af,
                        beta_fast=bf, beta_slow=bs, n_orig_ctx=int(noc),
                        n_ctx=int(nctx))
    ref = ROPE_GOLDEN[f"rope_{case}"]
    err = np.abs(np.asarray(out)[0] - ref).max()
    # the reference CPU rope accumulates theta iteratively in f32
    # (theta *= theta_scale, ggml.c:13761); we use analytic powers like its
    # CUDA backend does, so small drift at large positions is expected
    assert err < 3e-3, f"{case}: max err {err}"


def test_rope_backward_is_inverse():
    x = ROPE_GOLDEN["x"]
    pos = ROPE_GOLDEN["pos"]
    f = rope_mod.rope(jnp.asarray(x)[None], jnp.asarray(pos)[None], forward=True)
    # inverse rotation (sin sign flipped) undoes the forward rotation
    b = rope_mod.rope(f, jnp.asarray(pos)[None], forward=False)
    assert np.abs(np.asarray(b)[0] - x).max() < 1e-4


def test_layer_norm_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 32)).astype(np.float32)
    g = rng.standard_normal(32).astype(np.float32)
    b = rng.standard_normal(32).astype(np.float32)
    out = layer_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b))
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    ref = (x - mu) / np.sqrt(var + 1e-5) * g + b
    assert np.abs(np.asarray(out) - ref).max() < 1e-5


def test_rms_norm_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 32)).astype(np.float32)
    g = rng.standard_normal(32).astype(np.float32)
    out = rms_norm(jnp.asarray(x), jnp.asarray(g))
    ref = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-5) * g
    assert np.abs(np.asarray(out) - ref).max() < 1e-5


def test_soft_max_ext_mask_and_scale():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 2, 3, 8)).astype(np.float32)
    mask = np.zeros((3, 8), np.float32)
    mask[:, 5:] = -np.inf
    out = np.asarray(soft_max_ext(jnp.asarray(x), jnp.asarray(mask), scale=0.5))
    assert np.abs(out.sum(-1) - 1.0).max() < 1e-6
    assert out[..., 5:].max() == 0.0
    z = x[0, 0, 0, :5] * 0.5
    ref = np.exp(z - z.max()); ref /= ref.sum()
    assert np.abs(out[0, 0, 0, :5] - ref).max() < 1e-6


def test_alibi_slopes_formula():
    s = alibi_slopes(8, 8.0)
    assert np.allclose(s, [2.0 ** (-(i + 1)) for i in range(8)])
    s12 = alibi_slopes(12, 8.0)   # non-power-of-two head count
    n_head_log2 = 8
    m0, m1 = 2.0 ** (-8.0 / n_head_log2), 2.0 ** (-4.0 / n_head_log2)
    ref = [m0 ** (h + 1) if h < n_head_log2 else m1 ** (2 * (h - n_head_log2) + 1)
           for h in range(12)]
    assert np.allclose(s12, ref)


def test_activations():
    x = np.linspace(-4, 4, 33, dtype=np.float32)
    g = np.asarray(gelu(jnp.asarray(x)))
    ref = 0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi) * x * (1 + 0.044715 * x * x)))
    assert np.abs(g - ref).max() < 1e-4
    s = np.asarray(silu(jnp.asarray(x)))
    assert np.abs(s - x / (1 + np.exp(-x))).max() < 1e-6
    q = np.asarray(gelu_quick(jnp.asarray(x)))
    assert np.abs(q - x / (1 + np.exp(-1.702 * x))).max() < 1e-5


def test_attention_gqa_broadcast():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((1, 4, 8, 16)).astype(np.float32)   # Hq=8
    k = rng.standard_normal((1, 6, 2, 16)).astype(np.float32)   # Hkv=2
    v = rng.standard_normal((1, 6, 2, 16)).astype(np.float32)
    out = attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        precision="highest")
    # manual reference
    kr = np.repeat(k, 4, axis=2)
    vr = np.repeat(v, 4, axis=2)
    s = np.einsum("bqhd,bkhd->bhqk", q, kr) / np.sqrt(16)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bkhd->bqhd", p, vr)
    assert np.abs(np.asarray(out) - ref).max() < 1e-5


def test_get_rows_quantized():
    rng = np.random.default_rng(0)
    table = rng.standard_normal((64, 32)).astype(np.float32)   # (K=64, N=32 rows)
    qt = quantize_for_device(table, type_from_name("q4_0"))
    ids = np.array([0, 5, 31, 5], np.int32)
    rows = np.asarray(get_rows(qt, jnp.asarray(ids), dtype=jnp.float32))
    ref = dequantize_qtensor(qt).T[ids]   # (rows, K)
    assert np.abs(rows - ref).max() < 1e-5


def test_sampler_host_greedy_and_topk():
    logits = np.array([0.1, 3.0, 0.2, 2.9, -1.0], np.float32)
    assert sample_greedy(logits) == 1
    rng = np.random.default_rng(0)
    picks = {sample_host(logits, top_k=2, top_p=1.0, temp=1.0, rng=rng) for _ in range(50)}
    assert picks <= {1, 3}
    # temp -> near-greedy
    picks = {sample_host(logits, top_k=5, top_p=1.0, temp=0.01, rng=rng) for _ in range(20)}
    assert picks == {1}


def test_sampler_device():
    logits = jnp.asarray(np.array([[0.0, 5.0, 0.1, 4.9, -2.0]], np.float32))
    toks = set()
    for i in range(30):
        t = sample_device(logits, jax.random.PRNGKey(i), top_k=2, top_p=1.0, temp=1.0)
        toks.add(int(t[0]))
    assert toks <= {1, 3} and len(toks) == 2
    g = sample_device(logits, jax.random.PRNGKey(0), top_k=1, top_p=1.0, temp=1.0)
    assert int(g[0]) == 1


def test_greedy_tokenizer_roundtrip():
    vocab = ["a", "b", "ab", "abc", " ", "hello", "hel", "lo", "<eos>"]
    tok = GreedyBPETokenizer(vocab, special_tokens=["<eos>"])
    ids = tok.encode("abc ab a<eos>")
    assert tok.decode(ids) == "abc ab a<eos>"
    assert ids[0] == vocab.index("abc")
    assert ids[-1] == vocab.index("<eos>")
