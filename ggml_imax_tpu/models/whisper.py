"""Whisper — encoder-decoder ASR (the reference's largest example, an actual
library: examples/whisper/whisper.{h,cpp}, 8,571 LoC).

Graph parity (citations into /root/reference/examples/whisper/whisper.cpp):
- conv frontend: conv1d(k=3,s=1,p=1)+gelu -> conv1d(k=3,s=2,p=1)+gelu
  (whisper_build_graph_conv :1824-1884).
- encoder: +e_pe positional, n_audio_layer pre-LN transformer blocks with
  biasless K projection, ln_post (whisper_build_graph_encoder :1885-2120).
- cross-KV precompute: per decoder layer K = cross_k_w . enc (no bias),
  V = cross_v_w . enc + b, computed once per audio chunk
  (whisper_build_graph_cross :2130-2215).
- decoder: token + learned positional embeddings, blocks of causal self-attn
  (kv_self cache) + cross-attn (kv_cross) + mlp, tied logits
  (whisper_build_graph_decoder :2314+).

TPU-native: the three reference graphs collapse into three jitted pure
functions; kv_self is a donated in-place cache (models/common.py); the
encoder is compiled once per audio-context bucket. Weights may be QTensors
(quantized: the reference's Q5_0 whisper configs) — matmuls route through
ops.qmatmul.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.activations import gelu
from ..ops.conv import conv_1d
from ..ops.flash_attention import attention
from ..ops.norms import layer_norm
from ..ops.qmatmul import qmatmul
from ..quant.device import to_device_format
from ..quant.formats import FORMATS, GGMLType
from .common import (KVCache, attention_mask, init_kv_cache, read_kv,
                     update_kv)


@dataclass(frozen=True)
class WhisperConfig:
    """hparams as stored in the ggml checkpoint (whisper.cpp:549-571)."""
    n_vocab: int = 51864
    n_audio_ctx: int = 1500
    n_audio_state: int = 384
    n_audio_head: int = 6
    n_audio_layer: int = 4
    n_text_ctx: int = 448
    n_text_state: int = 384
    n_text_head: int = 6
    n_text_layer: int = 4
    n_mels: int = 80

    @property
    def is_multilingual(self):                    # whisper.cpp:420-422
        return self.n_vocab >= 51865

    # special tokens (whisper.cpp:407-418); multilingual ids shift by +1
    @property
    def token_eot(self):
        return 50256 + int(self.is_multilingual)

    @property
    def token_sot(self):
        return 50257 + int(self.is_multilingual)

    @property
    def token_prev(self):
        return 50360 + int(self.is_multilingual)

    @property
    def token_nosp(self):
        return 50361 + int(self.is_multilingual)

    @property
    def token_not(self):
        return 50362 + int(self.is_multilingual)

    @property
    def token_beg(self):
        return 50363 + int(self.is_multilingual)

    @property
    def token_transcribe(self):
        return 50358 + int(self.is_multilingual)

    @property
    def token_translate(self):
        return 50357 + int(self.is_multilingual)


def load_legacy(path: str | Path):
    """Whisper ggml .bin reader (whisper.cpp:1320-1750): magic, 11 i32
    hparams, mel filters, vocab, tensor records. Returns
    (cfg, params, filters, vocab list[bytes])."""
    buf = np.fromfile(path, dtype=np.uint8)
    pos = 0

    def rd(fmt):
        nonlocal pos
        size = struct.calcsize(fmt)
        vals = struct.unpack_from(fmt, buf, pos)
        pos += size
        return vals if len(vals) > 1 else vals[0]

    if rd("<I") != 0x67676D6C:
        raise ValueError(f"{path}: bad magic")
    names = ["n_vocab", "n_audio_ctx", "n_audio_state", "n_audio_head",
             "n_audio_layer", "n_text_ctx", "n_text_state", "n_text_head",
             "n_text_layer", "n_mels", "ftype"]
    h = dict(zip(names, rd("<11i")))
    cfg = WhisperConfig(**{k: v for k, v in h.items() if k != "ftype"})

    n_mel, n_fft = rd("<2i")
    filters = np.frombuffer(buf, np.float32, n_mel * n_fft,
                            pos).reshape(n_mel, n_fft).copy()
    pos += 4 * n_mel * n_fft

    n_vocab_file = rd("<i")
    vocab: list[bytes] = []
    for _ in range(n_vocab_file):
        ln = rd("<I")
        vocab.append(bytes(buf[pos:pos + ln]))
        pos += ln
    while len(vocab) < cfg.n_vocab:               # whisper.cpp:1488-1510
        vocab.append(f"[_extra_token_{len(vocab)}]".encode())

    tensors = {}
    while pos < len(buf):
        n_dims, name_len, ttype = rd("<3i")
        ne = list(rd(f"<{n_dims}i")) if n_dims > 1 else [rd("<i")]
        name = bytes(buf[pos:pos + name_len]).decode()
        pos += name_len
        t = GGMLType(ttype)
        n_el = int(np.prod(ne))
        nbytes = n_el // FORMATS[t].block_size * FORMATS[t].type_size
        tensors[name] = (t, tuple(ne), buf[pos:pos + nbytes])
        pos += nbytes

    params = _params_from_tensors(cfg, tensors)
    return cfg, params, filters, vocab


def _dev(tensors, name):
    t, ne, raw = tensors[name]
    return to_device_format(raw, t, ne)


def _vec(tensors, name):
    from ..quant import codecs
    t, ne, raw = tensors[name]
    return jnp.asarray(codecs.dequantize(raw, t, shape=tuple(reversed(ne))))


def _params_from_tensors(cfg: WhisperConfig, tensors):
    """Map ggml tensor names (whisper.cpp:1530-1644) to our pytree."""
    d, v = _dev, _vec
    p = {
        "e_pe": v(tensors, "encoder.positional_embedding"),
        "e_conv1_w": v(tensors, "encoder.conv1.weight"),
        "e_conv1_b": v(tensors, "encoder.conv1.bias").reshape(1, -1, 1),
        "e_conv2_w": v(tensors, "encoder.conv2.weight"),
        "e_conv2_b": v(tensors, "encoder.conv2.bias").reshape(1, -1, 1),
        "e_ln_g": v(tensors, "encoder.ln_post.weight"),
        "e_ln_b": v(tensors, "encoder.ln_post.bias"),
        "d_te": d(tensors, "decoder.token_embedding.weight"),
        "d_pe": v(tensors, "decoder.positional_embedding"),
        "d_ln_g": v(tensors, "decoder.ln.weight"),
        "d_ln_b": v(tensors, "decoder.ln.bias"),
        "enc_layers": [], "dec_layers": [],
    }
    for i in range(cfg.n_audio_layer):
        pre = f"encoder.blocks.{i}"
        p["enc_layers"].append({
            "ln0_g": v(tensors, f"{pre}.attn_ln.weight"),
            "ln0_b": v(tensors, f"{pre}.attn_ln.bias"),
            "q_w": d(tensors, f"{pre}.attn.query.weight"),
            "q_b": v(tensors, f"{pre}.attn.query.bias"),
            "k_w": d(tensors, f"{pre}.attn.key.weight"),
            "v_w": d(tensors, f"{pre}.attn.value.weight"),
            "v_b": v(tensors, f"{pre}.attn.value.bias"),
            "o_w": d(tensors, f"{pre}.attn.out.weight"),
            "o_b": v(tensors, f"{pre}.attn.out.bias"),
            "ln1_g": v(tensors, f"{pre}.mlp_ln.weight"),
            "ln1_b": v(tensors, f"{pre}.mlp_ln.bias"),
            "mlp0_w": d(tensors, f"{pre}.mlp.0.weight"),
            "mlp0_b": v(tensors, f"{pre}.mlp.0.bias"),
            "mlp1_w": d(tensors, f"{pre}.mlp.2.weight"),
            "mlp1_b": v(tensors, f"{pre}.mlp.2.bias"),
        })
    for i in range(cfg.n_text_layer):
        pre = f"decoder.blocks.{i}"
        p["dec_layers"].append({
            "ln0_g": v(tensors, f"{pre}.attn_ln.weight"),
            "ln0_b": v(tensors, f"{pre}.attn_ln.bias"),
            "q_w": d(tensors, f"{pre}.attn.query.weight"),
            "q_b": v(tensors, f"{pre}.attn.query.bias"),
            "k_w": d(tensors, f"{pre}.attn.key.weight"),
            "v_w": d(tensors, f"{pre}.attn.value.weight"),
            "v_b": v(tensors, f"{pre}.attn.value.bias"),
            "o_w": d(tensors, f"{pre}.attn.out.weight"),
            "o_b": v(tensors, f"{pre}.attn.out.bias"),
            "xln_g": v(tensors, f"{pre}.cross_attn_ln.weight"),
            "xln_b": v(tensors, f"{pre}.cross_attn_ln.bias"),
            "xq_w": d(tensors, f"{pre}.cross_attn.query.weight"),
            "xq_b": v(tensors, f"{pre}.cross_attn.query.bias"),
            "xk_w": d(tensors, f"{pre}.cross_attn.key.weight"),
            "xv_w": d(tensors, f"{pre}.cross_attn.value.weight"),
            "xv_b": v(tensors, f"{pre}.cross_attn.value.bias"),
            "xo_w": d(tensors, f"{pre}.cross_attn.out.weight"),
            "xo_b": v(tensors, f"{pre}.cross_attn.out.bias"),
            "ln1_g": v(tensors, f"{pre}.mlp_ln.weight"),
            "ln1_b": v(tensors, f"{pre}.mlp_ln.bias"),
            "mlp0_w": d(tensors, f"{pre}.mlp.0.weight"),
            "mlp0_b": v(tensors, f"{pre}.mlp.0.bias"),
            "mlp1_w": d(tensors, f"{pre}.mlp.2.weight"),
            "mlp1_b": v(tensors, f"{pre}.mlp.2.bias"),
        })
    return p


def from_hf_state_dict(cfg: WhisperConfig, sd: dict,
                       wtype: GGMLType = GGMLType.F32):
    """transformers WhisperModel state dict -> params (for parity tests;
    HF Linear weights (out,in) -> our (K=in, N=out))."""
    from ..quant.device import QTensor

    def q2d(w):
        w = np.ascontiguousarray(np.asarray(w, np.float32).T)
        if wtype == GGMLType.F32:
            return QTensor("dense", jnp.asarray(w), None, None,
                           w.shape[0], w.shape[1], wtype)
        from ..quant.device import quantize_for_device
        return quantize_for_device(w, wtype)

    def arr(x):
        return jnp.asarray(np.asarray(x, np.float32))

    p = {
        "e_pe": arr(sd["encoder.embed_positions.weight"]),
        "e_conv1_w": arr(sd["encoder.conv1.weight"]),
        "e_conv1_b": arr(sd["encoder.conv1.bias"]).reshape(1, -1, 1),
        "e_conv2_w": arr(sd["encoder.conv2.weight"]),
        "e_conv2_b": arr(sd["encoder.conv2.bias"]).reshape(1, -1, 1),
        "e_ln_g": arr(sd["encoder.layer_norm.weight"]),
        "e_ln_b": arr(sd["encoder.layer_norm.bias"]),
        "d_te": q2d(sd["decoder.embed_tokens.weight"]),   # (V,E) -> k=E, n=V
        "d_pe": arr(sd["decoder.embed_positions.weight"]),
        "d_ln_g": arr(sd["decoder.layer_norm.weight"]),
        "d_ln_b": arr(sd["decoder.layer_norm.bias"]),
        "enc_layers": [], "dec_layers": [],
    }
    for i in range(cfg.n_audio_layer):
        pre = f"encoder.layers.{i}"
        p["enc_layers"].append({
            "ln0_g": arr(sd[f"{pre}.self_attn_layer_norm.weight"]),
            "ln0_b": arr(sd[f"{pre}.self_attn_layer_norm.bias"]),
            "q_w": q2d(sd[f"{pre}.self_attn.q_proj.weight"]),
            "q_b": arr(sd[f"{pre}.self_attn.q_proj.bias"]),
            "k_w": q2d(sd[f"{pre}.self_attn.k_proj.weight"]),
            "v_w": q2d(sd[f"{pre}.self_attn.v_proj.weight"]),
            "v_b": arr(sd[f"{pre}.self_attn.v_proj.bias"]),
            "o_w": q2d(sd[f"{pre}.self_attn.out_proj.weight"]),
            "o_b": arr(sd[f"{pre}.self_attn.out_proj.bias"]),
            "ln1_g": arr(sd[f"{pre}.final_layer_norm.weight"]),
            "ln1_b": arr(sd[f"{pre}.final_layer_norm.bias"]),
            "mlp0_w": q2d(sd[f"{pre}.fc1.weight"]),
            "mlp0_b": arr(sd[f"{pre}.fc1.bias"]),
            "mlp1_w": q2d(sd[f"{pre}.fc2.weight"]),
            "mlp1_b": arr(sd[f"{pre}.fc2.bias"]),
        })
    for i in range(cfg.n_text_layer):
        pre = f"decoder.layers.{i}"
        p["dec_layers"].append({
            "ln0_g": arr(sd[f"{pre}.self_attn_layer_norm.weight"]),
            "ln0_b": arr(sd[f"{pre}.self_attn_layer_norm.bias"]),
            "q_w": q2d(sd[f"{pre}.self_attn.q_proj.weight"]),
            "q_b": arr(sd[f"{pre}.self_attn.q_proj.bias"]),
            "k_w": q2d(sd[f"{pre}.self_attn.k_proj.weight"]),
            "v_w": q2d(sd[f"{pre}.self_attn.v_proj.weight"]),
            "v_b": arr(sd[f"{pre}.self_attn.v_proj.bias"]),
            "o_w": q2d(sd[f"{pre}.self_attn.out_proj.weight"]),
            "o_b": arr(sd[f"{pre}.self_attn.out_proj.bias"]),
            "xln_g": arr(sd[f"{pre}.encoder_attn_layer_norm.weight"]),
            "xln_b": arr(sd[f"{pre}.encoder_attn_layer_norm.bias"]),
            "xq_w": q2d(sd[f"{pre}.encoder_attn.q_proj.weight"]),
            "xq_b": arr(sd[f"{pre}.encoder_attn.q_proj.bias"]),
            "xk_w": q2d(sd[f"{pre}.encoder_attn.k_proj.weight"]),
            "xv_w": q2d(sd[f"{pre}.encoder_attn.v_proj.weight"]),
            "xv_b": arr(sd[f"{pre}.encoder_attn.v_proj.bias"]),
            "xo_w": q2d(sd[f"{pre}.encoder_attn.out_proj.weight"]),
            "xo_b": arr(sd[f"{pre}.encoder_attn.out_proj.bias"]),
            "ln1_g": arr(sd[f"{pre}.final_layer_norm.weight"]),
            "ln1_b": arr(sd[f"{pre}.final_layer_norm.bias"]),
            "mlp0_w": q2d(sd[f"{pre}.fc1.weight"]),
            "mlp0_b": arr(sd[f"{pre}.fc1.bias"]),
            "mlp1_w": q2d(sd[f"{pre}.fc2.weight"]),
            "mlp1_b": arr(sd[f"{pre}.fc2.bias"]),
        })
    return p


def synthetic_params_device(cfg: WhisperConfig,
                            wtype: "GGMLType" = None,
                            seed: int = 0, scale: float = 0.02):
    """Random device-generated weights at full geometry — benchmarks only
    (zero network egress, so no real checkpoints; timing is value-
    independent). Mirrors gptj.synthetic_params_device: packed payloads are
    fabricated with jax.random directly in device format, so nothing
    multi-hundred-MB crosses the tunnel. Default wtype Q5_0 — the Whisper
    secondary config of BASELINE.md."""
    from ..quant.formats import GGMLType as GT
    from ..quant.device import QTensor
    wtype = wtype or GT.Q5_0
    key = jax.random.key(seed)
    counter = [0]

    def nxt():
        counter[0] += 1
        return jax.random.fold_in(key, counter[0])

    def q(shape_kn):
        k, n = shape_kn
        kq, ks2 = jax.random.split(nxt())
        if wtype == GT.Q5_0:
            qv = jax.random.randint(kq, (k, n), -16, 16, dtype=jnp.int8)
            sc = jnp.abs(jax.random.normal(ks2, (k // 32, n),
                                           jnp.float32)) * (scale / 9.2)
            return QTensor("int8", qv, sc, None, k, n, wtype)
        if wtype == GT.Q8_0:
            qv = jax.random.randint(kq, (k, n), -127, 128, dtype=jnp.int8)
            sc = jnp.abs(jax.random.normal(ks2, (k // 32, n),
                                           jnp.float32)) * (scale / 74)
            return QTensor("int8", qv, sc, None, k, n, wtype)
        if wtype == GT.Q4_0:
            qs = jax.random.randint(kq, (k // 2, n), 0, 256, dtype=jnp.uint8)
            sc = jnp.abs(jax.random.normal(ks2, (k // 32, n),
                                           jnp.float32)) * (scale / 4.6)
            return QTensor("nib4", qs, sc, None, k, n, wtype, zero=8)
        w = jax.random.normal(kq, (k, n), jnp.float32) * scale
        return QTensor("dense", w.astype(jnp.bfloat16), None, None, k, n,
                       wtype)

    def vec(*shape):
        return jax.random.normal(nxt(), shape, jnp.float32) * scale

    E, Et, V = cfg.n_audio_state, cfg.n_text_state, cfg.n_vocab
    p = {
        "e_pe": vec(cfg.n_audio_ctx, E),
        "e_conv1_w": vec(E, cfg.n_mels, 3),
        "e_conv1_b": vec(1, E, 1),
        "e_conv2_w": vec(E, E, 3),
        "e_conv2_b": vec(1, E, 1),
        "e_ln_g": vec(E) + 1.0, "e_ln_b": vec(E),
        "d_te": q((Et, V)),
        "d_pe": vec(cfg.n_text_ctx, Et),
        "d_ln_g": vec(Et) + 1.0, "d_ln_b": vec(Et),
        "enc_layers": [], "dec_layers": [],
    }
    for _ in range(cfg.n_audio_layer):
        p["enc_layers"].append({
            "ln0_g": vec(E) + 1.0, "ln0_b": vec(E),
            "q_w": q((E, E)), "q_b": vec(E),
            "k_w": q((E, E)),
            "v_w": q((E, E)), "v_b": vec(E),
            "o_w": q((E, E)), "o_b": vec(E),
            "ln1_g": vec(E) + 1.0, "ln1_b": vec(E),
            "mlp0_w": q((E, 4 * E)), "mlp0_b": vec(4 * E),
            "mlp1_w": q((4 * E, E)), "mlp1_b": vec(E),
        })
    for _ in range(cfg.n_text_layer):
        p["dec_layers"].append({
            "ln0_g": vec(Et) + 1.0, "ln0_b": vec(Et),
            "q_w": q((Et, Et)), "q_b": vec(Et),
            "k_w": q((Et, Et)),
            "v_w": q((Et, Et)), "v_b": vec(Et),
            "o_w": q((Et, Et)), "o_b": vec(Et),
            "xln_g": vec(Et) + 1.0, "xln_b": vec(Et),
            "xq_w": q((Et, Et)), "xq_b": vec(Et),
            "xk_w": q((Et, Et)),
            "xv_w": q((Et, Et)), "xv_b": vec(Et),
            "xo_w": q((Et, Et)), "xo_b": vec(Et),
            "ln1_g": vec(Et) + 1.0, "ln1_b": vec(Et),
            "mlp0_w": q((Et, 4 * Et)), "mlp0_b": vec(4 * Et),
            "mlp1_w": q((4 * Et, Et)), "mlp1_b": vec(Et),
        })
    return p


def _mm(x, w, compute_dtype, precision):
    return qmatmul(x, w, compute_dtype=compute_dtype, out_dtype=jnp.float32,
                   precision=precision)


def encode(cfg: WhisperConfig, params, mel, *, compute_dtype=jnp.bfloat16,
           precision=None):
    """mel: (B, n_mels, 2*n_audio_ctx) -> encoder states (B, n_audio_ctx, E).
    whisper_build_graph_conv + _encoder."""
    H = cfg.n_audio_head
    E = cfg.n_audio_state
    D = E // H
    mm = lambda x, w: _mm(x, w, compute_dtype, precision)

    cur = gelu(conv_1d(mel, params["e_conv1_w"], 1, 1) + params["e_conv1_b"])
    cur = gelu(conv_1d(cur, params["e_conv2_w"], 2, 1) + params["e_conv2_b"])
    x = cur.transpose(0, 2, 1)                     # (B, T=1500, E)
    B, T, _ = x.shape
    x = x + params["e_pe"][None, :T]

    for lp in params["enc_layers"]:
        cur = layer_norm(x, lp["ln0_g"], lp["ln0_b"])
        q = (mm(cur, lp["q_w"]) + lp["q_b"]).reshape(B, T, H, D)
        k = mm(cur, lp["k_w"]).reshape(B, T, H, D)            # no bias
        v = (mm(cur, lp["v_w"]) + lp["v_b"]).reshape(B, T, H, D)
        a = attention(q, k, v, None, out_dtype=jnp.float32,
                      precision=precision).reshape(B, T, E)
        x = x + mm(a, lp["o_w"]) + lp["o_b"]
        cur = layer_norm(x, lp["ln1_g"], lp["ln1_b"])
        ff = gelu(mm(cur, lp["mlp0_w"]) + lp["mlp0_b"])
        x = x + mm(ff, lp["mlp1_w"]) + lp["mlp1_b"]

    return layer_norm(x, params["e_ln_g"], params["e_ln_b"])


def precompute_cross_kv(cfg: WhisperConfig, params, enc, *,
                        compute_dtype=jnp.bfloat16, precision=None):
    """whisper_build_graph_cross: per decoder layer K/V of the encoder
    output. Returns (K, V): each (n_text_layer, B, T_audio, H, D)."""
    H = cfg.n_text_head
    D = cfg.n_text_state // H
    B, T, _ = enc.shape
    ks, vs = [], []
    if "dec_stack" in params:
        from ..ops.qmatmul import qmatmul_stacked
        st = params["dec_stack"]
        for li in range(cfg.n_text_layer):
            i = jnp.int32(li)
            ks.append(qmatmul_stacked(enc, st["xk_w"], i)
                      .reshape(B, T, H, D))
            vs.append((qmatmul_stacked(enc, st["xv_w"], i)
                       + st["xv_b"][li]).reshape(B, T, H, D))
        return jnp.stack(ks), jnp.stack(vs)
    for lp in params["dec_layers"]:
        ks.append(_mm(enc, lp["xk_w"], compute_dtype, precision)
                  .reshape(B, T, H, D))
        vs.append((_mm(enc, lp["xv_w"], compute_dtype, precision)
                   + lp["xv_b"]).reshape(B, T, H, D))
    return jnp.stack(ks), jnp.stack(vs)


def fuse_dec_qkv(params):
    """Concatenate each decoder layer's self-attention q/k/v into one
    (E, 3E) GEMV (k has no bias in whisper — zero-filled in the fused
    bias). Call BEFORE params_repack_device."""
    from ..quant.device import concat_qtensors
    out = dict(params)
    out["dec_layers"] = []
    for lp in params["dec_layers"]:
        lp = dict(lp)
        E = lp["q_b"].shape[0]
        lp["qkv_w"] = concat_qtensors([lp.pop("q_w"), lp.pop("k_w"),
                                       lp.pop("v_w")])
        lp["qkv_b"] = jnp.concatenate([lp.pop("q_b"), jnp.zeros(E),
                                       lp.pop("v_b")])
        out["dec_layers"].append(lp)
    return out


def prepare_fused(params, cfg=None):
    """Decode fast-path prep (interface parity with gptj/llama)."""
    return fuse_dec_qkv(params)


def stack_decoder(params):
    """Fused+repacked params -> stacked DECODER layout: dec_layers becomes
    one dict of stacked leaves ('dec_stack'); the encoder stays unstacked
    (it is a one-shot prefill graph). decode() then scans over layers with
    the stacked GEMV kernels — the warmup/executable-size fix for the
    24-layer medium decoder. NB whisper's head_dim is 64, below the fused
    attention kernel's 128-lane alignment, so attention itself stays on
    the XLA path (KV caches stay in the (L,B,T,H,D) layout)."""
    from ..quant.device import stack_layers
    out = dict(params)
    out["dec_stack"] = stack_layers(out.pop("dec_layers"))
    return out


def _decode_stacked(cfg: WhisperConfig, params, tokens, positions, cache,
                    cross_kv, n_past, *, compute_dtype, precision):
    from ..ops.qmatmul import qmatmul_stacked
    from ..quant.device import QTensor

    H = cfg.n_text_head
    E = cfg.n_text_state
    D = E // H
    B, T = tokens.shape
    st = params["dec_stack"]
    qts = {k: v for k, v in st.items() if isinstance(v, QTensor)}
    small = {k: v for k, v in st.items() if not isinstance(v, QTensor)}
    xk, xv = cross_kv

    from ..ops.embedding import get_rows
    x = get_rows(params["d_te"], tokens, dtype=jnp.float32)
    x = x + params["d_pe"][positions]
    mask = attention_mask(positions, cache.n_ctx, n_past)

    def body(carry, xs):
        x, cache = carry
        li, sm = xs
        cur = layer_norm(x, sm["ln0_g"], sm["ln0_b"])
        qkv = qmatmul_stacked(cur, qts["qkv_w"], li) + sm["qkv_b"]
        q = qkv[..., :E].reshape(B, T, H, D)
        k = qkv[..., E:2 * E].reshape(B, T, H, D)
        v = qkv[..., 2 * E:].reshape(B, T, H, D)
        cache2 = update_kv(cache, li, k, v, n_past)
        a = attention(q, *read_kv(cache2, li, dtype=q.dtype), mask,
                      out_dtype=jnp.float32, precision=precision)
        x = x + qmatmul_stacked(a.reshape(B, T, E), qts["o_w"], li) \
            + sm["o_b"]

        cur = layer_norm(x, sm["xln_g"], sm["xln_b"])
        q = (qmatmul_stacked(cur, qts["xq_w"], li)
             + sm["xq_b"]).reshape(B, T, H, D)
        xkl = jax.lax.dynamic_index_in_dim(xk, li, 0, keepdims=False)
        xvl = jax.lax.dynamic_index_in_dim(xv, li, 0, keepdims=False)
        a = attention(q, xkl.astype(q.dtype), xvl.astype(q.dtype), None,
                      out_dtype=jnp.float32, precision=precision)
        x = x + qmatmul_stacked(a.reshape(B, T, E), qts["xo_w"], li) \
            + sm["xo_b"]

        cur = layer_norm(x, sm["ln1_g"], sm["ln1_b"])
        ff = gelu(qmatmul_stacked(cur, qts["mlp0_w"], li) + sm["mlp0_b"])
        x = x + qmatmul_stacked(ff, qts["mlp1_w"], li) + sm["mlp1_b"]
        return (x, cache2), None

    import jax  # noqa: F401  (body traces under jax)
    lis = jnp.arange(cfg.n_text_layer, dtype=jnp.int32)
    from .common import scan_layers
    (x, cache), _ = scan_layers(body, (x, cache), lis, small)
    x = layer_norm(x, params["d_ln_g"], params["d_ln_b"])
    logits = _mm(x, params["d_te"], compute_dtype, precision)   # tied head
    if params["d_te"].n > cfg.n_vocab:            # padded head columns
        logits = logits[..., :cfg.n_vocab]
    return logits, cache


def init_cache(cfg: WhisperConfig, batch: int = 1, n_ctx: int | None = None,
               dtype=jnp.bfloat16) -> KVCache:
    return init_kv_cache(cfg.n_text_layer, batch, n_ctx or cfg.n_text_ctx,
                         cfg.n_text_head, cfg.n_text_state // cfg.n_text_head,
                         dtype)


def decode(cfg: WhisperConfig, params, tokens, positions, cache: KVCache,
           cross_kv, n_past, *, compute_dtype=jnp.bfloat16, precision=None,
           return_cross_attn: bool = False):
    """whisper_build_graph_decoder: tokens (B, T) -> (logits (B,T,V), cache).
    cross_kv from precompute_cross_kv. With return_cross_attn, also returns
    cross-attention probabilities (n_text_layer, B, H, T, T_audio) — the
    alignment signal for DTW token timestamps (whisper.cpp:355-378)."""
    if "dec_stack" in params:
        if return_cross_attn:
            raise ValueError(
                "return_cross_attn (DTW token timestamps) needs the "
                "unstacked decoder — keep a params copy without "
                "stack_decoder for timestamp extraction")
        return _decode_stacked(cfg, params, tokens, positions, cache,
                               cross_kv, n_past, compute_dtype=compute_dtype,
                               precision=precision)
    H = cfg.n_text_head
    E = cfg.n_text_state
    D = E // H
    B, T = tokens.shape
    mm = lambda x, w: _mm(x, w, compute_dtype, precision)
    xk, xv = cross_kv

    from ..ops.embedding import get_rows
    x = get_rows(params["d_te"], tokens, dtype=jnp.float32)
    x = x + params["d_pe"][positions]
    mask = attention_mask(positions, cache.n_ctx, n_past)
    cross_probs = []

    for li, lp in enumerate(params["dec_layers"]):
        cur = layer_norm(x, lp["ln0_g"], lp["ln0_b"])
        q = (mm(cur, lp["q_w"]) + lp["q_b"]).reshape(B, T, H, D)
        k = mm(cur, lp["k_w"]).reshape(B, T, H, D)
        v = (mm(cur, lp["v_w"]) + lp["v_b"]).reshape(B, T, H, D)
        cache = update_kv(cache, li, k, v, n_past)
        a = attention(q, *read_kv(cache, li, dtype=q.dtype), mask,
                      out_dtype=jnp.float32, precision=precision)
        x = x + mm(a.reshape(B, T, E), lp["o_w"]) + lp["o_b"]

        cur = layer_norm(x, lp["xln_g"], lp["xln_b"])
        q = (mm(cur, lp["xq_w"]) + lp["xq_b"]).reshape(B, T, H, D)
        a = attention(q, xk[li], xv[li], None, out_dtype=jnp.float32,
                      precision=precision)
        if return_cross_attn:
            import math as _math
            s_ = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                            xk[li].astype(jnp.float32)) / _math.sqrt(D)
            cross_probs.append(jax.nn.softmax(s_, axis=-1))
        x = x + mm(a.reshape(B, T, E), lp["xo_w"]) + lp["xo_b"]

        cur = layer_norm(x, lp["ln1_g"], lp["ln1_b"])
        ff = gelu(mm(cur, lp["mlp0_w"]) + lp["mlp0_b"])
        x = x + mm(ff, lp["mlp1_w"]) + lp["mlp1_b"]

    x = layer_norm(x, params["d_ln_g"], params["d_ln_b"])
    logits = _mm(x, params["d_te"], compute_dtype, precision)  # tied head
    if return_cross_attn:
        return logits, cache, jnp.stack(cross_probs)
    return logits, cache
