"""LLaMA family (GGUF path — docs/gguf.md standardized keys).

Architecture: rms_norm, SwiGLU MLP, GQA, RoPE. Rope pairing convention:
llama.cpp's GGUF converters permute q/k weights so the model runs in ggml's
interleaved mode 0; HuggingFace checkpoints use the half-split pairing, which
is exactly ggml's NeoX mode — the loader records which mode applies.
"""
from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..io.gguf import GGUFReader
from ..ops.activations import silu
from ..ops.flash_attention import attention
from ..ops.embedding import get_rows
from ..ops.norms import rms_norm
from ..ops.qmatmul import qmatmul
from ..ops.rope import ROPE_MODE_NEOX, ROPE_MODE_NORMAL, rope
from ..quant.device import to_device_format, quantize_for_device
from ..quant.formats import GGMLType
from ..tokenizer.bpe import ByteLevelBPETokenizer
from .common import (KVCache, attention_mask, init_kv_cache, read_kv,
                     update_kv,
                     update_kv_cells)


@dataclass(frozen=True)
class LlamaConfig:
    n_vocab: int = 32000
    n_ctx: int = 4096
    n_embd: int = 4096
    n_head: int = 32
    n_head_kv: int = 32
    n_layer: int = 32
    n_ff: int = 11008
    rms_eps: float = 1e-5
    rope_base: float = 10000.0
    rope_scale: float = 1.0
    rope_mode: int = ROPE_MODE_NORMAL   # GGUF weights are pre-permuted for mode 0

    @property
    def head_dim(self):
        return self.n_embd // self.n_head


def load_gguf(path: str | Path, max_layers: int | None = None):
    """Load a LLaMA-architecture GGUF -> (config, params, tokenizer|None)."""
    r = GGUFReader(path)
    md = r.metadata
    arch = md.get("general.architecture", "llama")

    def key(k, default=None):
        return md.get(f"{arch}.{k}", default)

    n_head = int(key("attention.head_count"))
    cfg = LlamaConfig(
        n_vocab=len(md.get("tokenizer.ggml.tokens", [])) or int(key("vocab_size", 32000)),
        n_ctx=int(key("context_length", 4096)),
        n_embd=int(key("embedding_length")),
        n_head=n_head,
        n_head_kv=int(key("attention.head_count_kv", n_head)),
        n_layer=int(key("block_count")) if max_layers is None
                else min(int(key("block_count")), max_layers),
        n_ff=int(key("feed_forward_length")),
        rms_eps=float(key("attention.layer_norm_rms_epsilon", 1e-5)),
        rope_base=float(key("rope.freq_base", 10000.0)),
        rope_scale=1.0 / float(key("rope.scale_linear", 1.0)),
    )

    def dev(name):
        ti = r.tensors[name]
        return to_device_format(r.tensor_data(name), ti.ggml_type, ti.shape)

    def vec(name):
        ti = r.tensors[name]
        from ..quant import codecs
        return jnp.asarray(codecs.dequantize(r.tensor_data(name), ti.ggml_type,
                                             shape=tuple(reversed(ti.shape))))

    params = {
        "tok_embd": dev("token_embd.weight"),
        "out_norm": vec("output_norm.weight"),
        "output": dev("output.weight") if "output.weight" in r.tensors else None,
        "layers": [],
    }
    for i in range(cfg.n_layer):
        p = f"blk.{i}"
        params["layers"].append({
            "attn_norm": vec(f"{p}.attn_norm.weight"),
            "q_w": dev(f"{p}.attn_q.weight"),
            "k_w": dev(f"{p}.attn_k.weight"),
            "v_w": dev(f"{p}.attn_v.weight"),
            "o_w": dev(f"{p}.attn_output.weight"),
            "ffn_norm": vec(f"{p}.ffn_norm.weight"),
            "gate_w": dev(f"{p}.ffn_gate.weight"),
            "up_w": dev(f"{p}.ffn_up.weight"),
            "down_w": dev(f"{p}.ffn_down.weight"),
        })

    tok = None
    if "tokenizer.ggml.tokens" in md and "tokenizer.ggml.merges" in md:
        tok = ByteLevelBPETokenizer(list(md["tokenizer.ggml.tokens"]),
                                    list(md["tokenizer.ggml.merges"]))
    return cfg, params, tok


def from_hf_state_dict(cfg: LlamaConfig, sd: dict, wtype: GGMLType = GGMLType.F32):
    """HF LlamaForCausalLM -> params. HF Linear weights are (out, in); rope
    runs in NeoX mode (half-split pairing), matching HF exactly."""
    def q2d(w):
        w = np.ascontiguousarray(np.asarray(w, np.float32).T)
        if wtype in (GGMLType.F32, GGMLType.F16, GGMLType.BF16):
            from ..quant import codecs
            raw = codecs.quantize(np.ascontiguousarray(w.T), wtype)
            return to_device_format(raw, wtype, (w.shape[0], w.shape[1]))
        return quantize_for_device(w, wtype)

    def arr(x):
        return jnp.asarray(np.asarray(x, np.float32))

    params = {
        "tok_embd": q2d(sd["model.embed_tokens.weight"]),
        "out_norm": arr(sd["model.norm.weight"]),
        "output": q2d(sd["lm_head.weight"]) if "lm_head.weight" in sd else None,
        "layers": [],
    }
    for i in range(cfg.n_layer):
        p = f"model.layers.{i}"
        params["layers"].append({
            "attn_norm": arr(sd[f"{p}.input_layernorm.weight"]),
            "q_w": q2d(sd[f"{p}.self_attn.q_proj.weight"]),
            "k_w": q2d(sd[f"{p}.self_attn.k_proj.weight"]),
            "v_w": q2d(sd[f"{p}.self_attn.v_proj.weight"]),
            "o_w": q2d(sd[f"{p}.self_attn.o_proj.weight"]),
            "ffn_norm": arr(sd[f"{p}.post_attention_layernorm.weight"]),
            "gate_w": q2d(sd[f"{p}.mlp.gate_proj.weight"]),
            "up_w": q2d(sd[f"{p}.mlp.up_proj.weight"]),
            "down_w": q2d(sd[f"{p}.mlp.down_proj.weight"]),
        })
    return params


def fuse_qkv(params):
    """Concatenate q/k/v projections ((E,E)+(E,KV)+(E,KV)) into one GEMV per
    layer; forward splits by GQA widths. Call BEFORE params_repack_device."""
    from ..quant.device import concat_qtensors
    out = dict(params)
    out["layers"] = []
    for lp in params["layers"]:
        lp = dict(lp)
        lp["qkv_w"] = concat_qtensors([lp.pop("q_w"), lp.pop("k_w"),
                                       lp.pop("v_w")])
        out["layers"].append(lp)
    return out


def fuse_gate_up(params, pad_multiple: int | None = None):
    """Concatenate gate/up ((E,F)+(E,F)) into one (E, 2F) GEMV per layer
    (LLaMA's SwiGLU reads the same normed input for both; one weight
    stream instead of two). Call BEFORE params_repack_device.

    Production-size F is padded to a 1024 multiple first: LLaMA's 11008
    (= 128·86, 86 = 2·43) only admits bn=256 n-tiles in the fused decode
    GEMV — the same small-tile bandwidth penalty the GPT-J LM head had —
    while 11264 tiles at bn=1024+ for +2.3% bytes. The down projection's
    CONTRACTION dim is padded to match (zero scale rows): K=11008 also
    caps the W4A8 K-tile at 256 (= 2^7·86; 11264 = 2^10·11 restores
    1024-row tiles — the analog of CUDA's get_row_rounding,
    /root/reference/src/ggml-cuda.cu:580). Pad gate/up columns dequantize
    to zero and silu(0)·0 = 0, so the padded SwiGLU lanes are exactly 0
    and feed the down-proj's zero rows directly — no slice, no extra
    bytes read beyond the +2.3%."""
    from ..quant.device import (concat_qtensors, pad_qtensor_cols,
                                pad_qtensor_rows)
    out = dict(params)
    out["layers"] = []
    for lp in params["layers"]:
        lp = dict(lp)
        g, u, d = lp.pop("gate_w"), lp.pop("up_w"), lp.pop("down_w")
        mult = pad_multiple
        if mult is None:
            mult = 1024 if g.kind != "dense" and g.n >= 8192 else 1
        if mult > 1:
            g, _ = pad_qtensor_cols(g, mult)
            u, _ = pad_qtensor_cols(u, mult)
            d, _ = pad_qtensor_rows(d, mult)
        lp["gu_w"] = concat_qtensors([g, u])
        lp["down_w"] = d
        out["layers"].append(lp)
    return out


def prepare_fused(params, cfg=None):
    """Decode fast-path prep: fuse_qkv + fuse_gate_up (Engine
    residency='q4-fused' hook, same contract as gptj.prepare_fused)."""
    return fuse_gate_up(fuse_qkv(params))


def stack_model(params):
    """Fused+repacked params -> stacked decode layout (lax.scan over ONE
    compiled layer body; see gptj.stack_model)."""
    from ..quant.device import stack_layers
    out = dict(params)
    out["stack"] = stack_layers(out.pop("layers"))
    return out


def _forward_stacked(cfg: LlamaConfig, params, tokens, positions, cache,
                     n_past, *, compute_dtype, precision, cells, mask,
                     cells_kernel=False):
    import jax
    from ..ops.decode_attention import (decode_attention_cells,
                                        decode_attention_stacked,
                                        decode_attention_update_cells,
                                        decode_attention_update_stacked,
                                        select_decode_path)
    from ..ops.qmatmul import qmatmul_stacked
    from ..quant.device import QTensor

    B, T = tokens.shape
    H, Hkv, D, E = cfg.n_head, cfg.n_head_kv, cfg.head_dim, cfg.n_embd
    F = params["stack"]["gu_w"].n // 2 if "gu_w" in params["stack"] else None
    st = params["stack"]
    qts = {k: v for k, v in st.items() if isinstance(v, QTensor)}
    small = {k: v for k, v in st.items() if not isinstance(v, QTensor)}
    assert "qkv_w" in qts and "gu_w" in qts, \
        "stacked llama needs fuse_qkv + fuse_gate_up"
    rope_args = dict(n_dims=D, mode=cfg.rope_mode, freq_base=cfg.rope_base,
                     freq_scale=cfg.rope_scale)

    x = get_rows(params["tok_embd"], tokens, dtype=jnp.float32)
    if mask is None:
        mask = attention_mask(positions, cache.n_ctx, n_past)
    path = select_decode_path(T=T, B=B, D=D, cells=cells, cache=cache,
                              cells_kernel=cells_kernel, mask=mask)

    def body(carry, xs):
        x, cache = carry
        li, sm = xs
        cur = rms_norm(x, sm["attn_norm"], eps=cfg.rms_eps)
        qkv = qmatmul_stacked(cur, qts["qkv_w"], li)
        q = qkv[..., :E].reshape(B, T, H, D)
        kk = qkv[..., E:E + Hkv * D].reshape(B, T, Hkv, D)
        vv = qkv[..., E + Hkv * D:].reshape(B, T, Hkv, D)
        q = rope(q, positions, **rope_args)
        kk = rope(kk, positions, **rope_args)
        if path == "cells":
            attn, cache2 = decode_attention_update_cells(
                cache, li, q.reshape(T, 1, H, D),
                kk.reshape(T, 1, Hkv, D), vv.reshape(T, 1, Hkv, D),
                cells[0], mask[0, 0])
            attn = attn.reshape(B, T, H, D)
        elif path == "cells2":
            cache2 = update_kv_cells(cache, li, kk, vv, cells)
            attn = decode_attention_cells(
                cache2, li, q.reshape(T, 1, H, D), mask[0, 0])
            attn = attn.reshape(B, T, H, D)
        elif path == "fused":
            attn, cache2 = decode_attention_update_stacked(
                cache, li, q, kk, vv, n_past, mask)
        elif path == "kernel":
            cache2 = update_kv(cache, li, kk, vv, n_past)
            attn = decode_attention_stacked(cache2, li, q, mask)
        else:
            cache2 = update_kv(cache, li, kk, vv, n_past) if cells is None \
                else update_kv_cells(cache, li, kk, vv, cells)
            attn = attention(q, *read_kv(cache2, li, dtype=q.dtype), mask,
                             out_dtype=jnp.float32, precision=precision)
        x = x + qmatmul_stacked(attn.reshape(B, T, E), qts["o_w"], li)
        cur = rms_norm(x, sm["ffn_norm"], eps=cfg.rms_eps)
        gu = qmatmul_stacked(cur, qts["gu_w"], li)
        # slice off fuse_gate_up's pad lanes (zeros) before the down proj
        ff = (silu(gu[..., :F]) * gu[..., F:])[..., :qts["down_w"].k]
        x = x + qmatmul_stacked(ff, qts["down_w"], li)
        return (x, cache2), None

    lis = jnp.arange(cfg.n_layer, dtype=jnp.int32)
    from .common import scan_layers
    (x, cache), _ = scan_layers(body, (x, cache), lis, small)
    x = rms_norm(x, params["out_norm"], eps=cfg.rms_eps)
    head = params["output"] if params.get("output") is not None \
        else params["tok_embd"]
    logits = qmatmul(x, head, compute_dtype=compute_dtype,
                     out_dtype=jnp.float32, precision=precision)
    if head.n > cfg.n_vocab:                      # padded head columns
        logits = logits[..., :cfg.n_vocab]
    return logits, cache


def init_cache(cfg: LlamaConfig, batch: int = 1, n_ctx: int | None = None,
               dtype=jnp.bfloat16, flat: bool = False) -> KVCache:
    return init_kv_cache(cfg.n_layer, batch, n_ctx or cfg.n_ctx,
                         cfg.n_head_kv, cfg.head_dim, dtype, flat=flat)


def forward(cfg: LlamaConfig, params, tokens, positions, cache: KVCache, n_past,
            *, compute_dtype=jnp.bfloat16, precision=None,
            cells=None, mask=None, cells_kernel=False):
    if "stack" in params:
        return _forward_stacked(cfg, params, tokens, positions, cache,
                                n_past, compute_dtype=compute_dtype,
                                precision=precision, cells=cells, mask=mask,
                                cells_kernel=cells_kernel)
    B, T = tokens.shape
    H, Hkv, D, E = cfg.n_head, cfg.n_head_kv, cfg.head_dim, cfg.n_embd

    mm = lambda x, w: qmatmul(x, w, compute_dtype=compute_dtype,
                              out_dtype=jnp.float32, precision=precision)
    rope_args = dict(n_dims=D, mode=cfg.rope_mode, freq_base=cfg.rope_base,
                     freq_scale=cfg.rope_scale)

    x = get_rows(params["tok_embd"], tokens, dtype=jnp.float32)
    # celled-KV path (continuous batching, runtime/batched.py): explicit
    # destination cells + externally built per-cell mask (SURVEY.md §A.3)
    if mask is None:
        mask = attention_mask(positions, cache.n_ctx, n_past)

    for li, lp in enumerate(params["layers"]):
        cur = rms_norm(x, lp["attn_norm"], eps=cfg.rms_eps)
        if "qkv_w" in lp:
            # fused QKV (fuse_qkv): split by GQA-aware widths
            qkv = mm(cur, lp["qkv_w"])
            q = qkv[..., :E].reshape(B, T, H, D)
            kk = qkv[..., E:E + Hkv * D].reshape(B, T, Hkv, D)
            vv = qkv[..., E + Hkv * D:].reshape(B, T, Hkv, D)
        else:
            q = mm(cur, lp["q_w"]).reshape(B, T, H, D)
            kk = mm(cur, lp["k_w"]).reshape(B, T, Hkv, D)
            vv = mm(cur, lp["v_w"]).reshape(B, T, Hkv, D)
        q = rope(q, positions, **rope_args)
        kk = rope(kk, positions, **rope_args)

        if cells is None:
            cache = update_kv(cache, li, kk, vv, n_past)
        else:
            cache = update_kv_cells(cache, li, kk, vv, cells)
        attn = attention(q, *read_kv(cache, li, dtype=q.dtype), mask,
                             out_dtype=jnp.float32, precision=precision)
        x = x + mm(attn.reshape(B, T, E), lp["o_w"])

        cur = rms_norm(x, lp["ffn_norm"], eps=cfg.rms_eps)
        ff = silu(mm(cur, lp["gate_w"])) * mm(cur, lp["up_w"])
        x = x + mm(ff, lp["down_w"])

    x = rms_norm(x, params["out_norm"], eps=cfg.rms_eps)
    head = params["output"] if params.get("output") is not None else params["tok_embd"]
    logits = qmatmul(x, head, compute_dtype=compute_dtype,
                     out_dtype=jnp.float32, precision=precision)
    return logits, cache
