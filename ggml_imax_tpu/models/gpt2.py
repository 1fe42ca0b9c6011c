"""GPT-2 family — the reference's canonical example (examples/gpt-2/
main-backend.cpp: loader :102-439, graph :442-717, eval :728-786), rebuilt as
a pure JAX function over quantized params with a donated KV cache.
"""
from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..io.legacy_bin import read_legacy_bin
from ..ops.activations import gelu
from ..ops.flash_attention import attention
from ..ops.embedding import get_rows
from ..ops.norms import layer_norm
from ..ops.qmatmul import qmatmul
from ..quant.device import QTensor, to_device_format, quantize_for_device
from ..quant.formats import GGMLType
from ..tokenizer.bpe import GreedyBPETokenizer
from .common import (KVCache, attention_mask, init_kv_cache, read_kv,
                     update_kv,
                     update_kv_cells)

HPARAM_NAMES = ["n_vocab", "n_ctx", "n_embd", "n_head", "n_layer", "ftype"]


@dataclass(frozen=True)
class GPT2Config:
    n_vocab: int = 50257
    n_ctx: int = 1024
    n_embd: int = 768
    n_head: int = 12
    n_layer: int = 12

    @property
    def head_dim(self):
        return self.n_embd // self.n_head


def load_legacy(path: str | Path):
    """Load a reference-format gpt-2 .bin -> (config, params, tokenizer)."""
    f = read_legacy_bin(path, HPARAM_NAMES)
    cfg = GPT2Config(f.hparams["n_vocab"], f.hparams["n_ctx"], f.hparams["n_embd"],
                     f.hparams["n_head"], f.hparams["n_layer"])
    tok = GreedyBPETokenizer(f.vocab)

    def dev(name):
        t = f.tensors[name]
        return to_device_format(t.data, t.ggml_type, t.shape)

    def vec(name):
        t = f.tensors[name]
        from ..quant import codecs
        return jnp.asarray(codecs.dequantize(t.data, t.ggml_type,
                                             shape=tuple(reversed(t.shape))))

    params = {
        "wte": dev("model/wte"),
        "wpe": vec("model/wpe").reshape(cfg.n_ctx, cfg.n_embd),
        "ln_f_g": vec("model/ln_f/g"), "ln_f_b": vec("model/ln_f/b"),
        "lm_head": dev("model/lm_head") if "model/lm_head" in f.tensors else None,
        "layers": [],
    }
    for i in range(cfg.n_layer):
        p = f"model/h{i}"
        params["layers"].append({
            "ln_1_g": vec(f"{p}/ln_1/g"), "ln_1_b": vec(f"{p}/ln_1/b"),
            "ln_2_g": vec(f"{p}/ln_2/g"), "ln_2_b": vec(f"{p}/ln_2/b"),
            "attn_w": dev(f"{p}/attn/c_attn/w"), "attn_b": vec(f"{p}/attn/c_attn/b"),
            "proj_w": dev(f"{p}/attn/c_proj/w"), "proj_b": vec(f"{p}/attn/c_proj/b"),
            "fc_w": dev(f"{p}/mlp/c_fc/w"), "fc_b": vec(f"{p}/mlp/c_fc/b"),
            "out_w": dev(f"{p}/mlp/c_proj/w"), "out_b": vec(f"{p}/mlp/c_proj/b"),
        })
    return cfg, params, tok


def synthetic_params(cfg: GPT2Config, wtype: GGMLType = GGMLType.F32,
                     seed: int = 0, scale: float = 0.02, fast: bool = False):
    """Random weights at model geometry (tests/benchmarks; no downloads)."""
    rng = np.random.default_rng(seed)
    E, V, C = cfg.n_embd, cfg.n_vocab, cfg.n_ctx

    def q(shape_kn):
        w = (rng.standard_normal(shape_kn) * scale).astype(np.float32)
        return quantize_for_device(w, wtype) if wtype != GGMLType.F32 else \
            __import__("ggml_imax_tpu.quant.device", fromlist=["QTensor"]
                       ).QTensor("dense", jnp.asarray(w), None, None,
                                 shape_kn[0], shape_kn[1], wtype)

    def vec(n):
        return jnp.asarray((rng.standard_normal(n) * scale).astype(np.float32))

    params = {
        "wte": q((E, V)), "wpe": vec(C * E).reshape(C, E),
        "ln_f_g": vec(E) + 1.0, "ln_f_b": vec(E), "lm_head": None,
        "layers": [],
    }
    for _ in range(cfg.n_layer):
        params["layers"].append({
            "ln_1_g": vec(E) + 1.0, "ln_1_b": vec(E),
            "ln_2_g": vec(E) + 1.0, "ln_2_b": vec(E),
            "attn_w": q((E, 3 * E)), "attn_b": vec(3 * E),
            "proj_w": q((E, E)), "proj_b": vec(E),
            "fc_w": q((E, 4 * E)), "fc_b": vec(4 * E),
            "out_w": q((4 * E, E)), "out_b": vec(E),
        })
    return params


def from_hf_state_dict(cfg: GPT2Config, sd: dict, wtype: GGMLType = GGMLType.F32):
    """Convert a HuggingFace GPT2LMHeadModel state dict (numpy arrays) into
    our params. HF Conv1D weights are (in, out) = our (K, N) directly."""
    def q2d(w):  # (K, N) float -> QTensor
        w = np.asarray(w, np.float32)
        if wtype in (GGMLType.F32, GGMLType.F16, GGMLType.BF16):
            from ..quant import codecs
            raw = codecs.quantize(np.ascontiguousarray(w.T), wtype)
            return to_device_format(raw, wtype, (w.shape[0], w.shape[1]))
        return quantize_for_device(w, wtype)

    def arr(x):
        return jnp.asarray(np.asarray(x, np.float32))

    params = {
        "wte": q2d(np.asarray(sd["transformer.wte.weight"]).T),  # (E, V)
        "wpe": arr(sd["transformer.wpe.weight"]),
        "ln_f_g": arr(sd["transformer.ln_f.weight"]),
        "ln_f_b": arr(sd["transformer.ln_f.bias"]),
        "lm_head": None,
        "layers": [],
    }
    for i in range(cfg.n_layer):
        p = f"transformer.h.{i}"
        params["layers"].append({
            "ln_1_g": arr(sd[f"{p}.ln_1.weight"]), "ln_1_b": arr(sd[f"{p}.ln_1.bias"]),
            "ln_2_g": arr(sd[f"{p}.ln_2.weight"]), "ln_2_b": arr(sd[f"{p}.ln_2.bias"]),
            "attn_w": q2d(sd[f"{p}.attn.c_attn.weight"]), "attn_b": arr(sd[f"{p}.attn.c_attn.bias"]),
            "proj_w": q2d(sd[f"{p}.attn.c_proj.weight"]), "proj_b": arr(sd[f"{p}.attn.c_proj.bias"]),
            "fc_w": q2d(sd[f"{p}.mlp.c_fc.weight"]), "fc_b": arr(sd[f"{p}.mlp.c_fc.bias"]),
            "out_w": q2d(sd[f"{p}.mlp.c_proj.weight"]), "out_b": arr(sd[f"{p}.mlp.c_proj.bias"]),
        })
    return params


def prepare_fused(params, cfg=None):
    """Decode fast-path prep (Engine residency='q4-fused' hook): GPT-2's
    attn_w is already the fused (E, 3E) QKV, so nothing to fuse — exists
    for interface parity with gptj/llama (stack_model expects it first)."""
    return params


def stack_model(params):
    """Params -> stacked decode layout (lax.scan over ONE compiled layer
    body; see gptj.stack_model). Call AFTER params_repack_device."""
    from ..quant.device import stack_layers
    out = dict(params)
    out["stack"] = stack_layers(out.pop("layers"))
    return out


def _forward_stacked(cfg: GPT2Config, params, tokens, positions, cache,
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
    H, D, E = cfg.n_head, cfg.head_dim, cfg.n_embd
    st = params["stack"]
    qts = {k: v for k, v in st.items() if isinstance(v, QTensor)}
    small = {k: v for k, v in st.items() if not isinstance(v, QTensor)}

    x = get_rows(params["wte"], tokens, dtype=jnp.float32)
    x = x + params["wpe"][positions]
    if mask is None:
        mask = attention_mask(positions, cache.n_ctx, n_past)
    path = select_decode_path(T=T, B=B, D=D, cells=cells, cache=cache,
                              cells_kernel=cells_kernel, mask=mask)

    def body(carry, xs):
        x, cache = carry
        li, sm = xs
        cur = layer_norm(x, sm["ln_1_g"], sm["ln_1_b"])
        qkv = qmatmul_stacked(cur, qts["attn_w"], li) + sm["attn_b"]
        q, kk, vv = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, H, D)
        kk = kk.reshape(B, T, H, D)
        vv = vv.reshape(B, T, H, D)
        if path == "cells":
            attn, cache2 = decode_attention_update_cells(
                cache, li, q.reshape(T, 1, H, D), kk.reshape(T, 1, H, D),
                vv.reshape(T, 1, H, D), cells[0], mask[0, 0])
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
        attn = attn.reshape(B, T, E)
        x = x + qmatmul_stacked(attn, qts["proj_w"], li) + sm["proj_b"]
        cur = layer_norm(x, sm["ln_2_g"], sm["ln_2_b"])
        cur = gelu(qmatmul_stacked(cur, qts["fc_w"], li) + sm["fc_b"])
        x = x + qmatmul_stacked(cur, qts["out_w"], li) + sm["out_b"]
        return (x, cache2), None

    lis = jnp.arange(cfg.n_layer, dtype=jnp.int32)
    from .common import scan_layers
    (x, cache), _ = scan_layers(body, (x, cache), lis, small)
    x = layer_norm(x, params["ln_f_g"], params["ln_f_b"])
    head = params["lm_head"] if params.get("lm_head") is not None \
        else params["wte"]
    logits = qmatmul(x, head, compute_dtype=compute_dtype,
                     out_dtype=jnp.float32, precision=precision)
    if head.n > cfg.n_vocab:                      # padded head columns
        logits = logits[..., :cfg.n_vocab]
    return logits, cache


def init_cache(cfg: GPT2Config, batch: int = 1, n_ctx: int | None = None,
               dtype=jnp.bfloat16, flat: bool = False) -> KVCache:
    return init_kv_cache(cfg.n_layer, batch, n_ctx or cfg.n_ctx,
                         cfg.n_head, cfg.head_dim, dtype, flat=flat)


def forward(cfg: GPT2Config, params, tokens, positions, cache: KVCache, n_past,
            *, compute_dtype=jnp.bfloat16, precision=None,
            cells=None, mask=None, cells_kernel=False):
    """tokens, positions: (B, T) int32. Returns (logits (B, T, V), cache)."""
    if "stack" in params:
        return _forward_stacked(cfg, params, tokens, positions, cache,
                                n_past, compute_dtype=compute_dtype,
                                precision=precision, cells=cells, mask=mask,
                                cells_kernel=cells_kernel)
    B, T = tokens.shape
    H, D, E = cfg.n_head, cfg.head_dim, cfg.n_embd

    mm = lambda x, w: qmatmul(x, w, compute_dtype=compute_dtype,
                              out_dtype=jnp.float32, precision=precision)

    x = get_rows(params["wte"], tokens, dtype=jnp.float32)
    x = x + params["wpe"][positions]

    # celled-KV path (continuous batching, runtime/batched.py): explicit
    # destination cells + externally built per-cell mask (SURVEY.md §A.3)
    if mask is None:
        mask = attention_mask(positions, cache.n_ctx, n_past)

    for li, lp in enumerate(params["layers"]):
        cur = layer_norm(x, lp["ln_1_g"], lp["ln_1_b"])
        qkv = mm(cur, lp["attn_w"]) + lp["attn_b"]
        q, kk, vv = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, H, D)
        kk = kk.reshape(B, T, H, D)
        vv = vv.reshape(B, T, H, D)

        if cells is None:
            cache = update_kv(cache, li, kk, vv, n_past)
        else:
            cache = update_kv_cells(cache, li, kk, vv, cells)
        attn = attention(q, *read_kv(cache, li, dtype=q.dtype), mask,
                             out_dtype=jnp.float32, precision=precision)
        attn = attn.reshape(B, T, E)
        x = x + mm(attn, lp["proj_w"]) + lp["proj_b"]

        cur = layer_norm(x, lp["ln_2_g"], lp["ln_2_b"])
        cur = gelu(mm(cur, lp["fc_w"]) + lp["fc_b"])
        x = x + mm(cur, lp["out_w"]) + lp["out_b"]

    x = layer_norm(x, params["ln_f_g"], params["ln_f_b"])
    # tied LM head: wte is stored (K=E, N=V), so x @ wte gives (B, T, V)
    head = params["lm_head"] if params.get("lm_head") is not None else params["wte"]
    logits = qmatmul(x, head, compute_dtype=compute_dtype,
                     out_dtype=jnp.float32, precision=precision)
    return logits, cache
